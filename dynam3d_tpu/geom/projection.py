"""Depth unprojection, frustum culling and ray generation (pure jnp).

TPU-first re-implementation of the geometry helpers in the reference's
3D-memory module:

  - ``project_depth_to_3d_habitat``  (vlnce_baselines/models/feature_fields.py:276-293)
  - ``get_patch_3d_info``            (":296-326")
  - ``get_frustum_mask_habitat``     (":89-115")
  - ``get_frustum_mask``             (":64-84")
  - ``get_rays_habitat``             (src_3dff/models/feature_fields.py:408-422)
  - ``get_heading_angle``            (":378-387")
  - habitat axis swap (x,y,z)_world = (x,-z,y)_habitat (":502,523")

The reference routes depth through open3d + a CPU thread pool; here the
pinhole math is written directly in jnp with static shapes so XLA fuses it
into the surrounding update kernels.  All pixel-grid conventions (half-pixel
offsets, row-major flattening, y-down-to-z-up flips) match the reference's
list comprehensions exactly.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _tan_grid_x(height: int, width: int, hfov_deg: float) -> np.ndarray:
    """Per-pixel horizontal tangent, flattened row-major over an HxW grid.

    Matches ``[i/half_W + 1/W for i in range(-half_W, half_W)] * H`` scaled by
    ``tan(pi*hfov/360)`` (feature_fields.py:283).
    """
    half_w = width // 2
    col = np.array([i / half_w + 1.0 / width for i in range(-half_w, half_w)], np.float32)
    return np.tile(col, height) * math.tan(math.pi * hfov_deg / 360.0)


def _tan_grid_z(height: int, width: int, vfov_deg: float) -> np.ndarray:
    """Per-pixel vertical tangent (z-up), flattened row-major over HxW.

    Matches ``np.array([[i/half_H - 1/H for i in range(half_H,-half_H,-1)]]*W).T
    .reshape(-1)`` scaled by ``tan(pi*vfov/360)`` (feature_fields.py:286).
    """
    half_h = height // 2
    row = np.array([i / half_h - 1.0 / height for i in range(half_h, -half_h, -1)], np.float32)
    return np.repeat(row, width) * math.tan(math.pi * vfov_deg / 360.0)


def unproject_depth_habitat(
    depth: jnp.ndarray,
    heading: jnp.ndarray,
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    vfov_deg: float = 90.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unproject a flattened HxW depth map into agent-relative world offsets.

    Port of ``project_depth_to_3d_habitat`` (feature_fields.py:276-293): the
    camera looks along +y (habitat heading frame already swapped to world),
    ``heading`` rotates about z.

    Args:
      depth: ``[..., H*W]`` metric depth along the view axis.
      heading: scalar (or batched ``[...]``) heading angle in radians.

    Returns:
      ``(rel_x, rel_y, rel_z, direction, scale)`` each ``[..., H*W]``;
      ``direction`` is the per-patch absolute viewing direction in [0, 2pi),
      ``scale`` the metric footprint of one patch.
    """
    tan_xy = jnp.asarray(_tan_grid_x(height, width, hfov_deg))
    tan_z = jnp.asarray(_tan_grid_z(height, width, vfov_deg))

    depth_y = depth.astype(jnp.float32)
    depth_x = depth_y * tan_xy
    depth_z = depth_y * tan_z
    scale = depth_y * (math.tan(math.pi * hfov_deg / 360.0) * 2.0 / width)

    direction = (-jnp.arctan(tan_xy) + heading[..., None]) % (2.0 * math.pi)
    cos_h = jnp.cos(heading)[..., None]
    sin_h = jnp.sin(heading)[..., None]
    rel_x = depth_x * cos_h - depth_y * sin_h
    rel_y = depth_x * sin_h + depth_y * cos_h
    rel_z = depth_z
    return rel_x, rel_y, rel_z, direction, scale


def patch_3d_info(
    depth: jnp.ndarray,
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    vfov_deg: float = 90.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Camera-frame per-patch (x, y, z, direction, scale) for the current view.

    Port of ``get_patch_3d_info`` (feature_fields.py:296-326): identical to
    :func:`unproject_depth_habitat` with zero heading, except ``direction`` is
    the camera-relative angle mod 2pi.
    """
    tan_xy = jnp.asarray(_tan_grid_x(height, width, hfov_deg))
    tan_z = jnp.asarray(_tan_grid_z(height, width, vfov_deg))
    depth_y = depth.astype(jnp.float32)
    depth_x = depth_y * tan_xy
    depth_z = depth_y * tan_z
    scale = depth_y * (math.tan(math.pi * hfov_deg / 360.0) * 2.0 / width)
    direction = (-jnp.arctan(tan_xy)) % (2.0 * math.pi)
    direction = jnp.broadcast_to(direction, depth_y.shape)
    return depth_x, depth_y, depth_z, direction, scale


def habitat_to_world(position: jnp.ndarray) -> jnp.ndarray:
    """Habitat (x, y-up, z) -> world (x, -z, y) axis swap.

    The reference applies ``p[0], -p[2], p[1]`` wherever a habitat agent
    position enters the 3D memory (feature_fields.py:336,523,830).
    """
    position = jnp.asarray(position)
    return jnp.stack(
        [position[..., 0], -position[..., 2], position[..., 1]], axis=-1
    )


def heading_from_positions(position: jnp.ndarray) -> jnp.ndarray:
    """World-frame heading angle of displacement vectors.

    Port of ``get_heading_angle`` (src_3dff feature_fields.py:378-387),
    including the transposed-axis quirk and the dy<0 branch.
    """
    dx = position[..., 0]
    dy = position[..., 1]
    xy_dist = jnp.sqrt(dx * dx + dy * dy)
    xy_dist = jnp.maximum(xy_dist, 1e-4)
    heading = -jnp.arcsin(dx / xy_dist)
    return jnp.where(dy < 0, heading - math.pi, heading)


def frustum_mask_habitat(
    points: jnp.ndarray,
    depth_map: jnp.ndarray,
    camera_position: jnp.ndarray,
    heading: jnp.ndarray,
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    vfov_deg: float = 90.0,
    near: float = 0.0,
    far: float = 3.0,
    depth_slack: float = 0.1,
) -> jnp.ndarray:
    """Visibility mask of world points inside the current camera frustum.

    Port of ``get_frustum_mask_habitat`` (feature_fields.py:89-115) fused with
    the caller's occlusion test ``frustum_depth < camera_depth + 0.1``
    (":349-353").  ``camera_position`` must already be world-frame
    (:func:`habitat_to_world` applied).

    Args:
      points: ``[N,3]`` world points.
      depth_map: ``[height,width]`` metric depth of the current view.

    Returns: ``[N]`` bool — True where the point should be forgotten.
    """
    fx = width / math.tan(math.radians(hfov_deg) / 2.0) / 2.0
    fy = height / math.tan(math.radians(vfov_deg) / 2.0) / 2.0

    h = -heading
    px = points[:, 0] - camera_position[0]
    py = points[:, 1] - camera_position[1]
    pz = points[:, 2] - camera_position[2]
    rel_x = px * jnp.cos(h) - py * jnp.sin(h)
    rel_y = px * jnp.sin(h) + py * jnp.cos(h)
    # camera frame: x right, y down (= -z up), z forward (= world y)
    vx, vy, vz = rel_x, -pz, rel_y

    u = (fx * vx + (width / 2.0) * vz) / vz
    v = (fy * vy + (height / 2.0) * vz) / vz
    # match torch .to(int64) truncation-toward-zero, then reference's u % W wrap
    u_i = jnp.trunc(u).astype(jnp.int32)
    v_i = jnp.trunc(v).astype(jnp.int32)
    depth = vz

    in_frustum = (
        (depth >= near)
        & (depth <= far)
        & (u_i >= 0)
        & (u_i <= width - 1)
        & (v_i >= 0)
        & (v_i <= height - 1)
    )
    u_w = jnp.clip(jnp.abs(u_i) % width, 0, width - 1)
    v_w = jnp.clip(jnp.abs(v_i) % height, 0, height - 1)
    camera_depth = depth_map[v_w, u_w]
    return in_frustum & (depth < camera_depth + depth_slack)


def frustum_mask_intrinsics(
    points: jnp.ndarray,
    depth_map: jnp.ndarray,
    intrinsics: jnp.ndarray,
    view_matrix: jnp.ndarray,
    *,
    near: float = 0.0,
    far: float = 3.0,
    depth_slack: float = 0.1,
) -> jnp.ndarray:
    """Generic-intrinsics variant (``get_frustum_mask``, feature_fields.py:64-84)."""
    H, W = depth_map.shape
    ones = jnp.ones_like(points[:, :1])
    homo = jnp.concatenate([points, ones], axis=-1)
    view = homo @ view_matrix[:3, :4].T  # [N,3]
    uv = view @ intrinsics[:3, :3].T
    z = uv[:, 2]
    u_i = jnp.trunc(uv[:, 0] / z).astype(jnp.int32)
    v_i = jnp.trunc(uv[:, 1] / z).astype(jnp.int32)
    depth = view[:, 2]
    in_frustum = (
        (depth >= near)
        & (depth <= far)
        & (u_i >= 0)
        & (u_i <= W - 1)
        & (v_i >= 0)
        & (v_i <= H - 1)
    )
    u_w = jnp.clip(jnp.abs(u_i) % W, 0, W - 1)
    v_w = jnp.clip(jnp.abs(v_i) % H, 0, H - 1)
    camera_depth = depth_map[v_w, u_w]
    return in_frustum & (depth < camera_depth + depth_slack)


def ray_grid_habitat(
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    vfov_deg: float = 90.0,
    near: float = 0.0,
    far: float = 10.0,
    n_samples: int = 501,
) -> Tuple[Tuple[np.ndarray, np.ndarray, np.ndarray], np.ndarray, np.ndarray]:
    """Camera-frame ray sample grid for novel-view feature rendering.

    Port of ``get_rays_habitat`` (src_3dff feature_fields.py:408-422).
    Static — precomputed with numpy and closed over by jitted renderers.

    Returns:
      ``((rel_x, rel_y, rel_z), rel_direction, rel_dist)`` with shapes
      ``[H*W, n_samples]`` each, ``[H*W, 1]`` direction, ``[H*W, n_samples]``
      distances along the ray.
    """
    hw = height * width
    rel_y = np.tile(
        np.linspace(near, far, n_samples, dtype=np.float32)[None, :], (hw, 1)
    )
    tan_xy = _tan_grid_x(height, width, hfov_deg)[:, None]  # [HW,1]
    rel_direction = -np.arctan(tan_xy)
    rel_x = rel_y * tan_xy
    rel_z = rel_y * _tan_grid_z(height, width, vfov_deg)[:, None]
    return (rel_x, rel_y, rel_z), rel_direction, rel_y


def single_distance_ray_grid(
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    distance: float = 3.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-patch ray at one fixed distance (VLN ``get_rays``, feature_fields.py:262-273).

    Used only for per-patch direction bookkeeping in the VLN variant.
    """
    tan_xy = _tan_grid_x(height, width, hfov_deg)[:, None]
    rel_direction = -np.arctan(tan_xy)
    rel_y = np.full((height * width, 1), distance, np.float32)
    rel_x = rel_y * tan_xy
    rel_z = rel_y * _tan_grid_z(height, width, 90.0)[:, None]
    rel_position = np.stack([rel_x, rel_y, rel_z], axis=-1)
    return rel_position, rel_direction, rel_y


def unproject_depth_intrinsics(
    depth: jnp.ndarray,        # [H,W] metric depth (z-forward camera frame)
    intrinsics: jnp.ndarray,   # [3,3] pinhole K
    rot: jnp.ndarray,          # [3,3] camera-to-world rotation
    trans: jnp.ndarray,        # [3] camera-to-world translation
) -> jnp.ndarray:
    """Generic-intrinsics unprojection for posed-frame datasets.

    The reference routes this through open3d + a CPU thread pool
    (``project_depth_to_3d``, feature_fields.py:50-60) then applies
    ``(R @ p + T)`` (":540-542"); here it is one fused jnp expression.

    Returns world points ``[H*W, 3]``.
    """
    H, W = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    z = depth.astype(jnp.float32)
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return cam @ rot.T + trans[None, :]


def scale_intrinsics(
    intrinsics: jnp.ndarray, from_hw: Tuple[int, int], to_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Rescale a pinhole K between image resolutions.

    The reference unprojects at the sensor resolution and nearest-pools the
    3D points to the patch grid (project_depth_to_3d,
    src_3dff feature_fields.py:81-94); unprojecting the nearest-resized depth
    with a resolution-scaled K is the fused equivalent (subpixel-center
    difference only).
    """
    sy = to_hw[0] / from_hw[0]
    sx = to_hw[1] / from_hw[1]
    k = jnp.asarray(intrinsics, jnp.float32)
    scale = jnp.asarray(
        [[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], jnp.float32
    )
    return k.at[:3, :3].set(k[:3, :3] * scale)


def patch_geometry_from_pose(
    depth: jnp.ndarray,        # [H*W] metric depth (z-forward camera frame)
    intrinsics: jnp.ndarray,   # [3,3] or [4,4] pinhole K, scaled to (H,W)
    rot: jnp.ndarray,          # [3,3] camera-to-world rotation
    trans: jnp.ndarray,        # [3] camera-to-world translation
    height: int,
    width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-pose patch geometry for posed-frame datasets.

    Reproduces the reference's generic-intrinsics branch
    (src_3dff feature_fields.py:905-916): camera-frame unprojection via K,
    world points ``R @ p + T``, per-patch scale
    ``z * |tan(last sampled-ray angle)| * 2 / W``, and per-patch direction =
    ground-plane heading of the WORLD point (the reference computes
    ``get_heading_angle`` AFTER the world transform, so the translation is
    part of the angle — preserved as-is).

    The reference's scale tangent comes from the dataset camera's actual
    intrinsics — ``rel_direction[0][-1]`` of get_rays(K) is ``-arctan((0 -
    cx)/fx)``, so ``|tan| = cx/fx`` of the view-scaled K (":851-856,:909").
    Uniform K rescaling keeps ``cx/fx`` invariant, so the same ratio read off
    the (H,W)-scaled K passed here is the identical value.

    Returns ``(ppos [H*W,3], pdir [H*W], pscale [H*W])`` ready for
    ``memory3d.update_view(geometry=...)``.
    """
    ppos = unproject_depth_intrinsics(
        depth.reshape(height, width), intrinsics, rot, trans
    )
    tan_last = jnp.abs(intrinsics[0, 2] / intrinsics[0, 0])
    pscale = depth.reshape(-1).astype(jnp.float32) * (tan_last * 2.0 / width)
    pdir = heading_from_positions(ppos)
    return ppos, pdir, pscale


def camera_heading_from_rotation(rot: jnp.ndarray, trans: jnp.ndarray):
    """Camera ground-plane heading from an extrinsic rotation.

    Mirrors the reference's trick of pushing [0,0,1] through (R,T) and
    taking ``get_heading_angle`` of the RESULT — the translation is part of
    the angle (src_3dff feature_fields.py:505-514).  Stored patch directions
    keep the same T-polluted convention (":915" runs get_heading_angle on
    world points), so render-time ``patch_dir - camera_heading`` subtracts
    consistently, exactly as the two quirks cancel in the reference.
    """
    fwd = rot @ jnp.asarray([0.0, 0.0, 1.0]) + trans
    origin = rot @ jnp.zeros(3) + trans
    return heading_from_positions(fwd[None, :])[0], origin


def view_k(
    intrinsics: jnp.ndarray, depth_hw: Tuple[int, int], view_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Depth-resolution K -> view-resolution K for novel-view rendering.

    Exact port of ``init_camera_intrinsic`` (src_3dff
    feature_fields.py:851-855): focal lengths scaled by view/depth size, the
    principal point PINNED to the view center (not scaled).
    """
    k = jnp.asarray(intrinsics, jnp.float32)[:3, :3]
    vh, vw = view_hw
    dh, dw = depth_hw
    k = k.at[0, 0].multiply(vw / dw)
    k = k.at[1, 1].multiply(vh / dh)
    k = k.at[0, 2].set(vw / 2.0)
    k = k.at[1, 2].set(vh / 2.0)
    return k


def ray_grid_intrinsics(
    intrinsics: jnp.ndarray,   # [3,3] pinhole K at VIEW resolution
    *,
    height: int,
    width: int,
    near: float = 0.0,
    far: float = 10.0,
    n_samples: int = 501,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Camera-frame ray sample grid from real camera intrinsics.

    Port of ``get_rays`` (src_3dff feature_fields.py:390-406): the reference
    unprojects ``n_samples`` constant-depth images through open3d at depths
    ``near + spacing*(i+1)`` (NOT linspace like the habitat variant), with
    pixel rays ``x=(u-cx)d/fx, y=(v-cy)d/fy, z=d`` (x right, y down,
    z forward); per-ray direction is ``-arctan(x/z)`` of the last sample.

    K is traced (per-scene), so this is jnp, not precomputed numpy.

    Returns ``(rel_position [H*W,n_samples,3], rel_direction [H*W,1],
    rel_dist [H*W,n_samples])``.
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    spacing = (far - near) / n_samples
    dist = near + spacing * jnp.arange(1, n_samples + 1, dtype=jnp.float32)
    u = jnp.arange(width, dtype=jnp.float32)[None, :]
    v = jnp.arange(height, dtype=jnp.float32)[:, None]
    tan_x = ((u - cx) / fx * jnp.ones((height, 1))).reshape(-1)   # [HW]
    tan_y = ((v - cy) / fy * jnp.ones((1, width))).reshape(-1)
    rel_x = tan_x[:, None] * dist[None, :]
    rel_y = tan_y[:, None] * dist[None, :]
    rel_z = jnp.broadcast_to(dist[None, :], rel_x.shape)
    rel_position = jnp.stack([rel_x, rel_y, rel_z], axis=-1)
    rel_direction = -jnp.arctan(tan_x)[:, None]
    return rel_position, rel_direction, rel_z
