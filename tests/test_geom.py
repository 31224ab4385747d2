"""Golden tests for the geometry layer against a literal numpy transcription of
the reference formulas (feature_fields.py:276-293,296-326,89-115,408-422)."""

import math

import numpy as np
import jax.numpy as jnp

from dynam3d_tpu.geom import (
    frustum_mask_habitat,
    habitat_to_world,
    heading_from_positions,
    patch_3d_info,
    ray_grid_habitat,
    unproject_depth_habitat,
)

H = W = 24


def _ref_unproject(depth_map, heading_angle, hfov=90.0, vfov=90.0):
    """Numpy transcription of project_depth_to_3d_habitat (reference :276-293)."""
    half_W, half_H = W // 2, H // 2
    depth_y = depth_map.astype(np.float32)
    tan_xy = np.array(
        [i / half_W + 1 / W for i in range(-half_W, half_W)] * H, np.float32
    ) * math.tan(math.pi * hfov / 360.0)
    direction = -np.arctan(tan_xy)
    depth_x = depth_y * tan_xy
    depth_z = depth_y * (
        np.array(
            [[i / half_H - 1 / H for i in range(half_H, -half_H, -1)]] * W,
            np.float32,
        ).T.reshape((-1,))
        * math.tan(math.pi * vfov / 360.0)
    )
    scale = depth_y * math.tan(math.pi * hfov / 360.0) * 2.0 / W
    direction = (direction + heading_angle) % (2 * math.pi)
    rel_x = depth_x * math.cos(heading_angle) - depth_y * math.sin(heading_angle)
    rel_y = depth_x * math.sin(heading_angle) + depth_y * math.cos(heading_angle)
    return rel_x, rel_y, depth_z, direction, scale


def test_unproject_matches_reference_formula():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 9.0, size=(H * W,)).astype(np.float32)
    heading = 0.73
    got = unproject_depth_habitat(
        jnp.asarray(depth), jnp.asarray(heading), height=H, width=W
    )
    want = _ref_unproject(depth, heading)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-5)


def test_patch_3d_info_matches_reference_formula():
    rng = np.random.default_rng(1)
    depth = rng.uniform(0.1, 9.0, size=(H * W,)).astype(np.float32)
    x, y, z, d, s = patch_3d_info(jnp.asarray(depth), height=H, width=W)
    rx, ry, rz, rd, rs = _ref_unproject(depth, 0.0)
    np.testing.assert_allclose(np.asarray(x), rx, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), ry, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z), rz, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d), rd, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=1e-5)


def test_habitat_axis_swap():
    p = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(habitat_to_world(p)), [1.0, -3.0, 2.0])


def test_heading_from_positions():
    pos = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], np.float32)
    h = np.asarray(heading_from_positions(jnp.asarray(pos)))
    np.testing.assert_allclose(h[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(h[1], -math.pi / 2, atol=1e-6)
    # dy < 0 branch: -arcsin(0) - pi
    np.testing.assert_allclose(h[2], -math.pi, atol=1e-6)


def test_frustum_mask_basic_visibility():
    # camera at origin looking along +y (heading 0); depth wall at 2.5 m
    depth_map = jnp.full((H, W), 2.5, jnp.float32)
    pts = jnp.asarray(
        [
            [0.0, 1.0, 0.0],   # in front, visible
            [0.0, -1.0, 0.0],  # behind
            [0.0, 2.8, 0.0],   # beyond wall + slack -> occluded
            [0.0, 2.55, 0.0],  # within slack of wall -> visible
            [10.0, 1.0, 0.0],  # far outside fov
        ],
        jnp.float32,
    )
    mask = frustum_mask_habitat(
        pts,
        depth_map,
        jnp.zeros(3),
        jnp.asarray(0.0),
        height=H,
        width=W,
        far=3.0,
    )
    np.testing.assert_array_equal(
        np.asarray(mask), [True, False, False, True, False]
    )


def test_frustum_mask_rotates_with_heading():
    depth_map = jnp.full((H, W), 9.0, jnp.float32)
    pt = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)  # along -x
    # heading pi/2 turns the camera towards -x in this convention or the other;
    # one of +-pi/2 must see it, heading 0 must not.
    see0 = frustum_mask_habitat(
        pt, depth_map, jnp.zeros(3), jnp.asarray(0.0), height=H, width=W, far=10.0
    )
    seep = frustum_mask_habitat(
        pt, depth_map, jnp.zeros(3), jnp.asarray(math.pi / 2), height=H, width=W, far=10.0
    )
    seem = frustum_mask_habitat(
        pt, depth_map, jnp.zeros(3), jnp.asarray(-math.pi / 2), height=H, width=W, far=10.0
    )
    assert not bool(see0[0])
    assert bool(seep[0]) != bool(seem[0])


def test_ray_grid_shapes_and_monotonic_depth():
    (rx, ry, rz), rdir, rdist = ray_grid_habitat(
        height=12, width=12, n_samples=51, near=0.0, far=10.0
    )
    assert rx.shape == (144, 51) and rdir.shape == (144, 1)
    assert np.all(np.diff(rdist, axis=-1) > 0)
    np.testing.assert_allclose(rdist[:, 0], 0.0)
    np.testing.assert_allclose(rdist[:, -1], 10.0)


def test_scale_intrinsics():
    from dynam3d_tpu.geom.projection import scale_intrinsics

    k = jnp.asarray([[500.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    k2 = scale_intrinsics(k, (480, 640), (24, 24))
    np.testing.assert_allclose(
        np.asarray(k2),
        [[500 * 24 / 640, 0, 320 * 24 / 640],
         [0, 400 * 24 / 480, 240 * 24 / 480],
         [0, 0, 1.0]],
        rtol=1e-6,
    )


def test_patch_geometry_from_pose_known_point():
    from dynam3d_tpu.geom.projection import (
        patch_geometry_from_pose,
        _tan_grid_x,
    )

    H = W = 4
    fx = fy = 2.0
    cx = cy = 1.5  # principal point at the grid center
    k = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    depth = jnp.full((H * W,), 2.0, jnp.float32)
    rot = jnp.eye(3)
    trans = jnp.asarray([10.0, 0.0, 0.0])
    ppos, pdir, pscale = patch_geometry_from_pose(depth, k, rot, trans, H, W)
    # pixel (0,0): x=(0-1.5)/2*2=-1.5, y=-1.5, z=2 then +T
    np.testing.assert_allclose(np.asarray(ppos[0]), [8.5, -1.5, 2.0], atol=1e-5)
    # scale = z * |tan(last ray)| * 2 / W (reference :909)
    tan_last = abs(float(_tan_grid_x(H, W, 90.0)[-1]))
    np.testing.assert_allclose(
        np.asarray(pscale), 2.0 * tan_last * 2.0 / W, rtol=1e-5
    )
    # direction = heading of the WORLD point (translation included)
    from dynam3d_tpu.geom.projection import heading_from_positions

    np.testing.assert_allclose(
        np.asarray(pdir), np.asarray(heading_from_positions(ppos)), atol=1e-6
    )


def test_ray_grid_intrinsics_matches_open3d_convention():
    """Golden: reproduce get_rays (src_3dff feature_fields.py:390-406) with a
    plain-numpy open3d-style unprojection of constant-depth images."""
    from dynam3d_tpu.geom.projection import ray_grid_intrinsics

    H = W = 4
    NS, near, far = 5, 0.0, 10.0
    fx, fy, cx, cy = 2.3, 1.9, W / 2.0, H / 2.0
    k = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    rel, rdir, rdist = ray_grid_intrinsics(
        k, height=H, width=W, near=near, far=far, n_samples=NS
    )
    rel, rdir, rdist = map(np.asarray, (rel, rdir, rdist))

    spacing = (far - near) / NS
    exp = np.zeros((H * W, NS, 3), np.float32)
    for i in range(NS):
        d = near + spacing * (i + 1)
        r = 0
        for v in range(H):          # open3d row-major scan order
            for u in range(W):
                exp[r, i] = [(u - cx) * d / fx, (v - cy) * d / fy, d]
                r += 1
    np.testing.assert_allclose(rel, exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rdist, exp[..., 2], rtol=1e-5)
    # per-ray direction: -arctan(x/z) of the LAST sample (":403")
    np.testing.assert_allclose(
        rdir[:, 0], -np.arctan(exp[:, -1, 0] / exp[:, -1, 2]), rtol=1e-5, atol=1e-6
    )


def test_patch_scale_from_intrinsics():
    """pscale must be depth * |cx/fx| * 2/W of the per-view scaled K
    (reference |tan(rel_direction[0][-1])| ~ cx/fx, feature_fields.py:909),
    NOT the fixed config hfov."""
    from dynam3d_tpu.geom.projection import patch_geometry_from_pose

    H = W = 4
    # a ~58-degree-hfov camera (ScanNet-like): fx != cx
    fx = 3.6
    k = jnp.asarray([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], jnp.float32)
    depth = jnp.full((H * W,), 2.0, jnp.float32)
    _, _, pscale = patch_geometry_from_pose(
        depth, k, jnp.eye(3), jnp.zeros(3), H, W
    )
    expect = 2.0 * (W / 2.0 / fx) * 2.0 / W
    np.testing.assert_allclose(np.asarray(pscale), expect, rtol=1e-6)


def test_view_k_pins_principal_point():
    from dynam3d_tpu.geom.projection import view_k

    k = np.array([[580.0, 0, 320.0], [0, 578.0, 240.0], [0, 0, 1]], np.float32)
    vk = np.asarray(view_k(jnp.asarray(k), (480, 640), (12, 12)))
    np.testing.assert_allclose(vk[0, 0], 580.0 * 12 / 640, rtol=1e-6)
    np.testing.assert_allclose(vk[1, 1], 578.0 * 12 / 480, rtol=1e-6)
    assert vk[0, 2] == 6.0 and vk[1, 2] == 6.0


def test_camera_heading_includes_translation():
    """The posed camera direction is get_heading_angle(R @ [0,0,1] + T)
    (feature_fields.py:505-514): T shifts the angle."""
    from dynam3d_tpu.geom.projection import camera_heading_from_rotation

    rot = jnp.asarray(
        [[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]], jnp.float32
    )  # forward = +y
    t = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    hd, origin = camera_heading_from_rotation(rot, t)
    fwd = np.asarray(rot @ jnp.asarray([0.0, 0, 1.0]) + t)
    expect = -math.asin(fwd[0] / math.hypot(fwd[0], fwd[1]))
    assert abs(float(hd) - expect) < 1e-6
    np.testing.assert_allclose(np.asarray(origin), np.asarray(t))
