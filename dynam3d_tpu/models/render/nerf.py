"""Neural feature-field rendering: novel-view 3D patch features.

Port of the pretrain renderer (src_3dff/models/feature_fields.py):

  - ray grid: ``view_height x view_width`` rays, ``n_samples`` uniform depths
    in [near, far] (``get_rays_habitat``, ":408-422");
  - importance sampling: k-NN distances of every sample point to the patch
    cloud give a density proxy 1/sum(d); top ``n_importance`` samples per ray
    (":540-556");
  - neighbor conditioning: for each important sample, k=4 patch neighbors
    within 1 m; features + relative-position/direction/scale embeddings are
    fused by a linear+LN block (``patch_to_nerf_encode``, ":477-491");
  - the tinycudann MLP pair (encoder 768->769 with density, residual, decoder
    768->768, ":221-243") becomes a fused JAX/Pallas MLP (LeakyReLU, bf16);
  - volume compositing ``raw2feature`` (":446-474"): softplus density, alpha
    compositing over the FULL n_samples grid with densities scattered at the
    important indices, L2-normalized feature map + depth map.

The two kd-tree queries (72k ray samples, then 1.2k importance samples)
become tiled masked k-NN scans (ops/knn.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.geom.projection import ray_grid_habitat
from dynam3d_tpu.models.memory3d.state import FieldState
from dynam3d_tpu.ops.knn import knn_brute, radius_mask_fill
from dynam3d_tpu.ops.transformer import layer_norm

Params = Dict[str, Any]


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.01)


def _nerf_mlp_chain(x, enc_hidden, eo_w, dec_hidden, do_w):
    """Reference jnp chain over raw weights (also the Pallas kernel's VJP).

    ``enc_hidden``/``dec_hidden`` are lists of any depth — configs with
    ``mlp_net_layers != 4`` take this path (the Pallas gate requires
    exactly 2+2 hidden layers).
    """
    h = x.astype(jnp.bfloat16)
    for w in enc_hidden:
        h = _leaky(jnp.dot(h, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    eo = _leaky(jnp.dot(h, eo_w, preferred_element_type=jnp.float32))
    enc, density = eo[..., :-1], eo[..., -1]
    h = (enc + x.astype(jnp.float32)).astype(jnp.bfloat16)  # residual (":487")
    for w in dec_hidden:
        h = _leaky(jnp.dot(h, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    out = jnp.dot(h, do_w, preferred_element_type=jnp.float32)
    return out.astype(jnp.bfloat16), density.astype(jnp.bfloat16)


@jax.custom_vjp
def _pallas_nerf_mlp(x, e1, e2, eo_w, d1, d2, do_w):
    from dynam3d_tpu.ops.pallas_mlp import fused_nerf_mlp

    return fused_nerf_mlp(x, e1, e2, eo_w, d1, d2, do_w)


def _pallas_nerf_mlp_fwd(x, e1, e2, eo_w, d1, d2, do_w):
    return _pallas_nerf_mlp(x, e1, e2, eo_w, d1, d2, do_w), (
        x, e1, e2, eo_w, d1, d2, do_w,
    )


def _pallas_nerf_mlp_bwd(res, g):
    # Pallas kernels carry no autodiff rule; the gradient is the VJP of the
    # numerically-equivalent jnp chain (bf16 matmuls either way).  The jnp
    # forward re-runs here — training pays one extra fused-MLP pass, decode/
    # render inference pays nothing.
    x, e1, e2, eo_w, d1, d2, do_w = res
    _, vjp = jax.vjp(
        lambda x, e1, e2, eo_w, d1, d2, do_w: _nerf_mlp_chain(
            x, [e1, e2], eo_w, [d1, d2], do_w
        ),
        x, e1, e2, eo_w, d1, d2, do_w,
    )
    return vjp(g)


_pallas_nerf_mlp.defvjp(_pallas_nerf_mlp_fwd, _pallas_nerf_mlp_bwd)


def nerf_mlp(p: Params, x: jnp.ndarray, cfg: FieldsConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused encoder(+density) -> residual -> decoder.

    Matches patch_to_nerf_encode (":477-491"): encoder = 2 hidden LeakyReLU
    layers -> width+1 with LeakyReLU output; decoder = 2 hidden layers, linear
    out.  Runs in bf16 like the fp16 tinycudann CutlassMLP.  On TPU the whole
    chain dispatches to the fused Pallas kernel (ops/pallas_mlp.py) with a
    custom VJP through the jnp chain (training differentiates this path:
    losses_3dff backprops through render_view).
    """
    from dynam3d_tpu import flags

    if (
        jax.default_backend() == "tpu"
        and len(p["enc_hidden"]) == 2
        and len(p["dec_hidden"]) == 2
        and not flags.DISABLE_PALLAS
    ):
        return _pallas_nerf_mlp(
            x, p["enc_hidden"][0], p["enc_hidden"][1], p["enc_out"],
            p["dec_hidden"][0], p["dec_hidden"][1], p["dec_out"],
        )
    return _nerf_mlp_chain(
        x, p["enc_hidden"], p["enc_out"], p["dec_hidden"], p["dec_out"]
    )


def raw2feature(
    sample_feature: jnp.ndarray,   # [R, NI, D]
    sample_density: jnp.ndarray,   # [R, NI]
    rel_dist: jnp.ndarray,         # [R, NS]
    topk_inds: jnp.ndarray,        # [R, NI]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Volume compositing (":446-474")."""
    dtype = jnp.float32
    density_sp = jax.nn.softplus(sample_density.astype(dtype))
    dists = jnp.abs(rel_dist[..., 1:] - rel_dist[..., :-1])
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    density = jnp.zeros(rel_dist.shape, dtype).at[
        jnp.arange(rel_dist.shape[0])[:, None], topk_inds
    ].set(density_sp)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(density) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    sample_w = jnp.take_along_axis(weights, topk_inds, axis=1)
    fmap = jnp.sum(sample_w[..., None] * sample_feature.astype(dtype), axis=-2)
    norm = jnp.maximum(jnp.linalg.norm(fmap, axis=-1, keepdims=True), 1e-7)
    fmap = fmap / norm
    depth = jnp.sum(weights * rel_dist, -1) / jnp.maximum(jnp.sum(weights, -1), 1e-7)
    return fmap, depth


class RenderOut(NamedTuple):
    features: jnp.ndarray    # [H,W,D] rendered patch features
    positions: jnp.ndarray   # [H,W,3] first important sample per ray
    depth: jnp.ndarray       # [H,W]


def render_view(
    params: Params,
    cfg: FieldsConfig,
    state: FieldState,
    camera_position: jnp.ndarray,   # [3] world frame
    camera_heading: jnp.ndarray,    # scalar
) -> RenderOut:
    """Render one novel view's 24->12x12 patch-feature map from the 3D memory.

    Port of ``render_view_3d_patch`` (":494-625"), habitat mode.
    """
    H, W = cfg.view_height, cfg.view_width
    NS = cfg.n_samples

    (rel_x, rel_y, rel_z), rel_dir, rel_dist = ray_grid_habitat(
        height=H, width=W, hfov_deg=cfg.view_hfov, vfov_deg=cfg.view_vfov,
        near=cfg.near, far=cfg.far, n_samples=NS,
    )
    rel_x = jnp.asarray(rel_x)
    rel_y = jnp.asarray(rel_y)
    rel_z = jnp.asarray(rel_z)
    rel_dir = jnp.asarray(rel_dir)          # [R,1]
    rel_dist = jnp.asarray(rel_dist)        # [R,NS]

    ch, sh = jnp.cos(camera_heading), jnp.sin(camera_heading)
    ray_x = rel_x * ch - rel_y * sh + camera_position[0]
    ray_y = rel_x * sh + rel_y * ch + camera_position[1]
    ray_z = rel_z + camera_position[2]
    ray_xyz = jnp.stack([ray_x, ray_y, ray_z], axis=-1)     # [R,NS,3]

    return _render_core(
        params, cfg, state, ray_xyz, rel_dir, rel_dist, camera_heading
    )


def render_view_posed(
    params: Params,
    cfg: FieldsConfig,
    state: FieldState,
    intrinsics: jnp.ndarray,   # [3,3] K at VIEW resolution (cx=W/2, cy=H/2)
    rot: jnp.ndarray,          # [3,3] camera-to-world rotation
    trans: jnp.ndarray,        # [3] camera-to-world translation
) -> RenderOut:
    """Render a novel view posed by real camera intrinsics/extrinsics.

    Port of ``render_view_3d_patch``'s generic-intrinsics branch
    (":505-537"): rays come from ``get_rays(K)`` in the z-forward camera
    frame and are transformed by the FULL (R, T) — camera pitch and true FOV
    are preserved (unlike the habitat branch's heading-only rotation); the
    camera direction for patch-direction offsets is the reference's
    T-polluted ``get_heading_angle(R @ [0,0,1] + T)`` quirk.
    """
    from dynam3d_tpu.geom.projection import (
        camera_heading_from_rotation,
        ray_grid_intrinsics,
    )

    H, W = cfg.view_height, cfg.view_width
    rel_position, rel_dir, rel_dist = ray_grid_intrinsics(
        intrinsics, height=H, width=W,
        near=cfg.near, far=cfg.far, n_samples=cfg.n_samples,
    )
    ray_xyz = rel_position @ rot.T + trans[None, None, :]   # [R,NS,3]
    camera_heading, _ = camera_heading_from_rotation(rot, trans)
    return _render_core(
        params, cfg, state, ray_xyz, rel_dir, rel_dist, camera_heading
    )


def _render_core(
    params: Params,
    cfg: FieldsConfig,
    state: FieldState,
    ray_xyz: jnp.ndarray,      # [R,NS,3] world-frame sample points
    rel_dir: jnp.ndarray,      # [R,1] per-ray direction angle
    rel_dist: jnp.ndarray,     # [R,NS] distances along the ray
    camera_heading: jnp.ndarray,  # scalar ground-plane camera direction
) -> RenderOut:
    """Mode-independent render body (":538-625"): importance sampling,
    neighbor conditioning, fused NeRF MLP, volume compositing."""
    H, W = cfg.view_height, cfg.view_width
    NS, NI, K = cfg.n_samples, cfg.n_importance, cfg.search_num
    D = cfg.fts_dim
    R = H * W

    # stage 1: density proxy from k-NN over ALL sample points (":538-552").
    # The banded scan culls (depth-band, point-tile) pairs by bounding box —
    # radius-exact, which is all this consumer observes (the distances are
    # clamped at search_radius right below).  DYNAM3D_DISABLE_BANDED_KNN
    # falls back to the flat scan / opt-in Pallas kernel.
    from dynam3d_tpu import flags

    if flags.DISABLE_BANDED_KNN:
        from dynam3d_tpu.ops.pallas_knn import knn_auto

        sq_d, _ = knn_auto(
            ray_xyz.reshape(-1, 3), state.patch_pos, state.patch_valid, K
        )
    else:
        from dynam3d_tpu.ops.knn import knn_banded, morton_perm

        # Morton-sort the table first so each 2048-point tile covers a
        # spatially tight box (insertion order scatters revisited areas
        # across tiles, bloating the culling bboxes).  Stage 1 discards the
        # neighbor INDICES — only the distance field is consumed — so
        # permuting its inputs is exactly equivalent.
        if flags.DISABLE_MORTON_KNN:
            ppos, pval = state.patch_pos, state.patch_valid
        else:
            perm = morton_perm(state.patch_pos, state.patch_valid)
            ppos, pval = state.patch_pos[perm], state.patch_valid[perm]
        # with_indices=False: stage 1 never reads the neighbor ids, and the
        # values-only merge (argmin extraction) is far cheaper than the
        # per-tile top_k sort it replaces
        sq_d, _ = knn_banded(
            ray_xyz, ppos, pval, K, cfg.search_radius,
            tile=cfg.knn_tile, band=cfg.knn_band, with_indices=False,
        )
    d1, _ = radius_mask_fill(sq_d, jnp.zeros_like(sq_d, jnp.int32),
                             cfg.search_radius, clamp_dist=True)
    tmp_density = 1.0 / jnp.maximum(d1.sum(-1).reshape(R, NS), 1e-9)
    topk_inds = jax.lax.top_k(tmp_density, NI)[1]            # [R,NI]

    sample_xyz = jnp.take_along_axis(
        ray_xyz, topk_inds[..., None].repeat(3, -1), axis=1
    )                                                        # [R,NI,3]

    # stage 2: neighbors of the important samples (":583-615")
    sq2, ind2 = knn_brute(
        sample_xyz.reshape(-1, 3), state.patch_pos, state.patch_valid, K
    )
    d2, ind2 = radius_mask_fill(sq2, ind2, cfg.search_radius)
    ind2 = ind2.reshape(R, NI, K)
    live = ind2 >= 0
    idx = jnp.maximum(ind2, 0)

    nb_pos = state.patch_pos[idx]                            # [R,NI,K,3]
    rel = nb_pos - sample_xyz[..., None, :]
    # rotate into the camera frame (":596-599")
    rx = rel[..., 0] * jnp.cos(-camera_heading) - rel[..., 1] * jnp.sin(-camera_heading)
    ry = rel[..., 0] * jnp.sin(-camera_heading) + rel[..., 1] * jnp.cos(-camera_heading)
    rel = jnp.stack([rx, ry, rel[..., 2]], axis=-1)
    rel = jnp.where(live[..., None], rel, cfg.far)           # (":602")

    nb_dir = state.patch_dir[idx] - camera_heading           # (":519")
    ray_dir = rel_dir[:, 0][:, None, None]                   # [R,1,1]
    ddir = nb_dir - ray_dir
    dir_sc = jnp.stack([jnp.sin(ddir), jnp.cos(ddir)], axis=-1)
    dir_sc = jnp.where(live[..., None], dir_sc, 0.0)
    nb_scale = jnp.where(live, state.patch_scale[idx], 0.0)[..., None]

    xyzds = jnp.concatenate([rel, dir_sc, nb_scale], axis=-1)  # [R,NI,K,6]
    nb_fts = jnp.where(
        live[..., None], state.patch_fts[idx].astype(jnp.float32), 0.0
    )

    # patch_to_nerf position embedding: Linear(6->D) + LN, concat over K (":477-483")
    pe = jnp.dot(xyzds, params["pos_w"], preferred_element_type=jnp.float32) + params["pos_b"]
    pe = layer_norm(params["pos_ln"], pe, eps=1e-12)
    fused = nb_fts.reshape(R * NI, K * D) + pe.reshape(R * NI, K * D)
    agg = jnp.dot(fused, params["agg_w"], preferred_element_type=jnp.float32) + params["agg_b"]
    agg = layer_norm(params["agg_ln"], agg, eps=1e-12)

    feat, dens = nerf_mlp(params["mlp"], agg, cfg)
    feat = feat.reshape(R, NI, D)
    dens = dens.reshape(R, NI)

    fmap, depth = raw2feature(feat, dens, rel_dist, topk_inds)
    return RenderOut(
        features=fmap.reshape(H, W, D),
        positions=sample_xyz[:, 0].reshape(H, W, 3),
        depth=depth.reshape(H, W),
    )


def render_panorama(
    params: Params,
    cfg: FieldsConfig,
    state: FieldState,
    position: jnp.ndarray,
    heading: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """4 x 90-degree views, starting behind the agent, clockwise
    (``render_panoramic_3d_patch``, ":629-671")."""
    fts, pos = [], []
    for view_id in range(4):
        h = (heading + view_id * (-math.pi / 2.0) + math.pi * 3.0 / 4.0) % (
            2.0 * math.pi
        )
        out = render_view(params, cfg, state, position, h)
        fts.append(out.features)
        pos.append(out.positions)
    return jnp.concatenate(fts, axis=1), jnp.concatenate(pos, axis=1)


def init_render_params(key: jax.Array, cfg: FieldsConfig) -> Params:
    D = cfg.fts_dim
    K = cfg.search_num
    n_enc = cfg.mlp_net_layers // 2
    n_dec = cfg.mlp_net_layers - n_enc
    ks = iter(jax.random.split(key, 16))
    std = D ** -0.5

    def w(i, o):
        return std * jax.random.normal(next(ks), (i, o), jnp.float32)

    return {
        "pos_w": w(6, D),
        "pos_b": jnp.zeros((D,), jnp.float32),
        "pos_ln": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "agg_w": w(K * D, D),
        "agg_b": jnp.zeros((D,), jnp.float32),
        "agg_ln": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "mlp": {
            "enc_hidden": [w(D, D) for _ in range(n_enc)],
            "enc_out": w(D, D + 1),
            "dec_hidden": [w(D, D) for _ in range(n_dec)],
            "dec_out": w(D, D),
        },
    }
