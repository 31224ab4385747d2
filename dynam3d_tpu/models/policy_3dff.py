"""3DFF pretrain policy net: 12-view panorama handling + waypoint candidates.

Port of ``Net_3DFF`` (src_3dff/models/Policy_3DFF.py:65-338):

  - 12 panorama views reordered clockwise feed the frozen depth encoder /
    waypoint predictor; 4 views ``[0,3,6,9]`` (90-degree hfov each, together
    a full 360) feed CLIP and the 3D memory update (":164-173");
  - frustum deletion precedes the update, per-view headings
    ``view_id * (-pi/6) + heading`` (feature_fields.py:695);
  - candidate waypoints from the wrap-padded NMS heatmap; at train time,
    angles/distances are SAMPLED from the per-sector heatmap softmax
    ("waypoint augmentation", ":242-281") instead of the NMS argmax bins.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.geom.projection import habitat_to_world
from dynam3d_tpu.models.encoders import clip as clip_mod
from dynam3d_tpu.models.encoders.depth_resnet import encode_depth, preprocess_depth
from dynam3d_tpu.models.memory3d import delete_from_frustum
from dynam3d_tpu.models.memory3d.pretrain import update_view_pretrain
from dynam3d_tpu.models.memory3d.state import FieldState
from dynam3d_tpu.models.policy import nearest_resize_hw
from dynam3d_tpu.models.segmenter import depth_plane_segments
from dynam3d_tpu.models.waypoint.trm import extract_candidates, predict_heatmap

Params = Dict[str, Any]

CLIP_VIEW_IDS = (0, 3, 6, 9)  # Policy_3DFF.py:164


def clockwise_reorder(x: jnp.ndarray) -> jnp.ndarray:
    """Panorama views (counter-clockwise sensor order) -> clockwise.

    The reference fills slot ``(12 - i) % 12`` from sensor i
    (Policy_3DFF.py:153-162 / Policy_Dynam3D_VLN.py:199-204).
    """
    V = x.shape[1]
    idx = jnp.asarray([(V - i) % V for i in range(V)])
    # slot j takes sensor i where (V-i)%V == j  ->  i = (V-j)%V
    return x[:, idx]


def counter_clockwise_restore(x: jnp.ndarray) -> jnp.ndarray:
    """Undo :func:`clockwise_reorder` (":215-218": keep 0, flip the rest)."""
    return jnp.concatenate([x[:, :1], jnp.flip(x[:, 1:], axis=1)], axis=1)


class PanoramaPerception(NamedTuple):
    state: FieldState
    aux: Any                       # PretrainAux stacked over the 4 views
    heatmap_logits: Any            # [B,120,12]; None when with_waypoints=False
    depth_feats: Any               # [B,12,128] pooled, ccw; None likewise
    cls_fts: jnp.ndarray           # [B,4,D] CLIP CLS of the memory views


def waypoint_heatmap(
    params: Params, cfg: Dynam3DConfig, depth12: jnp.ndarray
) -> jnp.ndarray:
    """Frozen waypoint branch alone: 12-view depth -> [B,120,12] heatmap.

    The walk driver dispatches this FIRST (candidates and novel-view poses
    are host decisions), then runs the differentiable memory step; the
    heatmap depends only on depth + frozen weights so nothing is lost by
    splitting (ss_trainer_3DFF.py:845-849 computes it inside one forward)."""
    B = depth12.shape[0]
    d12_cw = clockwise_reorder(depth12)
    d12_in = preprocess_depth(
        d12_cw.reshape(B * 12, *d12_cw.shape[2:])[..., None], (0.0, 10.0)
    ) / 10.0
    dfeats = encode_depth(params["depth_enc"], cfg.depth, d12_in)
    return predict_heatmap(params["waypoint"], cfg.waypoint, dfeats)


def perceive_panorama(
    params: Params,
    cfg: Dynam3DConfig,
    state: FieldState,             # batched [B,...]
    rgb12: jnp.ndarray,            # [B,12,Hc,Wc,3] u8, counter-clockwise
    depth12: jnp.ndarray,          # [B,12,256,256] normalized
    position_hab: jnp.ndarray,     # [B,3]
    heading: jnp.ndarray,          # [B]
    gt_xyz: Optional[jnp.ndarray] = None,   # [B,G,3]
    gt_label: Optional[jnp.ndarray] = None,
    gt_valid: Optional[jnp.ndarray] = None,
    with_waypoints: bool = True,
) -> PanoramaPerception:
    f = cfg.fields
    B = rgb12.shape[0]
    H, W = f.input_height, f.input_width
    HW = H * W
    view_ids = jnp.asarray(CLIP_VIEW_IDS)

    heatmap = depth_feats = None
    if with_waypoints:
        # --- waypoint branch: depth encoder over clockwise 12 views ---
        d12_cw = clockwise_reorder(depth12)
        d12_in = preprocess_depth(
            d12_cw.reshape(B * 12, *d12_cw.shape[2:])[..., None], (0.0, 10.0)
        ) / 10.0  # DDPPO encoder consumes normalized depth
        dfeats = encode_depth(params["depth_enc"], cfg.depth, d12_in)  # [B*12,F]
        heatmap = predict_heatmap(params["waypoint"], cfg.waypoint, dfeats)
        dfeats_ccw = counter_clockwise_restore(dfeats.reshape(B, 12, -1))
        # spatial mean pool to 128 dims (space_pool_depth, Policy_3DFF.py:116)
        depth_feats = dfeats_ccw.reshape(B, 12, 128, -1).mean(-1)

    # --- memory branch: 4 clockwise views [0,3,6,9] ---
    rgb4 = clockwise_reorder(rgb12)[:, view_ids]      # [B,4,...]
    depth4 = clockwise_reorder(depth12)[:, view_ids]
    d24 = nearest_resize_hw(depth4, H, W)
    d24 = preprocess_depth(
        d24.reshape(B * 4, H, W)[..., None], (0.0, 10.0)
    )[..., 0].reshape(B, 4, HW)
    dfull = preprocess_depth(
        depth4.reshape(B * 4, *depth4.shape[2:])[..., None], (0.0, 10.0)
    )[..., 0].reshape(B, 4, *depth4.shape[2:])

    pixels = clip_mod.preprocess_rgb(
        rgb4.reshape(B * 4, *rgb4.shape[2:]), cfg.clip.image_size
    )
    cls_fts, grid = clip_mod.encode_image(params["clip"], cfg.clip, pixels)
    cls_fts = jax.lax.stop_gradient(cls_fts).reshape(B, 4, -1)
    grid = jax.lax.stop_gradient(grid).reshape(B, 4, HW, f.fts_dim)

    segm = jax.vmap(lambda dv: depth_plane_segments(dv, H, W, f.max_segments))(
        d24.reshape(B * 4, HW)
    ).reshape(B, 4, HW)

    pos_world = habitat_to_world(position_hab)
    headings_v = heading[:, None] + view_ids[None, :].astype(jnp.float32) * (
        -jnp.pi / 6.0
    )

    def per_element(st, df, d24b, gridb, segmb, pw, hv, gxyz, glab, gval):
        def del_view(s, xs):
            dmap, h = xs
            return delete_from_frustum(s, f, dmap, pw, h), None

        st, _ = jax.lax.scan(del_view, st, (df, hv))

        def upd(s, xs):
            d, g, sg, h = xs
            s, aux = update_view_pretrain(
                params["fields"], s, f, d, g, sg, pw, h, gxyz, glab, gval
            )
            return s, aux

        st, aux = jax.lax.scan(upd, st, (d24b, gridb, segmb, hv))
        return st, aux

    if gt_xyz is None:
        G = 1
        gt_xyz = jnp.zeros((B, G, 3))
        gt_label = jnp.zeros((B, G), jnp.int32)
        gt_valid = jnp.zeros((B, G), bool)
    state, aux = jax.vmap(per_element)(
        state, dfull, d24, grid, segm, pos_world, headings_v,
        gt_xyz, gt_label, gt_valid,
    )
    return PanoramaPerception(
        state=state, aux=aux, heatmap_logits=heatmap, depth_feats=depth_feats,
        cls_fts=cls_fts,
    )


def sample_waypoints_train(
    heatmap_logits: np.ndarray,    # [B,120,12] (post-offset-roll)
    nms_angle_idxes: list,         # per-batch angle bins of the NMS peaks
    rng: np.random.Generator,
) -> Tuple[list, list]:
    """Waypoint augmentation (Policy_3DFF.py:242-281): per NMS-candidate
    sector, sample an (angle, distance) bin from the sector's softmax."""
    B = heatmap_logits.shape[0]
    # undo the +5 offset roll to recover sector-aligned logits (":246-250")
    regional = np.concatenate(
        [heatmap_logits[:, -5:, :], heatmap_logits[:, :-5, :]], axis=1
    ).reshape(B, 12, 10, 12)
    out_a, out_d = [], []
    for j in range(B):
        angle_idxes = np.asarray(nms_angle_idxes[j], np.int64)
        img_idxes = (angle_idxes + 5) // 10
        img_idxes[img_idxes == 12] = 0
        sect = regional[j][img_idxes].reshape(len(img_idxes), -1)
        probs = np.exp(sect - sect.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        sa, sd = [], []
        for k in range(len(img_idxes)):
            act = rng.choice(120, p=probs[k])
            pointer = 0 if img_idxes[k] == 0 else (img_idxes[k] - 1) * 10 + 5
            sa.append(act // 12 + pointer)
            sd.append(act % 12)
        out_a.append(sa)
        out_d.append(sd)
    return out_a, out_d


def candidates_from_heatmap(
    cfg: Dynam3DConfig, heatmap_logits: jnp.ndarray
):
    """NMS candidate extraction shared with the VLN path."""
    return extract_candidates(cfg.waypoint, heatmap_logits)
