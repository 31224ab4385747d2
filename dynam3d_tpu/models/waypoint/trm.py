"""Frozen waypoint predictor + candidate extraction.

Port of ``BinaryDistPredictor_TRM`` (waypoint_pred/TRM_net.py:9-88) and the
candidate-waypoint post-processing in
``Dynam3D_VLN.get_candidate_waypoints`` (Policy_Dynam3D_VLN.py:188-292):

  12-view depth features [B*12,128,4,4] -> per-view 768-d embedding -> 2-layer
  BERT with a +-1-neighbor circular attention mask -> 120 angles x 12 distance
  bins heatmap, rolled by the +5 heatmap offset -> softmax -> wrap-padded NMS
  (max 5 peaks) -> candidate (angle, distance) pairs.

The BERT stack is the generic post-norm encoder from ops/transformer with
BERT's 1e-12 LayerNorm eps and no final norm (waypoint_bert.py:116-141).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dynam3d_tpu.config import WaypointConfig
from dynam3d_tpu.ops.nms import heatmap_nms
from dynam3d_tpu.ops.transformer import (
    _dense,
    _init_dense,
    encoder_layer,
    init_encoder_layer,
)

Params = Dict[str, Any]


def neighbor_attention_mask(num_imgs: int = 12, neighbor: int = 1) -> np.ndarray:
    """Circulant +-neighbor mask (waypoint_pred/utils.py:90-101). True=attend."""
    mask = np.zeros((num_imgs, num_imgs), bool)
    t = np.zeros(num_imgs, bool)
    t[: neighbor + 1] = True
    if neighbor != 0:
        t[-neighbor:] = True
    for ri in range(num_imgs):
        mask[ri] = t
        t = np.roll(t, 1)
    return mask


def predict_heatmap(
    params: Params, cfg: WaypointConfig, depth_feats: jnp.ndarray
) -> jnp.ndarray:
    """Depth features ``[B*12, ...]`` (clockwise view order, any spatial
    layout — the reference flattens 128*4*4) -> heatmap logits ``[B,120,12]``
    with the +5 offset roll applied (TRM_net.py:62-88)."""
    B12 = depth_feats.shape[0]
    B = B12 // cfg.num_imgs
    x = depth_feats.reshape(B12, -1)
    x = jax.nn.relu(_dense(params["visual_fc_depth"], x))
    x = x.reshape(B, cfg.num_imgs, cfg.hidden_dim)
    mask = jnp.asarray(neighbor_attention_mask(cfg.num_imgs, cfg.trm_neighbor))
    for lp in params["bert_layers"]:
        x = encoder_layer(
            lp, x, cfg.num_attention_heads, attn_mask=mask[None], ln_eps=1e-12
        )
    h = jax.nn.relu(_dense(params["cls_fc1"], x))
    logits = _dense(params["cls_fc2"], h)                  # [B,12,120]
    logits = logits.reshape(B, cfg.num_angles, cfg.n_classes)
    off = cfg.heatmap_offset
    return jnp.concatenate([logits[:, off:, :], logits[:, :off, :]], axis=1)


class Candidates(NamedTuple):
    """Fixed-capacity candidate set (max_candidates slots + validity mask)."""

    angles_ccw: jnp.ndarray   # [B,K] counter-clockwise radians (cand_angles)
    distances: jnp.ndarray    # [B,K] metres
    img_idxes: jnp.ndarray    # [B,K] panorama view index (counter-clockwise)
    mask: jnp.ndarray         # [B,K] bool


def extract_candidates(
    cfg: WaypointConfig, heatmap_logits: jnp.ndarray
) -> Candidates:
    """Heatmap -> waypoint candidates (Policy_Dynam3D_VLN.py:227-270).

    Softmax over the full map, wrap-pad the angle axis by one row each side,
    NMS (sigma 7x5, 5 peaks), un-pad, then convert peak (angle,distance) bins:
    ``angle_ccw = 2pi - idx/120*2pi``, ``dist = (bin+1)*0.25``,
    ``img_idx = 12 - (idx+5)//10 (mod 12)``.
    """
    B = heatmap_logits.shape[0]
    K = cfg.max_candidates
    probs = jax.nn.softmax(
        heatmap_logits.reshape(B, cfg.num_angles * cfg.n_classes), axis=1
    ).reshape(B, cfg.num_angles, cfg.n_classes)
    wrapped = jnp.concatenate([probs[:, -1:, :], probs, probs[:, :1, :]], axis=1)
    peaks = heatmap_nms(wrapped, K, cfg.nms_sigma)[:, 1:-1, :]  # [B,120,12]

    flat = peaks.reshape(B, -1)
    vals, flat_idx = jax.lax.top_k(flat, K)
    angle_idx = flat_idx // cfg.n_classes
    dist_idx = flat_idx % cfg.n_classes
    mask = vals > 0
    angles_ccw = 2.0 * math.pi - angle_idx.astype(jnp.float32) / cfg.num_angles * 2.0 * math.pi
    distances = (dist_idx + 1).astype(jnp.float32) * 0.25
    img = cfg.num_imgs - (angle_idx + 5) // 10
    img = jnp.where(img == cfg.num_imgs, 0, img)
    return Candidates(
        angles_ccw=jnp.where(mask, angles_ccw, 0.0),
        distances=jnp.where(mask, distances, 0.0),
        img_idxes=jnp.where(mask, img, 0),
        mask=mask,
    )


def init_waypoint_params(
    key: jax.Array, cfg: WaypointConfig, depth_feat_dim: int = 128 * 4 * 4
) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d = cfg.hidden_dim
    per_img_angles = int(cfg.n_classes * (cfg.num_angles / cfg.num_imgs))
    return {
        "visual_fc_depth": _init_dense(k1, depth_feat_dim, d),
        "bert_layers": [
            init_encoder_layer(k, d, 4 * d) for k in jax.random.split(k2, cfg.trm_layers)
        ],
        "cls_fc1": _init_dense(k3, d, d),
        "cls_fc2": _init_dense(k4, d, per_img_angles),
    }
