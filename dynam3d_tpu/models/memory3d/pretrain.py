"""Pretraining-mode memory update: training byproducts + gt supervision.

Wraps memory3d.update_view with the extra signals the 3DFF pretrainer needs
(src_3dff/models/feature_fields.py:843-1345, is_training branches):

  - per-segment gt instance ids by 1-NN majority vote against the scene's
    ground-truth point cloud (":975-982");
  - instance semantic-alignment targets: mean member-patch CLIP features and
    their subspace (view-mean-subtracted) variants (":968-973");
  - a per-view "2D zone" prediction — all segments aggregated by the
    instance->zone encoder — against the view's CLIP CLS feature
    (":1291-1307");
  - merge-discriminator supervision: proposal gt ids vs segment gt ids
    (":1030-1047");
  - the updated instances' predicted features + gt ids (":1142") and touched
    zones' member gt ids for language alignment.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.models.memory3d.state import FieldState, cell_center
from dynam3d_tpu.models.memory3d.update import ViewAux, _num_heads, update_view
from dynam3d_tpu.ops.knn import knn_brute
from dynam3d_tpu.ops.segment import segment_mean
from dynam3d_tpu.ops.transformer import encoder_stack, mlp2

Params = Dict[str, Any]


class PretrainAux(NamedTuple):
    base: ViewAux
    seg_gt_id: jnp.ndarray            # [S] majority-vote gt instance id (-1 inactive)
    target_seg_fts: jnp.ndarray       # [S,D] mean member-patch CLIP features
    patch_mean_fts: jnp.ndarray       # [D] view-mean CLIP feature
    zone_pred_fts: jnp.ndarray        # [D] this view's pseudo-zone prediction
    merge_target: jnp.ndarray         # [S,K] 1 where proposal shares the gt id
    merge_valid: jnp.ndarray          # [S,K] supervision validity
    inst_pred_fts: jnp.ndarray        # [S,D] updated features of touched instances
    inst_pred_gt: jnp.ndarray         # [S] their gt ids (-1 invalid)
    zone_member_gt: jnp.ndarray       # [S, Kz] member gt ids of touched zones
    zone_pred_zone_fts: jnp.ndarray   # [S,D] updated features of touched zones
    zone_touch_valid: jnp.ndarray     # [S]


def segment_gt_ids(
    segm: jnp.ndarray,            # [HW]
    patch_pos: jnp.ndarray,       # [HW,3] world positions of this view's patches
    gt_xyz: jnp.ndarray,          # [G,3]
    gt_label: jnp.ndarray,        # [G] int32
    gt_valid: jnp.ndarray,        # [G]
    max_segments: int,
    max_label: int,
) -> jnp.ndarray:
    """Per-segment majority-vote gt instance id (":975-982")."""
    _, nn = knn_brute(patch_pos, gt_xyz, gt_valid, 1)
    labels = jnp.clip(gt_label[nn[:, 0]], 0, max_label - 1)  # [HW]
    counts = (
        jnp.zeros((max_segments * max_label,), jnp.int32)
        .at[segm * max_label + labels]
        .add(1)
        .reshape(max_segments, max_label)
    )
    maj = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    active = jnp.sum(counts, axis=-1) > 0
    return jnp.where(active, maj, -1)


def update_view_pretrain(
    params: Params,
    state: FieldState,
    cfg: FieldsConfig,
    depth: jnp.ndarray,
    grid_fts: jnp.ndarray,
    segm: jnp.ndarray,
    position: jnp.ndarray,
    heading: jnp.ndarray,
    gt_xyz: Optional[jnp.ndarray] = None,
    gt_label: Optional[jnp.ndarray] = None,
    gt_valid: Optional[jnp.ndarray] = None,
    max_gt_label: int = 512,
    geometry=None,
) -> Tuple[FieldState, PretrainAux]:
    f = cfg
    S = f.max_segments
    D = f.fts_dim
    heads = _num_heads(D)

    if geometry is None:
        from dynam3d_tpu.geom.projection import unproject_depth_habitat

        rel_x, rel_y, rel_z, _, _ = unproject_depth_habitat(
            depth, heading, height=f.input_height, width=f.input_width,
            hfov_deg=f.input_hfov, vfov_deg=f.input_vfov,
        )
        ppos = jnp.stack([rel_x, rel_y, rel_z], -1) + position[None, :]
    else:
        ppos = geometry[0]

    if gt_xyz is not None:
        seg_gt = segment_gt_ids(
            segm, ppos, gt_xyz, gt_label, gt_valid, S, max_gt_label
        )
    else:
        seg_gt = jnp.full((S,), -1, jnp.int32)

    pre_state = state
    new_state, aux = update_view(
        params, state, cfg, depth, grid_fts, segm, position, heading,
        seg_gt_id=seg_gt, geometry=geometry,
    )

    # instance semantic-alignment targets (":968-973")
    target_seg_fts, _ = segment_mean(grid_fts.astype(jnp.float32), segm, S)
    patch_mean = jnp.mean(grid_fts.astype(jnp.float32), axis=0)

    # per-view pseudo-zone prediction vs CLIP CLS (":1291-1303")
    centers = aux.seg_center
    mean_center = jnp.sum(
        jnp.where(aux.seg_active[:, None], centers, 0.0), axis=0
    ) / jnp.maximum(jnp.sum(aux.seg_active), 1)
    rel = centers - mean_center
    dist = jnp.linalg.norm(centers, axis=-1, keepdims=True)
    emb = jnp.concatenate([rel, dist], axis=-1)
    ztokens = aux.seg_fts + mlp2(params["inst_pos_mlp"], emb)
    ztokens = jnp.concatenate([params["i2z_agg_token"], ztokens], axis=0)
    kp = jnp.concatenate([jnp.ones((1,), bool), aux.seg_active])
    zone_pred = encoder_stack(params["i2z_encoder"], ztokens, heads, key_padding_mask=kp)[0]

    # merge supervision (":1030-1047") against the PRE-view gt-id table
    prop_gt = pre_state.inst_gt_id[aux.merge_inds]            # [S,K]
    merge_target = (prop_gt == seg_gt[:, None]) & (seg_gt[:, None] >= 0)
    merge_valid = (
        aux.seg_active[:, None]
        & (seg_gt[:, None] >= 0)
        & (aux.merge_inds >= 0)
        & pre_state.inst_valid[jnp.maximum(aux.merge_inds, 0)]
    )

    # updated-instance predictions (":1142")
    own = jnp.maximum(aux.owner, 0)
    inst_pred_fts = new_state.inst_fts[own]
    inst_pred_gt = jnp.where(aux.seg_active, new_state.inst_gt_id[own], -1)

    # touched zones + member gt ids
    seg_cells = jnp.where(
        aux.seg_active[:, None], cell_center(centers, cfg), 1e9
    )
    cells = jnp.unique(seg_cells, axis=0, size=S, fill_value=1e9)
    cell_real = cells[:, 0] < 5e8
    key_eq = jnp.all(
        jnp.abs(cells[:, None, :] - new_state.zone_key[None, :, :]) < 1e-4, axis=-1
    ) & new_state.zone_valid[None, :]
    z_exists = jnp.any(key_eq, axis=1) & cell_real
    zid = jnp.argmax(key_eq, axis=1)
    zone_pred_zone_fts = new_state.zone_fts[zid]
    inst_cells = cell_center(new_state.inst_pos, cfg)
    member = (
        jnp.all(jnp.abs(cells[:, None, :] - inst_cells[None, :, :]) < 1e-4, axis=-1)
        & new_state.inst_valid[None, :]
    )
    Kz = cfg.max_zone_members
    mkeys = jnp.where(member, jnp.arange(member.shape[1])[None, :], member.shape[1])
    mslots = jnp.sort(mkeys, axis=1)[:, :Kz]
    mvalid = mslots < member.shape[1]
    mgt = jnp.where(
        mvalid,
        new_state.inst_gt_id[jnp.minimum(mslots, member.shape[1] - 1)],
        -1,
    )

    return new_state, PretrainAux(
        base=aux,
        seg_gt_id=seg_gt,
        target_seg_fts=target_seg_fts,
        patch_mean_fts=patch_mean,
        zone_pred_fts=zone_pred,
        merge_target=merge_target.astype(jnp.int32),
        merge_valid=merge_valid,
        inst_pred_fts=inst_pred_fts,
        inst_pred_gt=inst_pred_gt,
        zone_member_gt=mgt,
        zone_pred_zone_fts=zone_pred_zone_fts,
        zone_touch_valid=z_exists,
    )
