"""The dynamic layer-wise 3D memory update — jittable, batched, fixed-shape.

TPU-first redesign of ``Feature_Fields.update_feature_fields`` and
``delete_old_features_from_camera_frustum``
(vlnce_baselines/models/feature_fields.py:493-816,329-396).

The reference processes each FastSAM segment in a Python loop: aggregate its
patches with a 2-layer transformer, k-NN the pre-view instance table, run a
merge discriminator, then either allocate a new instance or merge and
*re-aggregate all member patches* of the target (":580-691").  Three
observations turn that loop into one batched program:

1. Per-segment aggregation is attention restricted to same-segment tokens, so
   ALL segments aggregate in ONE block-diagonal-masked attention over
   ``[S_max + H*W]`` tokens (each patch belongs to exactly one segment).
2. Every segment's merge proposal queries the same PRE-view instance table
   (":606"), so proposals/discriminator batch trivially.
3. When several segments merge into the same instance, the reference
   re-aggregates it once per segment with growing membership — but only the
   LAST re-aggregation survives, and it sees the final membership.  So one
   re-aggregation per merged instance with final membership is exact.

Intentional divergences from the reference (see also state.py):
  - reused patch/zone ids write INTO their slots instead of aliasing stale
    appended rows (reference bug, feature_fields.py:629 vs :556-570);
  - a touched zone cell with zero member instances is skipped instead of
    producing NaN means (reference torch ``.mean()`` over an empty set);
  - a zone whose last member instance moves away is invalidated; the
    reference keeps the stale row (features frozen at its last refresh)
    addressable by get_environment_features forever (update never deletes
    zones, feature_fields.py:693-756 — verified against the actual reference
    code in tests/test_reference_golden.py);
  - instance re-aggregation gathers at most ``cfg.max_members`` member
    patches (lowest slot ids first) instead of all — the reference instead
    silently switches gradients off above a GPU-memory threshold (":678-686");
  - module dropout (p=0.1 at train) is not applied.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.geom.projection import frustum_mask_habitat, unproject_depth_habitat
from dynam3d_tpu.models.memory3d.state import TOMBSTONE, FieldState, cell_center
from dynam3d_tpu.ops.knn import knn_brute
from dynam3d_tpu.ops.segment import first_free_slots, segment_mean
from dynam3d_tpu.ops.transformer import encoder_stack, mlp2, _dense, layer_norm

Params = Dict[str, Any]
_DEAD = 1e6  # reference's dead-proposal distance threshold (":607")
_PAD_CELL = 1e9


class ViewAux(NamedTuple):
    """Per-view byproducts (consumed by the pretrain losses / debugging)."""

    seg_fts: jnp.ndarray        # [S,D] this view's segment (2D instance) features
    seg_center: jnp.ndarray     # [S,3]
    seg_active: jnp.ndarray     # [S] bool
    merge_logits: jnp.ndarray   # [S,k] discriminator logits (merge class)
    merge_inds: jnp.ndarray     # [S,k] proposal instance ids
    is_merge: jnp.ndarray       # [S] bool
    owner: jnp.ndarray          # [S] i32 final instance id per segment
    patch_slots: jnp.ndarray    # [HW] i32 slots written this view


def _num_heads(d: int) -> int:
    return max(1, d // 64)


def _patch_pos_embedding_input(
    pos: jnp.ndarray, center: jnp.ndarray, direction: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """7-dim patch->instance embedding input (feature_fields.py:584-591).

    NOTE the reference's ``patch_to_center_distance`` is the norm of the
    ABSOLUTE patch position, not the offset (":587") — preserved.
    """
    rel = pos - center
    dist = jnp.linalg.norm(pos, axis=-1, keepdims=True)
    return jnp.concatenate(
        [rel, dist, jnp.sin(direction)[..., None], jnp.cos(direction)[..., None],
         scale[..., None]],
        axis=-1,
    )


def _merge_discriminator(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = _dense(p["fc1"], x)
    h = layer_norm(p["ln"], h)
    h = jax.nn.gelu(h, approximate=False)
    return _dense(p["fc2"], h)


def _first_k_true(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first k True entries (ascending) + fill mask."""
    idx = first_free_slots(~mask, k)
    n = jnp.sum(mask.astype(jnp.int32))
    return idx, jnp.arange(k) < n


def update_view(
    params: Params,
    state: FieldState,
    cfg: FieldsConfig,
    depth: jnp.ndarray,
    grid_fts: jnp.ndarray,
    segm: jnp.ndarray,
    position: jnp.ndarray,
    heading: jnp.ndarray,
    seg_gt_id: Optional[jnp.ndarray] = None,
    geometry: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[FieldState, ViewAux]:
    """Fold one posed RGB-D view into the 3D memory.

    Args:
      depth: ``[H*W]`` preprocessed metric depth.
      grid_fts: ``[H*W, D]`` CLIP patch-grid features.
      segm: ``[H*W]`` int32 FastSAM segment ids in ``[0, max_segments)``.
      position: ``[3]`` world-frame camera position (habitat swap applied).
      heading: scalar view heading (panorama offset already added).
      seg_gt_id: optional ``[S]`` gt instance ids per segment (pretrain
        supervision; recorded on new-instance creation, src_3dff
        feature_fields.py:1092-1097).
      geometry: optional precomputed ``(ppos [HW,3], pdir [HW], pscale [HW])``
        — the full-pose (K, R, T) patch geometry of posed-frame datasets
        (geom.patch_geometry_from_pose, reference generic-intrinsics branch
        feature_fields.py:905-916).  When absent, the habitat-mode
        position+heading unprojection is used.
    """
    H, W, D = cfg.input_height, cfg.input_width, cfg.fts_dim
    HW = H * W
    S = cfg.max_segments
    K = cfg.num_proposal_instances
    heads = _num_heads(D)

    # stop gradients across steps (feature_fields.py:496-498)
    state = state._replace(
        inst_fts=jax.lax.stop_gradient(state.inst_fts),
        zone_fts=jax.lax.stop_gradient(state.zone_fts),
    )

    # ---- 1. unproject this view's patches into world space ----
    if geometry is None:
        rel_x, rel_y, rel_z, pdir, pscale = unproject_depth_habitat(
            depth, heading, height=H, width=W,
            hfov_deg=cfg.input_hfov, vfov_deg=cfg.input_vfov,
        )
        ppos = jnp.stack([rel_x, rel_y, rel_z], -1) + position[None, :]  # [HW,3]
    else:
        ppos, pdir, pscale = geometry

    # ---- 2. write patches into reused free slots (evict-oldest on overflow) ----
    # free slots first in ascending id (the reference's allocator order);
    # if the table is full, the OLDEST patches are evicted — a bounded-memory
    # policy the unbounded reference lacks (SURVEY §7.4 hard part 1)
    stamp = jnp.max(state.patch_step) + 1
    P_cap = cfg.patch_capacity
    alloc_key = jnp.where(
        state.patch_valid, (state.patch_step + 1) * P_cap, 0
    ) + jnp.arange(P_cap, dtype=jnp.int32)
    _, slots = jax.lax.top_k(-alloc_key, HW)
    slots = jnp.sort(slots)  # ascending slot ids, as the reference hands out
    # evicted slots lose their instance membership
    evicted = state.patch_valid[slots]
    patch_owner0 = state.patch_owner.at[
        jnp.where(evicted, slots, P_cap)
    ].set(-1, mode="drop")
    patch_pos = state.patch_pos.at[slots].set(ppos)
    patch_fts = state.patch_fts.at[slots].set(grid_fts.astype(state.patch_fts.dtype))
    patch_dir = state.patch_dir.at[slots].set(pdir)
    patch_scale = state.patch_scale.at[slots].set(pscale)
    patch_valid = state.patch_valid.at[slots].set(True)
    patch_step = state.patch_step.at[slots].set(stamp)

    # ---- 3. per-segment aggregation (block-diagonal attention) ----
    centers, counts = segment_mean(ppos, segm, S)          # [S,3], [S]
    seg_active = counts > 0
    emb_in = _patch_pos_embedding_input(ppos, centers[segm], pdir, pscale)
    patch_tokens = grid_fts.astype(jnp.float32) + mlp2(params["patch_pos_mlp"], emb_in)
    # aggregation-encoder matmul dtype: bf16 is the reference's AMP regime
    # and carries the [S, 1+max_members] re-aggregation attention (the
    # single biggest perceive cost, ~18 ms f32 at full dims) on the MXU's
    # fast path; accumulations stay f32 (ops/transformer._dense)
    enc_dt = jnp.bfloat16 if cfg.encoder_dtype == "bf16" else jnp.float32
    agg = jnp.tile(params["p2i_agg_token"], (S, 1))        # [S,D]
    tokens = jnp.concatenate([agg, patch_tokens], axis=0)  # [S+HW,D]
    group = jnp.concatenate([jnp.arange(S, dtype=segm.dtype), segm])
    block_mask = group[:, None] == group[None, :]
    out = encoder_stack(
        params["p2i_encoder"], tokens.astype(enc_dt), heads,
        attn_mask=block_mask,
    )
    seg_fts = out[:S].astype(jnp.float32)                   # [S,D]

    # ---- 4. merge proposals against the PRE-view instance table ----
    sq_d, inds = knn_brute(centers, state.inst_pos, state.inst_valid, K)
    # reference's global column veto: re-query with fewer proposals whenever
    # ANY row's column is dead (feature_fields.py:607-610)
    col_dead = jnp.any((sq_d >= _DEAD) & seg_active[:, None], axis=0)  # [K]
    col_ok = jnp.cumsum(col_dead.astype(jnp.int32)) == 0               # prefix of live cols
    prop_pos = state.inst_pos[inds]                          # [S,K,3]
    prop_fts = state.inst_fts[inds]                          # [S,K,D]
    disc_in = jnp.concatenate(
        [prop_fts, jnp.broadcast_to(seg_fts[:, None, :], prop_fts.shape),
         centers[:, None, :] - prop_pos],
        axis=-1,
    )
    merge_logits = _merge_discriminator(params["merge_disc"], disc_in)  # [S,K,2]
    merge_flag = (jnp.argmax(merge_logits, -1) == 1) & col_ok[None, :] & seg_active[:, None]
    is_merge = jnp.any(merge_flag, axis=-1)
    # merge into the NEAREST flagged proposal (":651-691 break")
    first_flag = jnp.argmax(merge_flag, axis=-1)
    merge_target = jnp.take_along_axis(inds, first_flag[:, None], axis=1)[:, 0]

    # ---- 5. allocate new instances & assign owners ----
    is_new = seg_active & ~is_merge
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    free_inst = first_free_slots(state.inst_valid, S)
    new_ids = free_inst[jnp.clip(new_rank, 0, S - 1)]
    owner = jnp.where(is_merge, merge_target, new_ids)
    owner = jnp.where(seg_active, owner, -1)

    inst_pos = state.inst_pos
    inst_fts = state.inst_fts
    inst_valid = state.inst_valid
    inst_gt_id = state.inst_gt_id
    # scatter new instances (drop inactive rows)
    new_write = jnp.where(is_new, new_ids, cfg.instance_capacity)  # OOB -> dropped
    inst_pos = inst_pos.at[new_write].set(centers, mode="drop")
    inst_fts = inst_fts.at[new_write].set(seg_fts.astype(inst_fts.dtype), mode="drop")
    inst_valid = inst_valid.at[new_write].set(True, mode="drop")
    if seg_gt_id is not None:
        inst_gt_id = inst_gt_id.at[new_write].set(seg_gt_id, mode="drop")

    # patch ownership for this view's slots
    patch_owner = patch_owner0.at[slots].set(owner[segm])

    # ---- 6. re-aggregate merged instances with FINAL membership ----
    merged_mask = (
        jnp.zeros((cfg.instance_capacity,), bool)
        .at[jnp.where(is_merge, merge_target, cfg.instance_capacity)]
        .set(True, mode="drop")
    )
    M = cfg.max_segments  # at most one merge target per segment
    merge_ids, merge_fill = _first_k_true(merged_mask, M)
    Tm = cfg.max_members
    member_of = (patch_owner[None, :] == merge_ids[:, None]) & patch_valid[None, :] & merge_fill[:, None]
    mkeys = jnp.where(member_of, jnp.arange(cfg.patch_capacity)[None, :], cfg.patch_capacity)
    mslots = jnp.sort(mkeys, axis=1)[:, :Tm]                 # [M,Tm]
    mvalid_all = mslots < cfg.patch_capacity

    def _reagg(ids, fill, msl, mva):
        """Re-aggregate ``m`` merged instances (rows sliced by the caller);
        returns the updated (inst_pos, inst_fts) tables."""
        m = ids.shape[0]
        msl_c = jnp.minimum(msl, cfg.patch_capacity - 1)
        mpos = patch_pos[msl_c]                              # [m,Tm,3]
        mfts = patch_fts[msl_c].astype(jnp.float32)
        mdir = patch_dir[msl_c]
        mscale = patch_scale[msl_c]
        mcount = jnp.maximum(jnp.sum(mva, axis=1), 1)
        nc = jnp.sum(jnp.where(mva[..., None], mpos, 0.0), axis=1) / mcount[:, None]
        memb_in = _patch_pos_embedding_input(mpos, nc[:, None, :], mdir, mscale)
        mtokens = mfts + mlp2(params["patch_pos_mlp"], memb_in)
        magg = jnp.broadcast_to(params["p2i_agg_token"], (m, 1, D))
        mtokens = jnp.concatenate([magg, mtokens], axis=1)   # [m,1+Tm,D]
        kp = jnp.concatenate([jnp.ones((m, 1), bool), mva], axis=1)
        mout = encoder_stack(
            params["p2i_encoder"], mtokens.astype(enc_dt), heads,
            key_padding_mask=kp,
        )
        merged_fts = mout[:, 0].astype(jnp.float32)          # [m,D]
        mwrite = jnp.where(fill, ids, cfg.instance_capacity)
        return (
            inst_pos.at[mwrite].set(nc, mode="drop"),
            inst_fts.at[mwrite].set(
                merged_fts.astype(inst_fts.dtype), mode="drop"
            ),
        )

    # NOTE a data-dependent two-tier (cond on the merged count) was tried
    # and reverted: update_view runs under jax.vmap in policy.perceive, and
    # a vmapped lax.cond lowers to select_n — BOTH branches execute, adding
    # the small tier's work on top of the full one
    inst_pos, inst_fts = _reagg(merge_ids, merge_fill, mslots, mvalid_all)

    # ---- 7. zone updates over cells touched by this view's segment centers ----
    # (the reference keys zones by the SEGMENT centers, not post-merge
    #  instance positions — feature_fields.py:695)
    seg_cells = jnp.where(
        seg_active[:, None], cell_center(centers, cfg), _PAD_CELL
    )
    cells = jnp.unique(seg_cells, axis=0, size=S, fill_value=_PAD_CELL)  # sorted
    cell_real = cells[:, 0] < _PAD_CELL / 2

    # existing zone lookup by key
    key_eq = jnp.all(
        jnp.abs(cells[:, None, :] - state.zone_key[None, :, :]) < 1e-4, axis=-1
    ) & state.zone_valid[None, :]                            # [S,Z]
    zone_exists = jnp.any(key_eq, axis=1)
    existing_id = jnp.argmax(key_eq, axis=1)

    # members: ALL valid instances currently in the cell (":708,736")
    inst_cells = cell_center(inst_pos, cfg)
    zmember = (
        jnp.all(jnp.abs(cells[:, None, :] - inst_cells[None, :, :]) < 1e-4, axis=-1)
        & inst_valid[None, :]
        & cell_real[:, None]
    )                                                        # [S,I]
    zone_has_members = jnp.any(zmember, axis=1)
    # ids are consumed only by zones that will be written (member-less touched
    # cells are skipped entirely, see the divergence note in the docstring)
    is_new_zone = cell_real & ~zone_exists & zone_has_members
    z_rank = jnp.cumsum(is_new_zone.astype(jnp.int32)) - 1
    free_zone = first_free_slots(state.zone_valid, S)
    zid = jnp.where(zone_exists, existing_id, free_zone[jnp.clip(z_rank, 0, S - 1)])
    Km = cfg.max_zone_members
    zkeys = jnp.where(zmember, jnp.arange(cfg.instance_capacity)[None, :], cfg.instance_capacity)
    zslots = jnp.sort(zkeys, axis=1)[:, :Km]
    zvalid_m = zslots < cfg.instance_capacity
    zslots_c = jnp.minimum(zslots, cfg.instance_capacity - 1)
    z_inst_pos = inst_pos[zslots_c]                          # [S,Km,3]
    z_inst_fts = inst_fts[zslots_c].astype(jnp.float32)
    zcount = jnp.sum(zvalid_m, axis=1)
    has_members = zcount > 0

    # reference quirk preserved: OLD-zone updates embed members at the CELL
    # CENTER (zero relative offset), NEW zones at true instance positions
    # (feature_fields.py:714-725 vs :736-751)
    member_pos_eff = jnp.where(
        zone_exists[:, None, None], cells[:, None, :], z_inst_pos
    )
    zpos_new = jnp.sum(jnp.where(zvalid_m[..., None], member_pos_eff, 0.0), axis=1) / jnp.maximum(zcount, 1)[:, None]
    z_rel = member_pos_eff - zpos_new[:, None, :]
    z_dist = jnp.linalg.norm(member_pos_eff, axis=-1, keepdims=True)
    z_emb_in = jnp.concatenate([z_rel, z_dist], axis=-1)     # [S,Km,4]
    ztokens = z_inst_fts + mlp2(params["inst_pos_mlp"], z_emb_in)
    zagg = jnp.broadcast_to(params["i2z_agg_token"], (S, 1, D))
    ztokens = jnp.concatenate([zagg, ztokens], axis=1)
    zkp = jnp.concatenate([jnp.ones((S, 1), bool), zvalid_m], axis=1)
    zout = encoder_stack(
        params["i2z_encoder"], ztokens.astype(enc_dt), heads,
        key_padding_mask=zkp,
    )
    zfts_new = zout[:, 0].astype(jnp.float32)

    do_write = cell_real & has_members
    zwrite = jnp.where(do_write, zid, cfg.zone_capacity)
    zone_key = state.zone_key.at[zwrite].set(cells, mode="drop")
    zone_pos = state.zone_pos.at[zwrite].set(zpos_new, mode="drop")
    zone_fts = state.zone_fts.at[zwrite].set(zfts_new.astype(state.zone_fts.dtype), mode="drop")
    zone_valid = state.zone_valid.at[zwrite].set(True, mode="drop")

    new_state = FieldState(
        patch_pos=patch_pos,
        patch_fts=patch_fts,
        patch_dir=patch_dir,
        patch_scale=patch_scale,
        patch_owner=patch_owner,
        patch_valid=patch_valid,
        patch_step=patch_step,
        inst_pos=inst_pos,
        inst_fts=inst_fts,
        inst_valid=inst_valid,
        inst_gt_id=inst_gt_id,
        zone_key=zone_key,
        zone_pos=zone_pos,
        zone_fts=zone_fts,
        zone_valid=zone_valid,
    )
    aux = ViewAux(
        seg_fts=seg_fts,
        seg_center=centers,
        seg_active=seg_active,
        merge_logits=merge_logits[..., 1] - merge_logits[..., 0],
        merge_inds=inds,
        is_merge=is_merge,
        owner=owner,
        patch_slots=slots,
    )
    return new_state, aux


def update_views(
    params: Params,
    state: FieldState,
    cfg: FieldsConfig,
    depth: jnp.ndarray,       # [V,HW]
    grid_fts: jnp.ndarray,    # [V,HW,D]
    segm: jnp.ndarray,        # [V,HW]
    position: jnp.ndarray,    # [3]
    headings: jnp.ndarray,    # [V] per-view headings (panorama offsets applied)
) -> Tuple[FieldState, ViewAux]:
    """Sequentially fold V views (12 for panoramas) — ``lax.scan`` over views.

    Later views must see earlier views' instances (the reference's in-order
    view loop, feature_fields.py:529), hence the scan rather than a vmap.
    """

    def step(st, xs):
        d, g, sg, h = xs
        st, aux = update_view(params, st, cfg, d, g, sg, position, h)
        return st, aux

    return jax.lax.scan(step, state, (depth, grid_fts, segm, headings))


def delete_from_frustum(
    state: FieldState,
    cfg: FieldsConfig,
    depth: jnp.ndarray,      # [H,W] metric depth of the current view
    position: jnp.ndarray,   # [3] world-frame camera position
    heading: jnp.ndarray,    # scalar
) -> FieldState:
    """Forget memory inside the current camera frustum (dynamic-scene update).

    Port of ``delete_old_features_from_camera_frustum``
    (feature_fields.py:329-396): tombstone visible patches, then instances
    that lost all patches, then zones (keyed by the dead instance's cell)
    that lost all instances.
    """
    P, I = cfg.patch_capacity, cfg.instance_capacity
    # the reference culls against the FULL-RES depth map (256x256 in VLN,
    # Policy_Dynam3D_VLN.py:350) — intrinsics derive from the map's shape
    dh, dw = depth.shape
    doomed = frustum_mask_habitat(
        state.patch_pos, depth, position, heading,
        height=dh, width=dw,
        hfov_deg=cfg.input_hfov, vfov_deg=cfg.input_vfov,
        near=0.0, far=cfg.deleted_frustum_distance,
        depth_slack=cfg.frustum_depth_slack,
    ) & state.patch_valid

    patch_valid = state.patch_valid & ~doomed
    patch_pos = jnp.where(doomed[:, None], TOMBSTONE, state.patch_pos)
    patch_fts = jnp.where(doomed[:, None], 0, state.patch_fts)
    patch_dir = jnp.where(doomed, 0.0, state.patch_dir)
    patch_scale = jnp.where(doomed, 0.0, state.patch_scale)
    patch_owner = jnp.where(doomed, -1, state.patch_owner)

    # instances that lost every member patch
    own = jnp.where(patch_valid, patch_owner, I)
    live_counts = jnp.zeros((I + 1,), jnp.int32).at[jnp.clip(own, 0, I)].add(1)[:I]
    inst_dead = state.inst_valid & (live_counts == 0)
    # ... but only instances that HAD a doomed patch are re-checked
    # (zones of untouched instances are never revisited in the reference)
    touched = jnp.zeros((I + 1,), bool).at[
        jnp.clip(jnp.where(doomed, state.patch_owner, I), 0, I)
    ].set(True)[:I]
    inst_dead = inst_dead & touched

    inst_valid = state.inst_valid & ~inst_dead
    inst_pos = jnp.where(inst_dead[:, None], TOMBSTONE, state.inst_pos)
    inst_fts = jnp.where(inst_dead[:, None], 0, state.inst_fts)
    inst_gt_id = jnp.where(inst_dead, -10000, state.inst_gt_id)

    # zones keyed by dead instances' cells that now have zero members
    dead_cells = cell_center(state.inst_pos, cfg)            # pre-tombstone positions
    zone_touched = jnp.any(
        jnp.all(
            jnp.abs(state.zone_key[:, None, :] - dead_cells[None, :, :]) < 1e-4,
            axis=-1,
        )
        & inst_dead[None, :],
        axis=1,
    ) & state.zone_valid
    live_cells = cell_center(inst_pos, cfg)
    members_left = jnp.sum(
        jnp.all(
            jnp.abs(state.zone_key[:, None, :] - live_cells[None, :, :]) < 1e-4,
            axis=-1,
        )
        & inst_valid[None, :],
        axis=1,
    )
    zone_dead = zone_touched & (members_left == 0)
    zone_valid = state.zone_valid & ~zone_dead
    zone_key = jnp.where(zone_dead[:, None], TOMBSTONE, state.zone_key)
    zone_pos = jnp.where(zone_dead[:, None], TOMBSTONE, state.zone_pos)
    zone_fts = jnp.where(zone_dead[:, None], 0, state.zone_fts)

    return FieldState(
        patch_pos=patch_pos,
        patch_fts=patch_fts,
        patch_dir=patch_dir,
        patch_scale=patch_scale,
        patch_owner=patch_owner,
        patch_valid=patch_valid,
        patch_step=state.patch_step,
        inst_pos=inst_pos,
        inst_fts=inst_fts,
        inst_valid=inst_valid,
        inst_gt_id=inst_gt_id,
        zone_key=zone_key,
        zone_pos=zone_pos,
        zone_fts=zone_fts,
        zone_valid=zone_valid,
    )
