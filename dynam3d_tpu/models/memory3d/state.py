"""Fixed-capacity, device-resident state of the layered 3D memory.

The reference keeps the patch/instance/zone memory as per-batch Python lists,
growing numpy/torch arrays and dict id maps (feature_fields.py:163-183), with
deleted entries tombstoned at position -10000 and ids reused by linear scans
over the dicts (":433-475").  On TPU this becomes one pytree of preallocated
HBM tables with validity masks; id reuse is "first free slot" allocation.

DESIGN NOTE / intentional divergence: the reference reuses freed *ids* while
appending new *rows* to the end of its arrays, so after any frustum deletion,
reused patch/zone ids alias stale tombstoned rows (ids handed out by
``assign_new_patch_ids`` at feature_fields.py:629 index arrays that were
extended at ":556-570"; same for zones at ":698 vs :715,730").  This build
writes new data INTO the reused slots, which is the evident intent (and what
the reference's own instance path does at ":643-648"), keeps ids and rows
consistent, and bounds memory.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig

TOMBSTONE = -10000.0


class FieldState(NamedTuple):
    """Single-episode (single batch element) 3D memory. Batch via vmap."""

    # --- patch layer [P] ---
    patch_pos: jnp.ndarray      # [P,3] f32 world xyz (TOMBSTONE when dead)
    patch_fts: jnp.ndarray      # [P,D] bf16 CLIP patch features
    patch_dir: jnp.ndarray      # [P]   f32 absolute viewing direction
    patch_scale: jnp.ndarray    # [P]   f32 metric patch footprint
    patch_owner: jnp.ndarray    # [P]   i32 owning instance id (-1 = none)
    patch_valid: jnp.ndarray    # [P]   bool
    patch_step: jnp.ndarray     # [P]   i32 write-age stamp (eviction priority;
                                #       the reference grows unboundedly instead)

    # --- instance layer [I] ---
    inst_pos: jnp.ndarray       # [I,3] f32
    inst_fts: jnp.ndarray       # [I,D] f32
    inst_valid: jnp.ndarray     # [I]   bool
    inst_gt_id: jnp.ndarray     # [I]   i32 gt instance id (pretrain supervision;
                                #       src_3dff feature_fields.py:1092-1097; -1 unset)

    # --- zone layer [Z] ---
    zone_key: jnp.ndarray       # [Z,3] f32 cell-center key (2x2x2 m cells)
    zone_pos: jnp.ndarray       # [Z,3] f32
    zone_fts: jnp.ndarray       # [Z,D] f32
    zone_valid: jnp.ndarray     # [Z]   bool


def init_state(cfg: FieldsConfig, fts_dtype=jnp.bfloat16) -> FieldState:
    P, I, Z, D = (
        cfg.patch_capacity,
        cfg.instance_capacity,
        cfg.zone_capacity,
        cfg.fts_dim,
    )
    return FieldState(
        patch_pos=jnp.full((P, 3), TOMBSTONE, jnp.float32),
        patch_fts=jnp.zeros((P, D), fts_dtype),
        patch_dir=jnp.zeros((P,), jnp.float32),
        patch_scale=jnp.zeros((P,), jnp.float32),
        patch_owner=jnp.full((P,), -1, jnp.int32),
        patch_valid=jnp.zeros((P,), bool),
        patch_step=jnp.zeros((P,), jnp.int32),
        inst_pos=jnp.full((I, 3), TOMBSTONE, jnp.float32),
        inst_fts=jnp.zeros((I, D), jnp.float32),
        inst_valid=jnp.zeros((I,), bool),
        inst_gt_id=jnp.full((I,), -1, jnp.int32),
        zone_key=jnp.full((Z, 3), TOMBSTONE, jnp.float32),
        zone_pos=jnp.full((Z, 3), TOMBSTONE, jnp.float32),
        zone_fts=jnp.zeros((Z, D), jnp.float32),
        zone_valid=jnp.zeros((Z,), bool),
    )


def cell_center(pos: jnp.ndarray, cfg: FieldsConfig) -> jnp.ndarray:
    """Zone cell-center key of world positions ``[...,3]``.

    Matches ``(p // l) * l + l/2`` with torch float floor-division
    (feature_fields.py:694-695).
    """
    lens = jnp.asarray(
        [cfg.zone_x_length, cfg.zone_y_length, cfg.zone_z_length], jnp.float32
    )
    return jnp.floor(pos / lens) * lens + lens / 2.0
