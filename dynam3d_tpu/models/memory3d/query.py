"""Read-side queries of the 3D memory.

Port of ``Feature_Fields.get_environment_features``
(vlnce_baselines/models/feature_fields.py:818-862): agent-relative instance
tokens within 5 m and zone tokens within 100 m, rotated into the agent's
heading frame.  Fixed-capacity outputs with validity masks instead of ragged
lists.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynam3d_tpu.models.memory3d.state import FieldState


class EnvFeatures(NamedTuple):
    inst_fts: jnp.ndarray       # [I,D]
    inst_rel_pos: jnp.ndarray   # [I,3] agent-frame
    inst_mask: jnp.ndarray      # [I] bool (valid & within instance_distance)
    zone_fts: jnp.ndarray       # [Z,D]
    zone_rel_pos: jnp.ndarray   # [Z,3]
    zone_mask: jnp.ndarray      # [Z] bool


def _relative(pos: jnp.ndarray, camera: jnp.ndarray, heading: jnp.ndarray) -> jnp.ndarray:
    """Rotate world offsets into the agent frame (feature_fields.py:831-838)."""
    h = -heading
    px = pos[:, 0] - camera[0]
    py = pos[:, 1] - camera[1]
    pz = pos[:, 2] - camera[2]
    rel_x = px * jnp.cos(h) - py * jnp.sin(h)
    rel_y = px * jnp.sin(h) + py * jnp.cos(h)
    return jnp.stack([rel_x, rel_y, pz], axis=-1)


def environment_features(
    state: FieldState,
    camera_position: jnp.ndarray,   # [3] world frame (habitat swap applied)
    heading: jnp.ndarray,           # scalar
    instance_distance: float = 5.0,
    zone_distance: float = 100.0,
) -> EnvFeatures:
    inst_rel = _relative(state.inst_pos, camera_position, heading)
    inst_mask = state.inst_valid & (
        jnp.linalg.norm(inst_rel, axis=-1) <= instance_distance
    )
    zone_rel = _relative(state.zone_pos, camera_position, heading)
    zone_mask = state.zone_valid & (
        jnp.linalg.norm(zone_rel, axis=-1) <= zone_distance
    )
    return EnvFeatures(
        inst_fts=state.inst_fts,
        inst_rel_pos=inst_rel,
        inst_mask=inst_mask,
        zone_fts=state.zone_fts,
        zone_rel_pos=zone_rel,
        zone_mask=zone_mask,
    )
