"""Learned modules of the 3D memory (parameter construction).

Mirrors the module set of ``Feature_Fields.__init__``
(vlnce_baselines/models/feature_fields.py:132-161):

  - patch->instance position-embedding MLP (7 -> D)
  - [AGG] token + 2-layer post-norm transformer aggregator (patch->instance)
  - instance->zone position-embedding MLP (4 -> D)
  - [AGG] token + 2-layer aggregator (instance->zone)
  - instance merge discriminator MLP (2D+3 -> 4D -> 2)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import FieldsConfig
from dynam3d_tpu.ops.transformer import init_encoder_stack, init_mlp2, _init_dense, _init_ln

Params = Dict[str, Any]


def init_field_params(key: jax.Array, cfg: FieldsConfig) -> Params:
    d = cfg.fts_dim
    scale = d ** -0.5
    ks = jax.random.split(key, 8)
    return {
        "patch_pos_mlp": init_mlp2(ks[0], 7, d, d),
        "p2i_agg_token": scale * jax.random.normal(ks[1], (1, d), jnp.float32),
        "p2i_encoder": init_encoder_stack(ks[2], d, 4 * d, 2),
        "inst_pos_mlp": init_mlp2(ks[3], 4, d, d),
        "i2z_agg_token": scale * jax.random.normal(ks[4], (1, d), jnp.float32),
        "i2z_encoder": init_encoder_stack(ks[5], d, 4 * d, 2),
        "merge_disc": {
            "fc1": _init_dense(ks[6], 2 * d + 3, 4 * d),
            "ln": _init_ln(4 * d),
            "fc2": _init_dense(ks[7], 4 * d, 2),
        },
    }
