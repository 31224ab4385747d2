"""VLN imitation-learning trainer: per-step teacher-forced updates.

TPU redesign of ``RLTrainer`` (vlnce_baselines/ss_trainer_Dynam3D.py):
Adafactor lr 1e-6, NaN-grad scrubbing, grad-norm clip 10 (":786-798"),
per-step backward, checkpoint save/resume.  The device-side train step is a
single jitted program (perceive + teacher-forced loss + update); DP replicas
sync grads through the mesh's implicit psum (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.models import policy as policy_mod
from dynam3d_tpu.models.memory3d import FieldState

Params = Dict[str, Any]

TRAINABLE_KEYS = (
    # reference freezes feature_fields, both CLIP towers and the multimodal
    # projector (Policy_Dynam3D_VLN.py:151-157); the LM and the 3D-token
    # projectors train.
    "patch_pos_emb",
    "inst_pos_emb",
    "zone_pos_emb",
    "inst_proj",
    "zone_proj",
)


def split_params(params: Params) -> Tuple[Params, Params]:
    """(trainable, frozen) split of the policy param tree."""
    trainable = {k: params[k] for k in TRAINABLE_KEYS}
    trainable["phi3"] = params["llava"]["phi3"]
    frozen = {k: v for k, v in params.items() if k not in TRAINABLE_KEYS}
    frozen["llava"] = {
        k: v for k, v in params["llava"].items() if k != "phi3"
    }
    return trainable, frozen


def merge_params(trainable: Params, frozen: Params) -> Params:
    merged = dict(frozen)
    for k in TRAINABLE_KEYS:
        merged[k] = trainable[k]
    merged["llava"] = dict(frozen["llava"])
    merged["llava"]["phi3"] = trainable["phi3"]
    return merged


def make_optimizer(cfg: Dynam3DConfig) -> optax.GradientTransformation:
    """Adafactor lr 1e-6 (main.bash / ss_trainer_Dynam3D.py:192-198)."""
    return optax.adafactor(learning_rate=cfg.train.lr)


class TrainBatch(NamedTuple):
    rgb: jnp.ndarray          # [B,V,H,W,3] u8
    depth: jnp.ndarray        # [B,V,Hd,Wd] f32
    position: jnp.ndarray     # [B,3]
    heading: jnp.ndarray      # [B]
    input_ids: jnp.ndarray    # [B,T]
    text_valid: jnp.ndarray   # [B,T]
    label_ids: jnp.ndarray    # [B,Tg]
    label_mask: jnp.ndarray   # [B,Tg]
    turn_weight: jnp.ndarray  # [B]


def _scrub_and_clip(grads, max_norm: float):
    """Zero NaN grads, clip global norm (ss_trainer_Dynam3D.py:792-796)."""
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isnan(g), 0.0, g), grads
    )
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def make_train_step(cfg: Dynam3DConfig, optimizer, splice_start: int = 2):
    """Build the jitted IL step: (trainable, frozen, opt_state, field_state,
    batch) -> (trainable, opt_state, field_state, metrics).

    NaN loss skips the update (reference ":788-791")."""

    def step(trainable, frozen, opt_state, field_state: FieldState, batch: TrainBatch):
        def loss_fn(tr):
            p = merge_params(tr, frozen)
            out = policy_mod.perceive(
                p, cfg, field_state, batch.rgb, batch.depth,
                batch.position, batch.heading,
            )
            tl = policy_mod.train_loss(
                p, cfg, batch.input_ids, batch.text_valid,
                out.mm_tokens, out.mm_valid,
                batch.label_ids, batch.label_mask, batch.turn_weight,
                splice_start,
            )
            return tl.loss, out.state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable
        )
        grads, gnorm = _scrub_and_clip(grads, cfg.train.grad_clip_norm)
        updates, new_opt = optimizer.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        skip = jnp.isnan(loss)
        new_trainable = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_trainable, trainable
        )
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new) if hasattr(new, "shape") else new,
            new_opt, opt_state,
        )
        metrics = {"loss": loss, "grad_norm": gnorm, "skipped": skip}
        return new_trainable, new_opt, new_state, metrics

    return step
