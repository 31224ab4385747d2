"""LLaVA-Phi-3-mini: vision tower + projector + multimodal splice + decode.

Port of the reference's 3D-VLM usage of HF LlavaForConditionalGeneration
(Policy_Dynam3D_VLN.py):

  - ``get_image_features``: CLIP-L/14-336 tower hidden states at
    ``vision_feature_layer=-2``, CLS dropped, through a 2-layer MLP projector
    (":383-388");
  - prompt embeds from the token table, then the ``<image>`` placeholder span
    starting at position 2 is REPLACED by [patch tokens (+3D position
    embedding) | instance tokens | zone tokens] (":393-394,456-457");
  - train: teacher-forced CE on the action-token span (+ extra CE on the
    turn-direction token, ":412-418");
  - eval: greedy decode, 20 new tokens max (":463").
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import CLIPConfig, LLaVAConfig
from dynam3d_tpu.models.encoders import clip as clip_mod
from dynam3d_tpu.models.vlm import phi3

Params = Dict[str, Any]


def image_features(
    params: Params,
    llava_cfg: LLaVAConfig,
    clip_cfg: CLIPConfig,
    pixels: jnp.ndarray,           # [B,H,W,3] normalized
) -> jnp.ndarray:
    """CLIP tower (layer -2 hidden states, CLS dropped) -> projector.

    Matches HF ``get_image_features`` with ``vision_feature_layer=-2`` and
    ``vision_feature_select_strategy="default"``.
    """
    hidden = clip_mod.encode_image(
        params["clip"], clip_cfg, pixels, hidden_layer=llava_cfg.vision_feature_layer
    )  # [B, 1+G*G, Wv]
    patches = hidden[:, 1:, :]
    p = params["projector"]
    from dynam3d_tpu.ops.transformer import weight_like

    h = jnp.dot(
        patches, weight_like(patches, p["fc1"]["w"]),
        preferred_element_type=jnp.float32,
    ) + p["fc1"]["b"]
    h = jax.nn.gelu(h.astype(patches.dtype), approximate=False)
    h = jnp.dot(
        h, weight_like(h, p["fc2"]["w"]), preferred_element_type=jnp.float32
    ) + p["fc2"]["b"]
    return h.astype(patches.dtype)


def splice_embeds(
    params: Params,
    cfg: LLaVAConfig,
    input_ids: jnp.ndarray,        # [B,T]
    mm_tokens: jnp.ndarray,        # [B,N,D] multimodal tokens (patch+inst+zone)
    splice_start: int = 2,
) -> jnp.ndarray:
    """Token embeddings with ``mm_tokens`` written over the ``<image>`` span.

    The reference concatenates ``[embeds[:, :2] | patch | instance | zone |
    embeds[:, 2+N:]]`` (Policy_Dynam3D_VLN.py:393) — i.e. the span location is
    static; a dynamic-slice write keeps the shape fixed for XLA.
    """
    emb = phi3.embed(params["phi3"], input_ids).astype(mm_tokens.dtype)
    return jax.lax.dynamic_update_slice(emb, mm_tokens, (0, splice_start, 0))


class TrainOutput(NamedTuple):
    loss: jnp.ndarray
    logits_at_labels: jnp.ndarray  # [B, Tg, V] logits aligned to label tokens


def teacher_forced_loss(
    params: Params,
    cfg: LLaVAConfig,
    embeds: jnp.ndarray,           # [B,T,D] spliced full sequence (prompt+labels)
    attn_valid: jnp.ndarray,       # [B,T]
    label_ids: jnp.ndarray,        # [B,Tg] gt action tokens (start token removed)
    label_mask: jnp.ndarray,       # [B,Tg] bool
    prompt_len: jnp.ndarray,       # [B] valid prompt length
    turn_token_weight: jnp.ndarray,  # [B] 1.0 where the extra turn-token CE applies
) -> TrainOutput:
    """CE over the gt action span + extra CE on the turn-direction token.

    Mirrors Policy_Dynam3D_VLN.py:401-426: logits at absolute positions
    ``[prompt_len-1, prompt_len-1+Tg)`` predict the label tokens; rows whose
    gt text contains stop/error skip the extra turn-token term (":417").
    """
    B, T, D = embeds.shape
    p3 = cfg.phi3
    cache = phi3.init_cache(p3, B, T, dtype=embeds.dtype)
    positions = jnp.maximum(jnp.cumsum(attn_valid.astype(jnp.int32), axis=1) - 1, 0)
    mask = phi3.prefill_mask(attn_valid, T)
    # remat per layer == the reference's gradient_checkpointing_enable
    logits, _ = phi3.forward(
        params["phi3"], p3, embeds, positions, cache, 0, mask, remat=True
    )

    Tg = label_ids.shape[1]
    # gather logits at [prompt_len-1 + j] for j in 0..Tg
    idx = (prompt_len[:, None] - 1) + jnp.arange(Tg)[None, :]
    idx = jnp.clip(idx, 0, T - 1)
    sel = jnp.take_along_axis(logits, idx[..., None], axis=1)  # [B,Tg,V]
    logp = jax.nn.log_softmax(sel, axis=-1)
    nll = -jnp.take_along_axis(logp, label_ids[..., None], axis=-1)[..., 0]
    per_row = jnp.sum(nll * label_mask, axis=1) / jnp.maximum(
        jnp.sum(label_mask, axis=1), 1
    )
    # the reference sums token CE (F.cross_entropy mean over the span) plus a
    # second CE on label position 1 (the turn left/right token)
    turn_nll = nll[:, 1] * turn_token_weight
    loss = jnp.mean(per_row + turn_nll)
    return TrainOutput(loss=loss, logits_at_labels=sel)


def generate(
    params: Params,
    cfg: LLaVAConfig,
    embeds: jnp.ndarray,
    attn_valid: jnp.ndarray,
    max_new_tokens: Optional[int] = None,
    lookup_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    from dynam3d_tpu import flags

    B = embeds.shape[0]
    if flags.SPEC_DECODE and B == 1:
        return phi3.greedy_decode_spec(
            params["phi3"],
            cfg.phi3,
            embeds,
            attn_valid,
            max_new_tokens or cfg.max_new_tokens,
            lookup_ids=lookup_ids,
        )
    if flags.SPEC_DECODE and 2 <= B <= 4 and (max_new_tokens or cfg.max_new_tokens) >= 2:
        # grouped speculation: B episodes x (8 // B) drafts share one
        # weight stream per verify pass; each episode's cache streams
        # once per pass (per-group shared block updates).  Measured
        # (docs/BENCH_NOTES.md): forced-accept 1.15 vs plain 4.16
        # ms/tok at B=2 (all-miss pass 4.64 — break-even ~12%
        # acceptance), 2.91 vs 5.60 at B=4 (all-miss 5.76, ~3%).
        return phi3.greedy_decode_spec_batched(
            params["phi3"],
            cfg.phi3,
            embeds,
            attn_valid,
            max_new_tokens or cfg.max_new_tokens,
            lookup_ids=lookup_ids,
        )
    return phi3.greedy_decode(
        params["phi3"],
        cfg.phi3,
        embeds,
        attn_valid,
        max_new_tokens or cfg.max_new_tokens,
    )


def init_llava_params(
    key: jax.Array, cfg: LLaVAConfig, clip_cfg: CLIPConfig, dtype=jnp.bfloat16
) -> Params:
    from dynam3d_tpu.ops.transformer import _init_dense

    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "clip": clip_mod.init_clip_params(k1, clip_cfg),
        "projector": {
            "fc1": _init_dense(k2, clip_cfg.vision_width, cfg.projector_hidden),
            "fc2": _init_dense(k3, cfg.projector_hidden, cfg.phi3.hidden_size),
        },
        "phi3": phi3.init_phi3_params(k4, cfg.phi3, dtype=dtype),
    }
