"""Functional transformer blocks (PyTorch ``nn.TransformerEncoder`` semantics).

The reference aggregates patch->instance and instance->zone with 2-layer
post-norm ``nn.TransformerEncoder`` stacks (feature_fields.py:134-155).  This
module provides the same computation as pure functions over parameter pytrees
so the blocks jit/vmap/scan cleanly and weights can be ported 1:1 from torch
checkpoints (``in_proj_weight``/``out_proj`` layouts preserved in the
converter, see runtime/checkpoint.py).

All matmuls request float32 accumulation; inputs may be bf16.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def weight_like(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Follow the activation dtype: a mixed bf16 x f32 dot promotes to f32
    and misses the MXU's fast path; casting the weight keeps the matmul
    bf16 with f32 accumulation.  The ONE place the mixed-dtype rule lives
    (shared by _dense, the CLIP tower, and the LLaVA projector)."""
    if x.dtype == jnp.bfloat16 and w.dtype == jnp.float32:
        return w.astype(jnp.bfloat16)
    return w


def _dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, weight_like(x, p["w"]), preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def _init_dense(key, d_in: int, d_out: int, std: Optional[float] = None) -> Params:
    std = std if std is not None else (1.0 / math.sqrt(d_in))
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((d_out,), jnp.float32)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _init_ln(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def mha(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head self-attention matching ``nn.MultiheadAttention``.

    Args:
      x: ``[..., T, D]``.
      key_padding_mask: ``[..., T]`` bool, True = attendable (NOTE: inverted
        vs. PyTorch, where True means "ignore").
      attn_mask: ``[..., T, T]`` bool, True = query row i may attend key j.
        Used for block-diagonal segment aggregation (one fused attention over
        all segments instead of one call per FastSAM mask).
    """
    T, D = x.shape[-2], x.shape[-1]
    hd = D // num_heads
    qkv = _dense(p["qkv"], x)  # [...,T,3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(*t.shape[:-1], num_heads, hd)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[..., None, None, :], logits, neg)
    if attn_mask is not None:
        logits = jnp.where(attn_mask[..., None, :, :], logits, neg)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", attn, v, preferred_element_type=jnp.float32)
    out = out.reshape(*out.shape[:-2], D).astype(x.dtype)
    return _dense(p["out"], out)


def encoder_layer(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    activation: str = "gelu",
    attn_mask: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-5,
) -> jnp.ndarray:
    """Post-norm (``norm_first=False``) ``nn.TransformerEncoderLayer``."""
    a = mha(p["attn"], x, num_heads, key_padding_mask, attn_mask)
    x = layer_norm(p["ln1"], x + a, eps=ln_eps)
    # exact (erf) GELU — PyTorch nn.GELU / TransformerEncoderLayer default
    act = (lambda t: jax.nn.gelu(t, approximate=False)) if activation == "gelu" else jax.nn.relu
    h = _dense(p["ff2"], act(_dense(p["ff1"], x)))
    return layer_norm(p["ln2"], x + h, eps=ln_eps)


def encoder_stack(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """N post-norm layers + final LayerNorm (eps 1e-12, as BertLayerNorm).

    Matches ``nn.TransformerEncoder(enc_layer, num_layers=N,
    norm=BertLayerNorm(width, eps=1e-12))`` (feature_fields.py:146,155).
    """
    for lp in p["layers"]:
        x = encoder_layer(lp, x, num_heads, key_padding_mask, attn_mask=attn_mask)
    return layer_norm(p["final_ln"], x, eps=1e-12)


def init_encoder_layer(key, d: int, d_ff: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "attn": {"qkv": _init_dense(k1, d, 3 * d), "out": _init_dense(k2, d, d)},
        "ln1": _init_ln(d),
        "ff1": _init_dense(k3, d, d_ff),
        "ff2": _init_dense(k4, d_ff, d),
        "ln2": _init_ln(d),
    }


def init_encoder_stack(key, d: int, d_ff: int, n_layers: int) -> Params:
    keys = jax.random.split(key, n_layers)
    return {
        "layers": [init_encoder_layer(k, d, d_ff) for k in keys],
        "final_ln": _init_ln(d),
    }


def mlp2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """``Linear -> LayerNorm -> GELU -> Linear`` (the reference's embedding MLPs,
    e.g. patch_to_instance_position_embedding, feature_fields.py:139-143)."""
    h = _dense(p["fc1"], x)
    h = layer_norm(p["ln"], h)
    h = jax.nn.gelu(h, approximate=False)
    return _dense(p["fc2"], h)


def init_mlp2(key, d_in: int, d_hidden: int, d_out: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _init_dense(k1, d_in, d_hidden),
        "ln": _init_ln(d_hidden),
        "fc2": _init_dense(k2, d_hidden, d_out),
    }
