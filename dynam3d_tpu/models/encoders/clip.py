"""CLIP ViT-L/14@336px in functional JAX — vision + text towers.

Port of the reference's vendored, modified OpenAI CLIP
(vlnce_baselines/models/encoders/clip/model.py):

  - ``VisionTransformer.forward`` returns BOTH the projected CLS feature and
    ALL projected patch tokens (the reference's modification at
    clip/model.py:219-238) — the 24x24x768 patch grid is what feeds the 3D
    memory;
  - ``encode_text`` returns the projected EOT feature (":340-354");
  - ``encode_all_text`` returns per-token projected features zeroed after the
    EOT position, plus the EOT feature (":356-370");
  - pre-norm residual blocks with QuickGELU (x * sigmoid(1.702x));
  - the same tower doubles as the LLaVA-Phi-3 vision tower via
    ``hidden_layer`` (HF ``vision_feature_layer=-2`` semantics: hidden states
    entering the last block, CLS dropped by the caller).

Weights are converted 1:1 from torch checkpoints (runtime/checkpoint.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import CLIPConfig
from dynam3d_tpu.ops.transformer import _init_dense, _init_ln, layer_norm

Params = Dict[str, Any]

# OpenAI CLIP normalization constants (resnet_encoders.py:272)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


from dynam3d_tpu.ops.transformer import weight_like as _w  # noqa: E402


def _attn(p: Params, x: jnp.ndarray, heads: int, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    T, D = x.shape[-2], x.shape[-1]
    hd = D // heads
    qkv = jnp.dot(
        x, _w(x, p["qkv"]["w"]), preferred_element_type=jnp.float32
    ) + p["qkv"]["b"]
    q, k, v = jnp.split(qkv.astype(x.dtype), 3, axis=-1)
    q = q.reshape(*q.shape[:-1], heads, hd)
    k = k.reshape(*k.shape[:-1], heads, hd)
    v = v.reshape(*v.shape[:-1], heads, hd)
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd)
    if mask is not None:
        logits = logits + mask
    a = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("...hqk,...khd->...qhd", a, v, preferred_element_type=jnp.float32)
    o = o.reshape(*o.shape[:-2], D).astype(x.dtype)
    return (
        jnp.dot(o, _w(x, p["out"]["w"]), preferred_element_type=jnp.float32)
        + p["out"]["b"]
    ).astype(x.dtype)


def _block(p: Params, x: jnp.ndarray, heads: int, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Pre-norm ResidualAttentionBlock (clip/model.py:162-177)."""
    x = x + _attn(p["attn"], layer_norm(p["ln1"], x), heads, mask)
    h = layer_norm(p["ln2"], x)
    h = jnp.dot(
        h, _w(h, p["fc1"]["w"]), preferred_element_type=jnp.float32
    ) + p["fc1"]["b"]
    h = _quick_gelu(h.astype(x.dtype))
    h = jnp.dot(
        h, _w(h, p["fc2"]["w"]), preferred_element_type=jnp.float32
    ) + p["fc2"]["b"]
    return x + h.astype(x.dtype)


def _tower(p: Params, x: jnp.ndarray, heads: int, mask: Optional[jnp.ndarray],
           stop_layer: Optional[int] = None) -> jnp.ndarray:
    n = len(p["blocks"])
    stop = n if stop_layer is None else stop_layer
    for i, bp in enumerate(p["blocks"]):
        if i >= stop:
            break
        x = _block(bp, x, heads, mask)
    return x


def preprocess_rgb(rgb: jnp.ndarray, size: int = 336) -> jnp.ndarray:
    """uint8 ``[B,H,W,3]`` -> normalized ``[B,size,size,3]`` float.

    Matches CLIPEncoder's Resize(bicubic) + ConvertImageDtype + Normalize
    (resnet_encoders.py:268-272).
    """
    x = rgb.astype(jnp.float32) / 255.0
    if rgb.shape[1] != size or rgb.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, 3), method="cubic")
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    pixels: jnp.ndarray,
    hidden_layer: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vision tower.

    Args:
      pixels: normalized ``[B,H,W,3]`` (see :func:`preprocess_rgb`).
      hidden_layer: if given (e.g. ``-1`` == skip the last block, HF
        ``vision_feature_layer=-2``), return the raw hidden states
        ``[B, 1+G*G, width]`` after that many blocks — no ln_post/projection.

    Returns:
      ``(cls [B,embed_dim], patches [B,G*G,embed_dim])`` — both projected, the
      reference's modified forward (clip/model.py:219-238) — or hidden states
      when ``hidden_layer`` is set.
    """
    v = params["visual"]
    B = pixels.shape[0]
    g = cfg.grid
    # conv1: patchify = reshape + matmul (stride==kernel, no bias)
    ps = cfg.patch_size
    x = pixels.reshape(B, g, ps, g, ps, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, ps * ps * 3)
    x = jnp.dot(
        x, _w(x, v["conv1_w"]), preferred_element_type=jnp.float32
    ).astype(pixels.dtype)
    cls = jnp.broadcast_to(v["class_embedding"], (B, 1, cfg.vision_width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(x.dtype)
    x = layer_norm(v["ln_pre"], x)
    if hidden_layer is not None:
        stop = len(v["transformer"]["blocks"]) + hidden_layer + 1
        return _tower(v["transformer"], x, cfg.vision_heads, None, stop_layer=stop)
    x = _tower(v["transformer"], x, cfg.vision_heads, None)
    patches = layer_norm(v["ln_post"], x[:, 1:, :])
    cls_out = layer_norm(v["ln_post"], x[:, 0, :])
    proj = _w(x, v["proj"])
    return (
        jnp.dot(cls_out, proj, preferred_element_type=jnp.float32).astype(x.dtype),
        jnp.dot(patches, proj, preferred_element_type=jnp.float32).astype(x.dtype),
    )


def _text_hidden(params: Params, cfg: CLIPConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    t = params["text"]
    x = t["token_embedding"][tokens]
    x = x + t["positional_embedding"]
    # causal mask (clip/model.py:300-306)
    T = cfg.text_context
    causal = jnp.where(
        jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
    )
    x = _tower(t["transformer"], x, cfg.text_heads, causal)
    return layer_norm(t["ln_final"], x)


def encode_text(params: Params, cfg: CLIPConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Projected EOT feature ``[B,embed_dim]`` (EOT = argmax token id)."""
    x = _text_hidden(params, cfg, tokens)
    eot = jnp.argmax(tokens, axis=-1)
    feats = x[jnp.arange(x.shape[0]), eot]
    return jnp.dot(feats, params["text"]["projection"], preferred_element_type=jnp.float32)


def encode_all_text(
    params: Params, cfg: CLIPConfig, tokens: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token projected features (zeroed after EOT) + EOT feature.

    Port of ``encode_all_text`` (clip/model.py:356-370).
    """
    x = _text_hidden(params, cfg, tokens)
    x = jnp.dot(x, params["text"]["projection"], preferred_element_type=jnp.float32)
    eot = jnp.argmax(tokens, axis=-1)
    sep = x[jnp.arange(x.shape[0]), eot]
    keep = jnp.arange(cfg.text_context)[None, :] <= eot[:, None]
    return x * keep[..., None], sep


def _init_block(key, d: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "attn": {"qkv": _init_dense(k1, d, 3 * d), "out": _init_dense(k2, d, d)},
        "ln1": _init_ln(d),
        "ln2": _init_ln(d),
        "fc1": _init_dense(k3, d, 4 * d),
        "fc2": _init_dense(k4, 4 * d, d),
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    kv, kt, kc, kp, kq, ke = jax.random.split(key, 6)
    vw, tw = cfg.vision_width, cfg.text_width
    scale = vw ** -0.5
    return {
        "visual": {
            "conv1_w": jax.random.normal(kc, (cfg.patch_size ** 2 * 3, vw), jnp.float32) * scale,
            "class_embedding": scale * jax.random.normal(kv, (vw,), jnp.float32),
            "positional_embedding": scale * jax.random.normal(kp, (cfg.grid ** 2 + 1, vw), jnp.float32),
            "ln_pre": _init_ln(vw),
            "transformer": {
                "blocks": [
                    _init_block(k, vw)
                    for k in jax.random.split(kv, cfg.vision_layers)
                ]
            },
            "ln_post": _init_ln(vw),
            "proj": scale * jax.random.normal(kq, (vw, cfg.embed_dim), jnp.float32),
        },
        "text": {
            "token_embedding": 0.02 * jax.random.normal(ke, (cfg.vocab_size, tw), jnp.float32),
            "positional_embedding": 0.01 * jax.random.normal(kp, (cfg.text_context, tw), jnp.float32),
            "transformer": {
                "blocks": [
                    _init_block(k, tw) for k in jax.random.split(kt, cfg.text_layers)
                ]
            },
            "ln_final": _init_ln(tw),
            "projection": tw ** -0.5 * jax.random.normal(kq, (tw, cfg.embed_dim), jnp.float32),
        },
    }
