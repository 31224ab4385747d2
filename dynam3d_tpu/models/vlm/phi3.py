"""Phi-3-mini decoder in functional JAX with KV-cache prefill/decode.

The reference's action policy is HF ``LlavaForConditionalGeneration`` over
``xtuner/llava-phi-3-mini-hf`` (Policy_Dynam3D_VLN.py:113-131): a Phi-3-mini
language model consuming spliced multimodal embeddings, teacher-forced at
train time (":401") and greedy-decoded at eval (":463",
``max_new_tokens=20, do_sample=False``).

Architecture (HF Phi3ForCausalLM): RMSNorm, fused qkv_proj / gate_up_proj,
SiLU-gated MLP, full-head RoPE (theta 1e4), tied-nothing lm_head.

TPU design: static-shape prefill over bucketed prompt lengths; decode as a
``lax.fori_loop`` over ``max_new_tokens`` with a preallocated KV cache
``[L,B,T,heads,hd]`` — one compiled program per (bucket, batch) pair.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dynam3d_tpu import flags
from dynam3d_tpu.config import Phi3Config

Params = Dict[str, Any]


def rms_norm(w: jnp.ndarray, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding over the full head dim (HF Phi-3 convention:
    rotate_half pairs (i, i+hd/2))."""
    *_, T, H, hd = x.shape
    half = hd // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions[..., :, None].astype(jnp.float32) * freqs  # [...,T,half]
    cos = jnp.cos(ang)[..., :, None, :]
    sin = jnp.sin(ang)[..., :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L,B,T,H,hd]
    v: jnp.ndarray


def init_cache(cfg: Phi3Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _layer(
    p: Params,
    cfg: Phi3Config,
    x: jnp.ndarray,              # [B,T,D]
    positions: jnp.ndarray,      # [B,T]
    kv_k: jnp.ndarray,           # [B,Tc,H,hd] cache for this layer
    kv_v: jnp.ndarray,
    write_at: jnp.ndarray,       # scalar start index to write new kv
    attn_mask: jnp.ndarray,      # [B,T,Tc] True = attend
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    q, k, v = _qkv(p, cfg, x, positions)

    kv_k = jax.lax.dynamic_update_slice(kv_k, k, (0, write_at, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v, (0, write_at, 0, 0))

    x = _attn_mlp(p, cfg, x, q, kv_k, kv_v, attn_mask)
    return x, kv_k, kv_v


def _attn_mlp(
    p: Params,
    cfg: Phi3Config,
    x: jnp.ndarray,              # [B,T,D]
    q: jnp.ndarray,              # [B,T,H,hd] rope'd queries
    kv_k: jnp.ndarray,           # [B,Tc,Hkv,hd] updated layer cache
    kv_v: jnp.ndarray,
    attn_mask: jnp.ndarray,      # [B,T,Tc]
) -> jnp.ndarray:
    B, T, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    group = H // cfg.num_kv_heads
    kk = jnp.repeat(kv_k, group, axis=2) if group > 1 else kv_k
    vv = jnp.repeat(kv_v, group, axis=2) if group > 1 else kv_v
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, kk, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd)
    logits = jnp.where(attn_mask[:, None, :, :], logits, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, vv, preferred_element_type=jnp.float32)
    o = o.reshape(B, T, H * hd).astype(x.dtype)
    x = x + _mm(p["o"], o)

    h = rms_norm(p["post_ln"], x, cfg.rms_eps)
    x = x + _mlp(p, h)
    return x


def _mlp(p: Params, h: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU MLP; routes decode-regime int4 weights through the fused
    gate_up->silu*up->down Pallas kernel (one launch instead of two plus
    XLA glue between them).  The split ``wgate/wup`` layout (TP; see
    parallel.mesh.split_qkv_params) avoids the shard-crossing
    ``jnp.split`` of the fused matrix."""
    if "wgate" in p:
        gate = _mm(p["wgate"], h)
        up = _mm(p["wup"], h)
        return _mm(p["down"], jax.nn.silu(gate) * up)
    gu, dn = p["gate_up"], p["down"]
    rows = 1
    for s in h.shape[:-1]:
        rows *= s
    from dynam3d_tpu import flags

    if (
        isinstance(gu, dict) and "q4" in gu
        and isinstance(dn, dict) and "q4" in dn
        and rows <= 16
        and flags.INT4_FUSED_MLP
    ):
        from dynam3d_tpu.ops.pallas_int4 import int4_mlp

        return int4_mlp(h, gu["q4"], dn["q4"], out_dtype=h.dtype)
    gate_up = _mm(gu, h)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return _mm(dn, jax.nn.silu(gate) * up)


def _qkv(
    p: Params, cfg: Phi3Config, x: jnp.ndarray, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pre-attention projections + RoPE; split out so decode can write k/v
    into the STACKED cache before attention (in-place friendly).

    Two weight layouts: the HF fused ``qkv`` (default), or split
    ``wq/wk/wv`` (produced by ``parallel.mesh.split_qkv_params`` for TP —
    slicing a 'tp'-column-sharded fused matrix at the q/k/v boundaries
    crosses shard edges and makes XLA re-shard with collective-permutes;
    separate head-aligned matrices shard cleanly with zero extra comms)."""
    B, T, _ = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    h = rms_norm(p["input_ln"], x, cfg.rms_eps)
    if "wq" in p:
        q = _mm(p["wq"], h).reshape(B, T, H, hd)
        k = _mm(p["wk"], h).reshape(B, T, cfg.num_kv_heads, hd)
        v = _mm(p["wv"], h).reshape(B, T, cfg.num_kv_heads, hd)
    else:
        qkv = _mm(p["qkv"], h)
        q_sz = H * hd
        kv_sz = cfg.num_kv_heads * hd
        q = qkv[..., :q_sz].reshape(B, T, H, hd)
        k = qkv[..., q_sz : q_sz + kv_sz].reshape(B, T, cfg.num_kv_heads, hd)
        v = qkv[..., q_sz + kv_sz :].reshape(B, T, cfg.num_kv_heads, hd)
    return (
        _rope(q, positions, cfg.rope_theta),
        _rope(k, positions, cfg.rope_theta),
        v,
    )


def forward(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,          # [B,T,D] input embeddings (post-splice)
    positions: jnp.ndarray,       # [B,T] rope positions
    cache: KVCache,
    write_at,                     # int/scalar: cache slot of embeds[:,0]
    attn_mask: jnp.ndarray,       # [B,T,Tc]
    remat: bool = False,
    lm_at: Optional[jnp.ndarray] = None,  # [B] positions, or None for all
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the decoder stack; returns logits ``[B,T,V]`` and updated cache.

    ``remat=True`` rematerializes each layer on the backward pass — the
    reference's ``llava.gradient_checkpointing_enable()``
    (Policy_Dynam3D_VLN.py:129) — trading ~30% extra forward FLOPs for
    O(1-layer) activation memory in training.

    ``lm_at`` restricts the lm_head to one position per row (returns
    ``[B,1,V]``): generation only reads the last valid prompt position, so
    projecting all T positions onto the 32k vocab (~160 GFLOP + a ~100 MB
    f32 logits round-trip at T=816) is wasted prefill work."""
    x = embeds
    ks, vs = [], []
    layer_fn = jax.checkpoint(_layer, static_argnums=(1,)) if remat else _layer
    for li in range(cfg.num_layers):
        x, k_l, v_l = layer_fn(
            params["layers"][li], cfg, x, positions,
            cache.k[li], cache.v[li], write_at, attn_mask,
        )
        ks.append(k_l)
        vs.append(v_l)
    x = rms_norm(params["final_ln"], x, cfg.rms_eps)
    if lm_at is not None:
        B = x.shape[0]
        x = x[jnp.arange(B)[:, None], lm_at[:, None]]       # [B,1,D]
    return _lm_head(params, x), KVCache(jnp.stack(ks), jnp.stack(vs))


def _lm_head(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = params["lm_head"]
    if isinstance(w, dict) and "q" in w:
        return _mm(w, x, out_dtype=jnp.float32)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def decode_forward(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,          # [B,T,D] (T=1 in the decode loop)
    positions: jnp.ndarray,       # [B,T]
    cache: KVCache,
    write_at,
    attn_mask: jnp.ndarray,       # [B,T,Tc]
) -> Tuple[jnp.ndarray, KVCache]:
    """Decode-loop twin of :func:`forward` over the STACKED cache.

    k/v are written straight into the ``[L,B,Tc,H,hd]`` arrays with per-layer
    ``dynamic_update_slice`` — the loop-carried-buffer pattern XLA lowers to
    an in-place update.  The layer-list/stack form in :func:`forward` keeps a
    copy of every layer slice alive, which costs a full cache copy per decode
    step (~1.2 GB at Phi-3-mini dims with a 1.5k-token prompt); this form
    keeps the per-token HBM traffic at weights + one cache read.
    """
    x = embeds
    ck, cv = cache.k, cache.v
    for li in range(cfg.num_layers):
        p = params["layers"][li]
        q, k, v = _qkv(p, cfg, x, positions)
        ck = jax.lax.dynamic_update_slice(ck, k[None], (li, 0, write_at, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v[None], (li, 0, write_at, 0, 0))
        x = _attn_mlp(p, cfg, x, q, ck[li], cv[li], attn_mask)
    x = rms_norm(params["final_ln"], x, cfg.rms_eps)
    return _lm_head(params, x), KVCache(ck, cv)


def embed(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][ids]


def prefill_mask(attn_valid: jnp.ndarray, cache_len: int) -> jnp.ndarray:
    """Causal+padding mask for prefill: ``[B,T]`` valid -> ``[B,T,Tc]``."""
    B, T = attn_valid.shape
    causal = jnp.tril(jnp.ones((T, T), bool))
    m = causal[None] & attn_valid[:, None, :] & attn_valid[:, :, None]
    if cache_len > T:
        pad = jnp.zeros((B, T, cache_len - T), bool)
        m = jnp.concatenate([m, pad], axis=-1)
    return m


def _fused_decode_eligible(params: Params, cfg: Phi3Config, batch: int) -> bool:
    """The fused decode kernels apply to low-batch serving with fused int4
    qkv/o at unpadded dims and MHA (ops/pallas_decode.py docstring): B = 1
    on any fused path, B <= 8 on the ring kernel (rows ride the shared
    weight streams; per-row attention)."""
    from dynam3d_tpu.ops.pallas_decode import _BP

    max_b = _BP if flags.FUSED_DECODE_RING else 1
    if not (
        flags.FUSED_DECODE_ATTN
        and 1 <= batch <= max_b
        and jax.default_backend() == "tpu"
        and cfg.num_heads == cfg.num_kv_heads
        and cfg.num_heads * cfg.head_dim == cfg.hidden_size
    ):
        return False
    p0 = params["layers"][0]
    qkv, o = p0.get("qkv"), p0.get("o")
    D = cfg.hidden_size
    base = (
        isinstance(qkv, dict) and "q4" in qkv
        and isinstance(o, dict) and "q4" in o
        and qkv["q4"].d == D and qkv["q4"].n == 3 * D
        and qkv["q4"].n == 2 * qkv["q4"].n2            # no packing padding
        and o["q4"].d == D and o["q4"].n == D
        and o["q4"].n == 2 * o["q4"].n2
        and qkv["q4"].dblk == o["q4"].dblk
        and qkv["q4"].blocked == o["q4"].blocked
    )
    if base and batch > 1:
        # B > 1 runs only on the ring kernel, which additionally needs the
        # MLP weights packed compatibly and >= 3 gate_up column blocks
        return _ring_eligible(params, cfg)
    return base


def _ring_eligible(params: Params, cfg: Phi3Config) -> bool:
    if not (flags.FUSED_DECODE_RING and _fused_layer_eligible(params, cfg)):
        return False
    # the ring's static prime points: >= 3 gate_up and >= 2 qkv blocks
    qkv = params["layers"][0]["qkv"]["q4"]
    gu = params["layers"][0]["gate_up"]["q4"]
    return gu.n2 >= 3 * gu.nblk and qkv.n2 >= 2 * qkv.nblk


def _fused_layer_eligible(params: Params, cfg: Phi3Config) -> bool:
    """STRUCTURAL eligibility for the whole-layer ring kernel: the MLP
    weights must be packed int4 with the same block sizes as the attention
    ones.  Callers apply the flags."""
    p0 = params["layers"][0]
    qkv = p0["qkv"]["q4"]
    o = p0["o"]["q4"]
    gu, dn = p0.get("gate_up"), p0.get("down")
    D = cfg.hidden_size
    return (
        isinstance(gu, dict) and "q4" in gu
        and isinstance(dn, dict) and "q4" in dn
        and gu["q4"].d == D and gu["q4"].n == 2 * gu["q4"].n2
        and dn["q4"].n == D and dn["q4"].n == 2 * dn["q4"].n2
        and gu["q4"].n2 == dn["q4"].dp               # swiglu width == down rows
        and gu["q4"].dblk == qkv.dblk == dn["q4"].dblk
        and gu["q4"].blocked == qkv.blocked == dn["q4"].blocked
        and qkv.nblk == o.nblk == gu["q4"].nblk == dn["q4"].nblk
    )


def _decode_forward_fused(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,          # [B,1,D] (B > 1 only on the ring path)
    positions: jnp.ndarray,       # [B,1] rope positions
    cache: KVCache,               # flat [L,B,Tmax,D] layout
    write_at,
    valid: jnp.ndarray,           # [B,Tmax] attendable slots (incl. current)
) -> Tuple[jnp.ndarray, KVCache]:
    """Decode step over the fused decode kernels (ops/pallas_decode.py).

    Preferred: ONE whole-layer program per layer (``decode_layer_ring`` —
    one continuous HBM stream over qkv|KV|o|gate_up|down, B <= 8 batch
    rows sharing the weight streams).  Fallback split: the attention
    program (``decode_attn_layer``) + the fused int4 MLP kernel as a
    second program (B = 1 only)."""
    from dynam3d_tpu.ops.pallas_decode import (
        decode_attn_layer, decode_layer_ring,
    )

    B = embeds.shape[0]
    D = cfg.hidden_size
    half = cfg.head_dim // 2
    freqs = cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions[:, 0, None].astype(jnp.float32) * freqs   # [B, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # the kernel folds the current token in from registers; exclude its slot
    mask_rows = valid.at[:, write_at].set(False)              # [B, Tmax]

    from dynam3d_tpu.ops.pallas_int4 import int4_mlp_block

    use_ring = _ring_eligible(params, cfg)
    whole_layer = use_ring
    assert B == 1 or use_ring, "B > 1 fused decode requires the ring kernel"
    x = embeds
    ck, cv = cache.k, cache.v
    for li in range(cfg.num_layers):
        p = params["layers"][li]
        if use_ring:
            x, k_new, v_new = decode_layer_ring(
                x, p["input_ln"], p["qkv"]["q4"], p["o"]["q4"],
                p["post_ln"], p["gate_up"]["q4"], p["down"]["q4"],
                ck, cv, li, write_at, mask_rows, cos, sin,
                eps=cfg.rms_eps, heads=cfg.num_heads, hd=cfg.head_dim,
                ns=flags.FUSED_RING_SLOTS,
            )
        else:
            x, k_new, v_new = decode_attn_layer(
                x, p["input_ln"], p["qkv"]["q4"], p["o"]["q4"], ck, cv,
                li, write_at, mask_rows[0], cos[0], sin[0],
                eps=cfg.rms_eps, heads=cfg.num_heads, hd=cfg.head_dim,
            )
        ck = jax.lax.dynamic_update_slice(
            ck, k_new.reshape(1, B, 1, D), (li, 0, write_at, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v_new.reshape(1, B, 1, D), (li, 0, write_at, 0)
        )
        if not whole_layer:
            # MLP half + its norm and residual as the second (and last)
            # kernel of the layer
            x = int4_mlp_block(
                x, p["post_ln"], p["gate_up"]["q4"], p["down"]["q4"],
                cfg.rms_eps,
            )
    x = rms_norm(params["final_ln"], x, cfg.rms_eps)
    return _lm_head(params, x), KVCache(ck, cv)


def _verify_forward_fused(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,          # [1,k,D] draft token embeddings
    pos0,                         # int32: rope position of draft row 0
    cache: KVCache,               # flat [L,1,Tmax,D]
    wslot,                        # int32: cache slot of draft row 0
    valid: jnp.ndarray,           # [1,Tmax] ACCEPTED slots only
) -> Tuple[jnp.ndarray, KVCache]:
    """Speculative verify pass over the ring kernel's shared-cache mode:
    the k draft rows share ONE weight stream and ONE cache stream per
    layer (decode_layer_ring(shared_cache=True)); row r folds draft rows
    0..r from registers.  Returns logits ``[1,k,V]`` + the cache with the
    draft k/v written at ``wslot..wslot+k-1`` (the caller re-validates
    only the accepted prefix)."""
    from dynam3d_tpu.ops.pallas_decode import decode_layer_ring

    B, k, D = embeds.shape
    assert B == 1
    half = cfg.head_dim // 2
    freqs = cfg.rope_theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = (pos0 + jnp.arange(k))[:, None].astype(jnp.float32) * freqs
    cos, sin = jnp.cos(ang), jnp.sin(ang)                 # [k, half]
    x = embeds[0][:, None, :]                             # [k,1,D] kernel rows
    ck, cv = cache.k, cache.v
    for li in range(cfg.num_layers):
        p = params["layers"][li]
        x, k_new, v_new = decode_layer_ring(
            x, p["input_ln"], p["qkv"]["q4"], p["o"]["q4"],
            p["post_ln"], p["gate_up"]["q4"], p["down"]["q4"],
            ck, cv, li, wslot, valid, cos, sin,
            eps=cfg.rms_eps, heads=cfg.num_heads, hd=cfg.head_dim,
            ns=flags.FUSED_RING_SLOTS, shared_cache=True,
        )
        ck = jax.lax.dynamic_update_slice(
            ck, k_new.reshape(1, 1, k, D), (li, 0, wslot, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v_new.reshape(1, 1, k, D), (li, 0, wslot, 0)
        )
    x = rms_norm(params["final_ln"], x.reshape(1, k, D), cfg.rms_eps)
    return _lm_head(params, x), KVCache(ck, cv)


def _last_valid_idx(attn_valid: jnp.ndarray) -> jnp.ndarray:
    """PHYSICAL index of each row's last valid token.

    ``sum(valid) - 1`` is only the COUNT; the two differ whenever validity
    has interior holes — which is every llava prompt here, because the
    static instance/zone slots beyond the live count are attention-masked
    (models/policy.py sequence layout).  Reading prefill logits at the
    count instead of the physical index returned a mid-prompt position's
    logits as "the next-token logits" (caught by
    tests/test_closed_loop_golden.py lockstep vs the reference's exactly-
    sized dynamic prompt, Policy_Dynam3D_VLN.py:436-463)."""
    T = attn_valid.shape[1]
    return T - 1 - jnp.argmax(attn_valid[:, ::-1].astype(jnp.int32), axis=1)


def greedy_decode(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,           # [B,T] prompt embeddings (padded LEFT or RIGHT)
    attn_valid: jnp.ndarray,       # [B,T] bool
    max_new_tokens: int,
    stop_token: Optional[int] = None,
) -> jnp.ndarray:
    """Greedy generation (``llava.generate(max_new_tokens=20, do_sample=False)``,
    Policy_Dynam3D_VLN.py:463).  Right-padded prompts; each row starts decoding
    after its own last valid position.

    Returns generated ids ``[B, max_new_tokens]`` (stop token included,
    padded with ``pad_token_id`` after stop).
    """
    B, T, D = embeds.shape
    use_fused = _fused_decode_eligible(params, cfg, B)
    total = T + max_new_tokens
    if use_fused:
        # the fused kernel streams the cache in fixed 512-row blocks
        from dynam3d_tpu.ops import pallas_decode

        total = ((total + pallas_decode._ROWS - 1) // pallas_decode._ROWS
                 ) * pallas_decode._ROWS
    cache = init_cache(cfg, B, total, dtype=embeds.dtype)
    positions = jnp.cumsum(attn_valid.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    mask = prefill_mask(attn_valid, total)
    # last valid position per row; lm_head runs ONLY there (the only prefill
    # logits generation reads — saves the [T,V] projection + logits I/O)
    last = _last_valid_idx(attn_valid)
    logits, cache = forward(
        params, cfg, embeds, positions, cache, 0, mask, lm_at=last
    )
    next_tok = jnp.argmax(logits[:, 0], axis=-1)

    stop = cfg.end_token_id if stop_token is None else stop_token
    out0 = jnp.full((B, max_new_tokens), cfg.pad_token_id, jnp.int32)
    done0 = next_tok == stop

    if use_fused:
        # flatten to the kernel's [L,B,Tmax,D] row layout (a free reshape of
        # the contiguous [L,B,Tmax,H,hd] cache)
        L = cfg.num_layers
        cache = KVCache(
            cache.k.reshape(L, B, total, D), cache.v.reshape(L, B, total, D)
        )

    def body(i, carry):
        cache, tok, done, out, valid = carry
        # rows that stopped on an EARLIER iteration pad (not repeat stop) —
        # the docstring contract, and HF generate's batched behavior
        out = out.at[:, i].set(
            jnp.where(done, cfg.pad_token_id, tok.astype(jnp.int32))
        )
        e = embed(params, tok)[:, None, :].astype(embeds.dtype)
        pos = (jnp.sum(valid, axis=1) - 1)[:, None]
        if use_fused:
            logits, cache = _decode_forward_fused(
                params, cfg, e, pos, cache, T + i, valid
            )
        else:
            m = valid[:, None, :]
            logits, cache = decode_forward(
                params, cfg, e, pos, cache, T + i, m
            )
        nxt = jnp.argmax(logits[:, 0], axis=-1)
        done = done | (tok == stop)
        nxt = jnp.where(done, stop, nxt)
        # open the cache slot for the next token (clamped no-op on last step)
        valid = valid.at[:, T + i + 1].set(True)
        return cache, nxt, done, out, valid

    # extend validity over generated slots (plus any fused-path cache
    # round-up slots, which stay invalid forever)
    valid0 = jnp.concatenate(
        [attn_valid, jnp.zeros((B, total - T), bool)], axis=1
    )
    valid0 = valid0.at[:, T].set(True)

    # early-exit while loop: once every row has emitted the stop token,
    # remaining iterations are skipped — most actions ("stop.", short turns)
    # need far fewer than max_new_tokens passes over the weights
    def cond(carry):
        i, _, tok, done, _, _ = carry
        return (i < max_new_tokens) & ~jnp.all(done | (tok == stop))

    def wbody(carry):
        i, cache, tok, done, out, valid = carry
        cache, tok, done, out, valid = body(i, (cache, tok, done, out, valid))
        return i + 1, cache, tok, done, out, valid

    carry = (0, cache, next_tok, done0, out0, valid0)
    carry = jax.lax.while_loop(cond, wbody, carry)
    # write the final pending token if the loop exited with room left
    # (skipping rows that already emitted their stop on an earlier step)
    i, _, tok, done, out, _ = carry
    out = jnp.where(
        (i < max_new_tokens)[..., None]
        & (jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) == i)
        & ~done[:, None],
        tok[:, None].astype(jnp.int32),
        out,
    )
    return out


def _ngram_draft(
    hist: jnp.ndarray,   # [Lh] int32 token history; entries < 0 never match
    n_hist,              # int32 scalar: live entries (hist[n_hist-1] is last)
    prev3_tok,           # int32 scalar; < 0 -> no 4-gram tier
    prev2_tok,           # int32 scalar; < 0 -> no trigram tier
    prev_tok,            # int32 scalar; < 0 -> unigram match on last_tok only
    last_tok,            # int32 scalar
    k: int,
) -> jnp.ndarray:
    """Prompt-lookup draft: the ``k-1`` tokens that followed the most
    recent EARLIER occurrence of the current n-gram in ``hist`` —
    longest-match cascade 4-gram ``(prev3, prev2, prev, last)`` -> trigram
    ``(prev2, prev, last)`` -> bigram ``(prev, last)`` -> unigram ``last``
    (a longer key is a more precise continuation predictor — the 4-gram
    tier matters for short-token streams where 2-3 tokens of context are
    ambiguous, e.g. char-level repeats of "steps,"); all ``-1``
    (never-accepted sentinels) when no occurrence exists."""
    Lh = hist.shape[0]
    idx = jnp.arange(Lh - 1)
    a0, a1 = hist[:-1], hist[1:]
    before_tail = idx + 1 < n_hist - 1   # exclude the terminal occurrence
    live = (a1 >= 0) & before_tail
    am1 = jnp.concatenate([jnp.full((1,), -9, hist.dtype), hist[:-2]])
    am2 = jnp.concatenate([jnp.full((2,), -9, hist.dtype), hist[:-3]])
    quad = (
        (am2 == prev3_tok) & (am1 == prev2_tok) & (a0 == prev_tok)
        & (a1 == last_tok) & (am2 >= 0) & (am1 >= 0) & (a0 >= 0) & live
        & (prev3_tok >= 0) & (prev2_tok >= 0) & (prev_tok >= 0)
    )
    tri = (
        (am1 == prev2_tok) & (a0 == prev_tok) & (a1 == last_tok)
        & (am1 >= 0) & (a0 >= 0) & live & (prev2_tok >= 0) & (prev_tok >= 0)
    )
    bi = (a0 == prev_tok) & (a1 == last_tok) & (a0 >= 0) & live & (prev_tok >= 0)
    uni = (a1 == last_tok) & live
    m = jnp.where(
        jnp.any(quad), quad,
        jnp.where(jnp.any(tri), tri, jnp.where(jnp.any(bi), bi, uni)),
    )
    found = jnp.any(m)
    p = jnp.max(jnp.where(m, idx, -1))
    start = jnp.clip(p + 2, 0, Lh - (k - 1))
    cont = jax.lax.dynamic_slice(hist, (start,), (k - 1,))
    return jnp.where(found, cont, -1)


def greedy_decode_spec(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,           # [1,T,D] prompt embeddings
    attn_valid: jnp.ndarray,       # [1,T] bool
    max_new_tokens: int,
    stop_token: Optional[int] = None,
    lookup_ids: Optional[jnp.ndarray] = None,   # [S] or [1,S]; -1 = skip
    draft_len: Optional[int] = None,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Speculative greedy decode with n-gram prompt-lookup drafts.

    Decode at Phi-3-mini int4 is HBM-bound — the ~1.9 GB weight stream IS
    the per-token cost — so verifying ``k`` draft tokens in one forward
    pass costs roughly ONE token's weight stream (the extra rows ride the
    sublane-padded matvecs for free).  Drafts come from the most recent
    earlier occurrence of the current bigram in (prompt text ids +
    generated ids): the reference's action strings ("turn left 30 degree
    and go forward 0.5 meter...", Policy_Dynam3D_VLN.py:472-506) repeat
    the instruction/history vocabulary heavily, which is exactly the
    regime where prompt-lookup drafting hits.

    GREEDY-EXACT by construction: every emitted token is
    ``argmax(logits | accepted prefix)`` — token j of a pass is accepted
    only when the pass's own argmax at the previous position equals the
    draft, so the emitted stream is identical to :func:`greedy_decode`
    token-for-token (same forward path); rejected draft rows' cache
    slots stay invalid and are rewritten by the next pass.

    Matches the reference eval call ``llava.generate(max_new_tokens=20,
    do_sample=False)`` (Policy_Dynam3D_VLN.py:463) — same contract as
    :func:`greedy_decode`, returns ``[1, max_new_tokens]`` ids.
    """
    from dynam3d_tpu import flags as _flags

    B, T, D = embeds.shape
    assert B == 1, "speculative decode is a B=1 serving path"
    k = int(draft_len or _flags.SPEC_DRAFT_LEN)
    k = max(2, min(k, max_new_tokens, 8))
    use_fused = _fused_decode_eligible(params, cfg, 1) and _ring_eligible(
        params, cfg
    )
    total = T + max_new_tokens + k
    if use_fused:
        from dynam3d_tpu.ops import pallas_decode

        total = ((total + pallas_decode._ROWS - 1) // pallas_decode._ROWS
                 ) * pallas_decode._ROWS
    cache = init_cache(cfg, B, total, dtype=embeds.dtype)
    positions = jnp.maximum(jnp.cumsum(attn_valid.astype(jnp.int32), 1) - 1, 0)
    mask = prefill_mask(attn_valid, total)
    last_idx = _last_valid_idx(attn_valid)
    logits, cache = forward(
        params, cfg, embeds, positions, cache, 0, mask, lm_at=last_idx
    )
    next_tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)   # [1]
    stop = cfg.end_token_id if stop_token is None else stop_token
    if use_fused:
        # flat [L,1,Tmax,D] row layout for the ring kernel's cache streams
        L = cfg.num_layers
        cache = KVCache(
            cache.k.reshape(L, B, total, D), cache.v.reshape(L, B, total, D)
        )

    S = 0 if lookup_ids is None else int(math.prod(lookup_ids.shape))
    Lh = S + max_new_tokens + k + 2
    hist0 = jnp.full((Lh,), -1, jnp.int32)
    if lookup_ids is not None:
        hist0 = hist0.at[:S].set(lookup_ids.reshape(-1).astype(jnp.int32))
    hist0 = hist0.at[S].set(next_tok[0])

    n_pos0 = jnp.sum(attn_valid.astype(jnp.int32), axis=1)[0]
    out0 = jnp.full((B, max_new_tokens), cfg.pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(next_tok)
    done0 = next_tok[0] == stop
    valid0 = jnp.concatenate(
        [attn_valid, jnp.zeros((B, total - T), bool)], axis=1
    )
    t_iota = jnp.arange(total)
    j_out = jnp.arange(max_new_tokens)
    j_hist = jnp.arange(Lh)
    kk = jnp.arange(k)

    def cond(c):
        return (c[0] < max_new_tokens) & ~c[6]

    def body(c):
        n_em, ckv, valid, out, hist, last, done, prev, prev2, npass = c
        # prev3 read from hist (not carried): at n_em < 4 this lands in the
        # lookup tail — the prompt's true last text token (or a -1 pad when
        # prev_gen priming pads the tail), both safe n-gram context
        b3 = S + n_em - 4
        prev3 = jnp.where(b3 >= 0, hist[jnp.maximum(b3, 0)], -1)
        drf = _ngram_draft(hist, S + n_em, prev3, prev2, prev, last, k)
        d = jnp.concatenate([last[None], drf])                    # [k]
        pos0 = n_pos0 + n_em - 1
        wslot = T + n_em - 1

        def verify_branch(args):
            ckv, valid = args
            e = embed(params, jnp.clip(d, 0))[None].astype(embeds.dtype)
            if use_fused:
                lg, c2 = _verify_forward_fused(
                    params, cfg, e, pos0, KVCache(*ckv), wslot, valid
                )
            else:
                pos = (pos0 + kk)[None]                           # [1,k]
                # row j additionally attends in-flight draft slots 0..j
                row_extra = (t_iota[None, :] >= wslot) & (
                    t_iota[None, :] <= wslot + kk[:, None]
                )
                m = valid[:, None, :] | row_extra[None]
                lg, c2 = decode_forward(
                    params, cfg, e, pos, KVCache(*ckv), wslot, m
                )
            return jnp.argmax(lg[0], -1).astype(jnp.int32), (c2.k, c2.v)

        def plain_branch(args):
            # no draft found: a verify pass could accept at most 1 token
            # anyway, so run a plain 1-token step — the all-miss regime
            # then costs the SAME as non-speculative decode
            ckv, valid = args
            e1 = embed(params, jnp.clip(d[:1], 0))[None].astype(embeds.dtype)
            if use_fused:
                lg, c2 = _decode_forward_fused(
                    params, cfg, e1, pos0.reshape(1, 1), KVCache(*ckv),
                    wslot, valid,
                )
            else:
                m1 = (valid | (t_iota == wslot)[None])[:, None, :]
                lg, c2 = decode_forward(
                    params, cfg, e1, pos0.reshape(1, 1), KVCache(*ckv),
                    wslot, m1,
                )
            a0 = jnp.argmax(lg[0], -1).astype(jnp.int32)          # [1]
            a = jnp.concatenate(
                [a0, jnp.full((k - 1,), -2, jnp.int32)]           # -2: never
            )
            return a, (c2.k, c2.v)

        found = jnp.any(drf >= 0) | jnp.bool_(_flags.SPEC_FORCE_ACCEPT)
        a, ckv2 = jax.lax.cond(
            found, verify_branch, plain_branch, (ckv, valid)
        )
        if _flags.SPEC_FORCE_ACCEPT:   # timing-only mode; see flags.py
            match = jnp.ones((k - 1,), jnp.int32)
        else:
            match = (d[1:] == a[:-1]).astype(jnp.int32)
        acc = 1 + jnp.sum(jnp.cumprod(match))
        stop_pos = jnp.min(jnp.where((a == stop) & (kk < acc), kk, k))
        acc = jnp.minimum(jnp.minimum(acc, stop_pos + 1),
                          max_new_tokens - n_em)
        out = jnp.where(
            ((j_out >= n_em) & (j_out < n_em + acc))[None, :],
            a[jnp.clip(j_out - n_em, 0, k - 1)][None, :], out,
        )
        hist = jnp.where(
            (j_hist >= S + n_em) & (j_hist < S + n_em + acc),
            a[jnp.clip(j_hist - (S + n_em), 0, k - 1)], hist,
        )
        valid = valid | ((t_iota >= wslot) & (t_iota < wslot + acc))[None]
        new_last = a[acc - 1]
        new_prev = jnp.where(acc >= 2, a[acc - 2], last)
        new_prev2 = jnp.where(
            acc >= 3, a[jnp.maximum(acc - 3, 0)],
            jnp.where(acc == 2, last, prev),
        )
        done = done | (stop_pos < acc)
        return (n_em + acc, ckv2, valid, out, hist,
                new_last, done, new_prev, new_prev2, npass + 1)

    carry = (jnp.int32(1), (cache.k, cache.v), valid0, out0, hist0,
             next_tok[0], done0, jnp.int32(-1), jnp.int32(-1), jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry)
    if return_stats:
        return carry[3], {"tokens": carry[0], "passes": carry[9]}
    return carry[3]


def _verify_forward_grouped(
    params: Params,
    cfg: Phi3Config,
    e: jnp.ndarray,               # [B,g,D] per-episode draft embeddings
    pos0: jnp.ndarray,            # [B] rope position of each row's draft 0
    cache: KVCache,
    wslot: jnp.ndarray,           # [B] cache slot of each row's draft 0
    valid: jnp.ndarray,           # [B,Tmax] accepted slots per episode
    use_fused: bool,
) -> Tuple[jnp.ndarray, KVCache]:
    """Grouped verify pass: B episodes x g draft tokens through ONE weight
    stream (decode_layer_ring(group_size=g)), or the XLA twin with
    vmapped per-episode cache writes.  Returns logits ``[B,g,V]``."""
    B, g, D = e.shape
    gg = jnp.arange(g)
    if use_fused:
        from dynam3d_tpu.ops.pallas_decode import decode_layer_ring

        half = cfg.head_dim // 2
        freqs = cfg.rope_theta ** (
            -jnp.arange(0, half, dtype=jnp.float32) / half
        )
        pos = (pos0[:, None] + gg[None]).reshape(-1)      # [B*g]
        ang = pos[:, None].astype(jnp.float32) * freqs
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        x = e.reshape(B * g, 1, D)
        mask_rows = jnp.repeat(valid, g, axis=0)          # [B*g, Tmax]
        posr = jnp.repeat(wslot, g)                       # [B*g] (nlive)
        ck, cv = cache.k, cache.v
        # per-episode write slots differ (each row's accepted count does),
        # so the cache write is a direct scatter into the carried cache —
        # NOT a per-layer ck[li] gather + vmapped update + write-back,
        # which would copy the whole [B,Tmax,D] layer slab (~24 MB/layer)
        # twice per layer and dominate the pass
        bidx = jnp.arange(B)[:, None]
        slots = wslot[:, None] + gg[None, :]              # [B,g]
        for li in range(cfg.num_layers):
            p = params["layers"][li]
            x, k_new, v_new = decode_layer_ring(
                x, p["input_ln"], p["qkv"]["q4"], p["o"]["q4"],
                p["post_ln"], p["gate_up"]["q4"], p["down"]["q4"],
                ck, cv, li, posr, mask_rows, cos, sin,
                eps=cfg.rms_eps, heads=cfg.num_heads, hd=cfg.head_dim,
                ns=flags.FUSED_RING_SLOTS, group_size=g,
            )
            kb = k_new.reshape(B, g, D)
            vb = v_new.reshape(B, g, D)
            ck = ck.at[li, bidx, slots, :].set(kb)
            cv = cv.at[li, bidx, slots, :].set(vb)
        x = rms_norm(params["final_ln"], x.reshape(B, g, D), cfg.rms_eps)
        return _lm_head(params, x), KVCache(ck, cv)

    total = valid.shape[1]
    t_iota = jnp.arange(total)
    pos = pos0[:, None] + gg[None]                        # [B,g]
    row_extra = (t_iota[None, None] >= wslot[:, None, None]) & (
        t_iota[None, None] <= (wslot[:, None, None] + gg[None, :, None])
    )
    m = valid[:, None, :] | row_extra
    x = e
    ck, cv = cache.k, cache.v
    bidx = jnp.arange(B)[:, None]
    slots = wslot[:, None] + gg[None, :]                  # [B,g]
    for li in range(cfg.num_layers):
        p = params["layers"][li]
        q, k, v = _qkv(p, cfg, x, pos)
        ck = ck.at[li, bidx, slots].set(k)
        cv = cv.at[li, bidx, slots].set(v)
        x = _attn_mlp(p, cfg, x, q, ck[li], cv[li], m)
    x = rms_norm(params["final_ln"], x, cfg.rms_eps)
    return _lm_head(params, x), KVCache(ck, cv)


def greedy_decode_spec_batched(
    params: Params,
    cfg: Phi3Config,
    embeds: jnp.ndarray,           # [B,T,D] prompt embeddings (B episodes)
    attn_valid: jnp.ndarray,       # [B,T]
    max_new_tokens: int,
    stop_token: Optional[int] = None,
    lookup_ids: Optional[jnp.ndarray] = None,   # [B,S]; -1 = never match
    draft_len: Optional[int] = None,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Batched speculative greedy decode: B episodes each draft ``g``
    tokens per pass (``B*g <= 8`` kernel rows), so one weight stream
    verifies up to ``g`` tokens for EVERY episode.  Per-episode greedy
    exactness and stop semantics match :func:`greedy_decode` row-wise;
    episodes accept independently and finished rows coast (their passes
    emit nothing).  The reference serves multi-env batches the same
    "one generate per step over B rows" way (ss_trainer_Dynam3D.py:140-159).
    """
    from dynam3d_tpu.ops.pallas_decode import _BP

    B, T, D = embeds.shape
    assert B >= 2, "use greedy_decode_spec at B == 1"
    g = int(draft_len or min(_BP // B, flags.SPEC_DRAFT_LEN))
    g = max(2, min(g, max_new_tokens, _BP // B))
    use_fused = _fused_decode_eligible(params, cfg, B * g) and _ring_eligible(
        params, cfg
    )
    total = T + max_new_tokens + g
    if use_fused:
        from dynam3d_tpu.ops import pallas_decode

        total = ((total + pallas_decode._ROWS - 1) // pallas_decode._ROWS
                 ) * pallas_decode._ROWS
    cache = init_cache(cfg, B, total, dtype=embeds.dtype)
    positions = jnp.maximum(jnp.cumsum(attn_valid.astype(jnp.int32), 1) - 1, 0)
    mask = prefill_mask(attn_valid, total)
    last_idx = _last_valid_idx(attn_valid)
    logits, cache = forward(
        params, cfg, embeds, positions, cache, 0, mask, lm_at=last_idx
    )
    next_tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)   # [B]
    stop = cfg.end_token_id if stop_token is None else stop_token
    if use_fused:
        L = cfg.num_layers
        cache = KVCache(
            cache.k.reshape(L, B, total, D), cache.v.reshape(L, B, total, D)
        )

    S = 0 if lookup_ids is None else int(lookup_ids.shape[-1])
    Lh = S + max_new_tokens + g + 2
    hist0 = jnp.full((B, Lh), -1, jnp.int32)
    if lookup_ids is not None:
        hist0 = hist0.at[:, :S].set(lookup_ids.astype(jnp.int32))
    hist0 = hist0.at[:, S].set(next_tok)

    n_pos0 = jnp.sum(attn_valid.astype(jnp.int32), axis=1)          # [B]
    out0 = jnp.full((B, max_new_tokens), cfg.pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(next_tok)
    done0 = next_tok == stop
    valid0 = jnp.concatenate(
        [attn_valid, jnp.zeros((B, total - T), bool)], axis=1
    )
    t_iota = jnp.arange(total)
    j_out = jnp.arange(max_new_tokens)
    j_hist = jnp.arange(Lh)
    gg = jnp.arange(g)
    bidx = jnp.arange(B)
    neg1 = jnp.full((B,), -1, jnp.int32)

    def cond(c):
        n_em, done = c[0], c[6]
        return jnp.any(~done & (n_em < max_new_tokens))

    def body(c):
        n_em, ckv, valid, out, hist, last, done, prev, prev2, npass = c
        b3 = S + n_em - 4                                         # [B]
        prev3 = jnp.where(
            b3 >= 0, hist[bidx, jnp.maximum(b3, 0)], -1
        )
        drf = jax.vmap(
            lambda h, n, p3, p2, p1, l: _ngram_draft(h, n, p3, p2, p1, l, g)
        )(hist, S + n_em, prev3, prev2, prev, last)               # [B,g-1]
        d = jnp.concatenate([last[:, None], drf], axis=1)         # [B,g]
        e = embed(params, jnp.clip(d, 0)).astype(embeds.dtype)
        pos0 = n_pos0 + n_em - 1
        wslot = T + n_em - 1
        logits2, cache2 = _verify_forward_grouped(
            params, cfg, e, pos0, KVCache(*ckv), wslot, valid, use_fused
        )
        a = jnp.argmax(logits2, axis=-1).astype(jnp.int32)        # [B,g]
        if flags.SPEC_FORCE_ACCEPT:   # timing-only mode; see flags.py
            match = jnp.ones((B, g - 1), jnp.int32)
        else:
            match = (d[:, 1:] == a[:, :-1]).astype(jnp.int32)
        acc = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)     # [B]
        stop_pos = jnp.min(
            jnp.where((a == stop) & (gg[None] < acc[:, None]), gg[None], g),
            axis=1,
        )
        acc = jnp.minimum(jnp.minimum(acc, stop_pos + 1),
                          max_new_tokens - n_em)
        acc = jnp.where(done, 0, acc)
        emit = (j_out[None] >= n_em[:, None]) & (
            j_out[None] < (n_em + acc)[:, None]
        )
        take = jnp.clip(j_out[None] - n_em[:, None], 0, g - 1)
        out = jnp.where(emit, jnp.take_along_axis(a, take, axis=1), out)
        emh = (j_hist[None] >= (S + n_em)[:, None]) & (
            j_hist[None] < (S + n_em + acc)[:, None]
        )
        takeh = jnp.clip(j_hist[None] - (S + n_em)[:, None], 0, g - 1)
        hist = jnp.where(emh, jnp.take_along_axis(a, takeh, axis=1), hist)
        valid = valid | (
            (t_iota[None] >= wslot[:, None])
            & (t_iota[None] < (wslot + acc)[:, None])
        )
        a_at = lambda off: a[bidx, jnp.clip(acc - off, 0, g - 1)]
        new_last = jnp.where(acc > 0, a_at(1), last)
        new_prev = jnp.where(
            acc >= 2, a_at(2), jnp.where(acc == 1, last, prev)
        )
        new_prev2 = jnp.where(
            acc >= 3, a_at(3),
            jnp.where(acc == 2, last, jnp.where(acc == 1, prev, prev2)),
        )
        done = done | (stop_pos < acc)
        return (n_em + acc, (cache2.k, cache2.v), valid, out, hist,
                new_last, done, new_prev, new_prev2, npass + 1)

    carry = (jnp.ones((B,), jnp.int32), (cache.k, cache.v), valid0, out0,
             hist0, next_tok, done0, neg1, neg1, jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry)
    if return_stats:
        return carry[3], {"tokens": carry[0], "passes": carry[9]}
    return carry[3]


def _dense_init(key, d_in, d_out, std=0.02):
    return jax.random.normal(key, (d_in, d_out), jnp.float32) * std


def init_phi3_params(key: jax.Array, cfg: Phi3Config, dtype=jnp.bfloat16) -> Params:
    D = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 3)
    q_sz = cfg.num_heads * cfg.head_dim
    kv_sz = cfg.num_kv_heads * cfg.head_dim

    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "input_ln": jnp.ones((D,), jnp.float32),
            "qkv": _dense_init(k1, D, q_sz + 2 * kv_sz).astype(dtype),
            "o": _dense_init(k2, q_sz, D).astype(dtype),
            "post_ln": jnp.ones((D,), jnp.float32),
            "gate_up": _dense_init(k3, D, 2 * cfg.intermediate_size).astype(dtype),
            "down": _dense_init(k4, cfg.intermediate_size, D).astype(dtype),
        }

    return {
        "embed_tokens": _dense_init(keys[0], cfg.vocab_size, D).astype(dtype),
        "layers": [layer(k) for k in keys[1 : cfg.num_layers + 1]],
        "final_ln": jnp.ones((D,), jnp.float32),
        "lm_head": _dense_init(keys[-1], D, cfg.vocab_size).astype(dtype),
    }


# ---------------------------------------------------------------------------
# Weight-only quantization (decode is HBM-bound on weight reads; int8 halves
# the bytes/token vs bf16, int4 halves them again).  int8 uses per-output-
# channel symmetric scales with the dequantize folded into the matmul by XLA.
# int4 (``bits=4``) additionally packs two nibbles per int8 byte and decodes
# through the Pallas unpack-in-VMEM matvec (ops/pallas_int4.py); the int8
# copy is kept alongside for the prefill (many-row) regime where the matmul
# is MXU-bound and XLA's fused int8->bf16 convert is already optimal.
# ---------------------------------------------------------------------------
def quantize_phi3(params: Params, bits: int = 8, consume: bool = False) -> Params:
    """bf16/f32 Phi-3 params -> int8 (+ optionally packed int4) weights.

    Norm weights and embeddings stay un-quantized (embeddings are gathered,
    not streamed; norms are tiny).

    ``consume=True`` drops each source weight as soon as its quantized form
    exists (the input dict is emptied): at Phi-3-mini dims, bf16 source
    (7.4 GB) + int8 (3.7 GB) + int4 pack (1.9 GB) held simultaneously
    exceeds the v5e's 16 GB HBM.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def q(w):
        wf = w.astype(jnp.float32)
        scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        out = {
            "q": jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8),
            "s": scale.astype(jnp.float32),
        }
        if bits == 4:
            from dynam3d_tpu.ops.pallas_int4 import pack_int4

            # per-shape column-block size, from the on-chip sweep
            # (docs/BENCH_NOTES.md): tall-skinny weights (down: Dp 8192,
            # few column blocks) and narrow ones (o-proj) pipeline better
            # with 1024-wide blocks; wide mats (gate_up/qkv/lm_head) peak
            # at 512.
            from dynam3d_tpu import flags

            # per-shape nblk looked better in isolated matvec microbenches
            # (o/down prefer 1024-wide blocks) but measures WORSE inside the
            # real 32-layer decode loop (5.23 vs 4.86 ms/token interleaved
            # A/B) — uniform 512 stays the default; opt in to re-test.
            d_w, n_w = wf.shape
            nblk = 512
            if flags.INT4_PER_SHAPE_NBLK:
                nblk = 1024 if (d_w >= 4096 or n_w <= 4096) else 512
            out["q4"] = pack_int4(
                wf, nblk=nblk, blocked=flags.INT4_BLOCK_MAJOR
            )
        return out

    def q_weight(lp, name):
        out = q(lp[name])
        if consume:
            del lp[name]
        return out

    layers = []
    for lp in params["layers"]:
        layers.append(
            {
                "input_ln": lp["input_ln"],
                "qkv": q_weight(lp, "qkv"),
                "o": q_weight(lp, "o"),
                "post_ln": lp["post_ln"],
                "gate_up": q_weight(lp, "gate_up"),
                "down": q_weight(lp, "down"),
            }
        )
    return {
        "embed_tokens": params["embed_tokens"],
        "layers": layers,
        "final_ln": params["final_ln"],
        "lm_head": q_weight(params, "lm_head"),
    }


def _mm(w, x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """Matmul against a dense weight, an int8 ``{q, s}`` pack, or (when a
    packed ``q4`` rides alongside and the row count is in the matvec regime)
    the int4 Pallas path.  Decode runs one token per pass, so its matmuls are
    row-count <= batch and HBM-bound — exactly where int4 pays; prefill rows
    (B*bucket) stay on the int8/XLA path.

    With ``flags.W8A8_PREFILL`` the prefill regime (rows > 16) also
    quantizes the ACTIVATIONS per token (dynamic max-abs) and runs the dot
    on the MXU's int8 path — measured 1.9x the bf16 matmul rate at prefill
    shapes (208-219 TF/s vs ~113, tools/bench_int8_prefill.py) at ~0.9%
    median relative error on top of the weight quantization."""
    out_dtype = out_dtype or x.dtype
    if isinstance(w, dict) and "q" in w:
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if "q4" in w and rows <= 16:
            from dynam3d_tpu.ops.pallas_int4 import int4_matmul

            return int4_matmul(x, w["q4"], out_dtype=out_dtype)
        if flags.W8A8_PREFILL and rows > 16:
            xf = x.astype(jnp.float32)
            am = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            am = jnp.maximum(am, 1e-8)
            aq = jnp.clip(jnp.round(xf / am), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                aq, w["q"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * am * w["s"]).astype(out_dtype)
        y = jnp.dot(
            x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        return (y * w["s"]).astype(out_dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(out_dtype)
