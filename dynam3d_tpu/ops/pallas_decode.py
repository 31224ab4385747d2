"""Fused decode-layer attention kernel: rmsnorm + int4 qkv + RoPE + cached
attention + int4 o-projection in ONE Pallas program.

Why: the int4 decode path runs ~3 pallas_calls per layer plus XLA glue
(f32 [2,B,N/2] matvec outputs, concat, rope, masked softmax) between them —
~2 ms/token of integration overhead over the weight-byte bound
(docs/BENCH_NOTES.md round 2).  This kernel collapses the attention half of
a layer (qkv matvec -> rope -> streamed KV attention -> o matvec ->
residual) into one program with manually double-buffered HBM DMA, so the
only HBM traffic is the packed weights once and the live KV rows once.

Shape/layout decisions (B=1 serving, Phi-3-mini dims D=3072, H=Hkv=32,
hd=96):

- The KV cache stays in its natural ``[L, B, T, H*hd]`` row layout.  At
  B=1 the attention FLOPs are trivial, so logits/context are computed with
  VPU elementwise products plus ONE constant "segment matrix"
  ``seg [D, H]`` (block-diagonal ones) on the MXU:
  ``logits = (k_block * q) @ seg`` performs the per-head sum over the
  lane dimension without any transpose or [T,H,hd] relayout, and
  ``probs_lanes = probs @ seg.T`` broadcasts per-head probabilities back
  to lanes for the V reduction.  (A head-major cache layout + batched
  dot_general was the rejected alternative: it forces in-kernel
  transposes and a prefill-side relayout.)
- Weights stream HBM->VMEM in ``[D, nblk]`` int8 column blocks with a
  2-slot double buffer; each block is unpacked chunk-by-chunk (int32
  shifts) and hits the MXU as two ``[8, dblk] @ [dblk, nblk]`` matmuls
  (lo/hi nibble halves), exactly the ops/pallas_int4.py scheme.
- Softmax is the online (flash) form over KV row blocks: running max,
  denominator, and a lane-layout f32 accumulator rescaled per block.
- The current token's k/v never round-trips through HBM: its logit and V
  contribution are folded into the online softmax from registers, and the
  kernel RETURNS k_new/v_new for the caller's in-place
  ``dynamic_update_slice`` cache write (XLA already does that without a
  copy; aliasing the whole stacked cache through the kernel would not
  save anything and complicates donation).

The reference runs this as HF ``model.generate`` fp16 attention layers
(Policy_Dynam3D_VLN.py:463); quantized fused decode replaces that path.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynam3d_tpu.ops.pallas_int4 import Int4Weight, nibble_matvec_acc

_NEG = -1e30
_ROWS = 512          # KV rows per streamed block
_BP = 8              # sublane-padded batch for the matvecs (row 0 is real)


def _matvec_acc(h_ref, q4_vmem, sl_ref, sh_ref, y_ref, *, jb, dblk, nblk, n2):
    """Accumulate one column block of the packed matvec into ``y_ref``.

    ``q4_vmem`` holds the current ``[D, nblk]`` int8 block; lo nibbles are
    columns ``jb*nblk..+nblk`` of the first half, hi nibbles the same range
    of the second half (ops/pallas_int4.py layout).  The scale refs are
    full-width here (the DMA streams only the weight block), hence the
    ``col_start`` slice."""
    acc_lo, acc_hi = nibble_matvec_acc(
        h_ref, q4_vmem, sl_ref, sh_ref,
        dblk=dblk, g=h_ref.shape[1] // dblk, col_start=jb * nblk,
    )
    y_ref[:, pl.ds(jb * nblk, nblk)] = acc_lo
    y_ref[:, pl.ds(n2 + jb * nblk, nblk)] = acc_hi


def _streamed_matvec(h_ref, q4_hbm, sl_ref, sh_ref, y_ref, wbuf, wsem,
                     *, dblk, nblk, blocked):
    """y[_BP, N] = h @ unpack(q4) with a 2-slot double-buffered DMA.

    ``blocked`` weights ([nb, D, nblk] block-major) stream each block as one
    contiguous chunk; flat ([D, Np/2]) blocks are nblk-byte-per-row strided."""
    if blocked:
        nb = q4_hbm.shape[0]
        n2 = nb * nblk
    else:
        n2 = q4_hbm.shape[1]
        nb = n2 // nblk

    def dma(slot, jb):
        src = q4_hbm.at[jb] if blocked else q4_hbm.at[:, pl.ds(jb * nblk, nblk)]
        return pltpu.make_async_copy(src, wbuf.at[slot], wsem.at[slot])

    dma(0, 0).start()

    def body(jb, _):
        slot = jax.lax.rem(jb, 2)

        @pl.when(jb + 1 < nb)
        def _():
            dma(jax.lax.rem(jb + 1, 2), jb + 1).start()

        dma(slot, jb).wait()
        _matvec_acc(h_ref, wbuf.at[slot], sl_ref, sh_ref, y_ref,
                    jb=jb, dblk=dblk, nblk=nblk, n2=n2)
        return 0

    jax.lax.fori_loop(0, nb, body, 0, unroll=False)


def _rope_flat(flat, cosv, slo, shi, half):
    """RoPE on a ``[1, heads*hd]`` lane-layout vector without any reshape
    (Mosaic rejects the ``[1, D] -> [H, hd]`` lane shape cast).

    HF rotate-half pairs lane ``l`` (head offset ``i = l % hd``) with lane
    ``l + half`` (``i < half``) or ``l - half``: two whole-vector lane
    rotations fetch both partners, and the precomputed masked sin vectors
    (``slo`` nonzero only on ``i < half`` lanes, ``shi`` on the rest — so
    cross-head wraparound lanes are zeroed) select the right one:
    ``out = x*cos + roll(x, -half)*slo + roll(x, +half)*shi``."""
    d = flat.shape[-1]
    f = flat.astype(jnp.float32)
    swap_lo = pltpu.roll(f, shift=d - half, axis=1)   # out[l] = f[l + half]
    swap_hi = pltpu.roll(f, shift=half, axis=1)       # out[l] = f[l - half]
    return (f * cosv + swap_lo * slo + swap_hi * shi).astype(jnp.bfloat16)


def _decode_attn_kernel(
    # scalar prefetch
    li_ref, pos_ref,
    # array inputs
    x_ref,            # [_BP, D] bf16 (row 0 real): residual input
    lnw_ref,          # [1, D] f32 input_ln weight
    qkv_q4, qkv_sl, qkv_sh,   # packed qkv (q4 in HBM/ANY)
    o_q4, o_sl, o_sh,         # packed o
    kc_ref, vc_ref,   # [L, 1, Tmax, D] bf16 cache (ANY; read-only here)
    mask_ref,         # [Tmax, 1] f32: 1 = attend (current slot excluded)
    cosv_ref, slo_ref, shi_ref,  # [1, D] f32 per-lane rope vectors
    seg_ref,          # [D, H] bf16 block-diagonal head-segment matrix
    segt_ref,         # [H, D] bf16 transpose
    # outputs
    out_ref,          # [1, D] bf16: x + o_proj(attn)
    knew_ref,         # [1, D] bf16 (rope'd) — caller writes into the cache
    vnew_ref,         # [1, D] bf16
    # scratch
    hbuf_ref,         # [_BP, D] bf16: matvec input staging
    y_ref,            # [_BP, Nqkv] f32
    yo_ref,           # [_BP, D] f32
    wbuf, wsem,       # [2, D, nblk] int8 + DMA sems (weight double buffer)
    kbuf, vbuf, ksem, vsem,   # [2, _ROWS, D] bf16 + sems (KV double buffer)
    *,
    eps: float, heads: int, hd: int, dblk: int, nblk: int, tmax: int,
    blocked: bool,
):
    D = x_ref.shape[1]
    half = hd // 2
    li = li_ref[0]
    pos = pos_ref[0]

    # ---- rmsnorm (f32) ----
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    # padding rows are zero -> var 0 -> rsqrt fine with eps
    hbuf_ref[:] = (xf * jax.lax.rsqrt(var + eps) * lnw_ref[:]).astype(
        jnp.bfloat16
    )

    # ---- qkv matvec ----
    _streamed_matvec(hbuf_ref, qkv_q4, qkv_sl, qkv_sh, y_ref, wbuf, wsem,
                     dblk=dblk, nblk=nblk, blocked=blocked)

    cosv, slo, shi = cosv_ref[:], slo_ref[:], shi_ref[:]
    q = _rope_flat(y_ref[0:1, 0:D], cosv, slo, shi, half)
    k_new = _rope_flat(y_ref[0:1, D : 2 * D], cosv, slo, shi, half)
    v_new = y_ref[0:1, 2 * D : 3 * D].astype(jnp.bfloat16)
    knew_ref[:] = k_new
    vnew_ref[:] = v_new

    scale = 1.0 / math.sqrt(hd)
    seg = seg_ref[:]
    segt = segt_ref[:]

    # ---- streamed online-softmax attention over the cache ----
    nb = tmax // _ROWS

    def kv_dma(slot, tb):
        k = pltpu.make_async_copy(
            kc_ref.at[li, 0, pl.ds(tb * _ROWS, _ROWS), :],
            kbuf.at[slot], ksem.at[slot],
        )
        v = pltpu.make_async_copy(
            vc_ref.at[li, 0, pl.ds(tb * _ROWS, _ROWS), :],
            vbuf.at[slot], vsem.at[slot],
        )
        return k, v

    def kv_start(slot, tb):
        k, v = kv_dma(slot, tb)
        k.start()
        v.start()

    def kv_wait(slot, tb):
        k, v = kv_dma(slot, tb)
        k.wait()
        v.wait()

    # number of live blocks: rows strictly below the current slot
    nlive = jax.lax.div(pos + _ROWS - 1, _ROWS)

    @pl.when(nlive > 0)
    def _():
        kv_start(0, 0)

    def attn_block(tb, carry):
        m, l, acc = carry
        slot = jax.lax.rem(tb, 2)

        @pl.when(tb + 1 < nlive)
        def _():
            kv_start(jax.lax.rem(tb + 1, 2), tb + 1)

        kv_wait(slot, tb)
        kb = kbuf[slot]                                   # [_ROWS, D] bf16
        vb = vbuf[slot]
        prod = (kb * q).astype(jnp.bfloat16)
        logits = (
            jnp.dot(prod, seg, preferred_element_type=jnp.float32) * scale
        )                                                 # [_ROWS, H]
        mb = mask_ref[pl.ds(tb * _ROWS, _ROWS), :]        # [_ROWS, 1]
        logits = logits + (mb - 1.0) * (-_NEG)
        m_blk = jnp.max(logits, axis=0, keepdims=True)    # [1, H]
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)                        # [1, H]
        p = jnp.exp(logits - m_new)                       # [_ROWS, H]
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        p_lanes = jnp.dot(
            p.astype(jnp.bfloat16), segt, preferred_element_type=jnp.float32
        )                                                 # [_ROWS, D]
        contrib = jnp.sum(
            p_lanes * vb.astype(jnp.float32), axis=0, keepdims=True
        )
        alpha_lanes = jnp.dot(
            alpha.astype(jnp.bfloat16), segt,
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha_lanes + contrib

    m0 = jnp.full((1, heads), _NEG, jnp.float32)
    l0 = jnp.zeros((1, heads), jnp.float32)
    acc0 = jnp.zeros((1, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nlive, attn_block, (m0, l0, acc0))

    # ---- fold in the current token (never round-trips through HBM) ----
    cur = (
        jnp.dot(
            (k_new * q).astype(jnp.bfloat16), seg,
            preferred_element_type=jnp.float32,
        )
        * scale
    )                                                     # [1, H]
    m_new = jnp.maximum(m, cur)
    alpha = jnp.exp(m - m_new)
    p_cur = jnp.exp(cur - m_new)                          # [1, H]
    l = l * alpha + p_cur
    alpha_lanes = jnp.dot(
        alpha.astype(jnp.bfloat16), segt, preferred_element_type=jnp.float32
    )
    p_lanes = jnp.dot(
        p_cur.astype(jnp.bfloat16), segt, preferred_element_type=jnp.float32
    )
    acc = acc * alpha_lanes + p_lanes * v_new.astype(jnp.float32)

    l_lanes = jnp.dot(
        l.astype(jnp.float32), segt.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ctx = (acc / jnp.maximum(l_lanes, 1e-30)).astype(jnp.bfloat16)  # [1, D]

    # ---- o matvec + residual ----
    hbuf_ref[:] = jnp.zeros((_BP, D), jnp.bfloat16)
    hbuf_ref[0:1, :] = ctx
    _streamed_matvec(hbuf_ref, o_q4, o_sl, o_sh, yo_ref, wbuf, wsem,
                     dblk=dblk, nblk=nblk, blocked=blocked)
    out_ref[:] = (
        x_ref[0:1, :].astype(jnp.float32) + yo_ref[0:1, :]
    ).astype(jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("eps", "heads", "hd", "interpret")
)
def decode_attn_layer(
    x: jnp.ndarray,          # [1, 1, D] bf16 (B=T=1)
    ln_w: jnp.ndarray,       # [D] f32
    qkv: Int4Weight,         # D -> 3D
    o: Int4Weight,           # D -> D
    cache_k: jnp.ndarray,    # [L, 1, Tmax, D] bf16
    cache_v: jnp.ndarray,
    li,                      # int32 scalar: layer index
    pos,                     # int32 scalar: current write slot
    mask: jnp.ndarray,       # [Tmax] bool/float: attend (excl. current)
    cos: jnp.ndarray,        # [hd//2] f32 rope cos at this position
    sin: jnp.ndarray,
    *,
    eps: float,
    heads: int,
    hd: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(x_out [1,1,D], k_new [1,D], v_new [1,D])``.

    ``x_out = x + o_proj(attention)`` — the caller applies the MLP half and
    writes ``k_new/v_new`` into the cache at ``pos``.
    """
    D = x.shape[-1]
    tmax = cache_k.shape[2]
    assert tmax % _ROWS == 0, f"cache length {tmax} % {_ROWS} != 0"
    assert qkv.n == 3 * D and qkv.d == D and o.d == D and o.n == D
    assert qkv.blocked == o.blocked
    nblk = min(qkv.nblk, o.nblk)
    dblk = qkv.dblk
    assert o.dblk == dblk

    xp = jnp.pad(x.reshape(1, D).astype(jnp.bfloat16), ((0, _BP - 1), (0, 0)))
    seg = np.zeros((D, heads), np.float32)
    for hh in range(heads):
        seg[hh * hd : (hh + 1) * hd, hh] = 1.0
    seg = jnp.asarray(seg, jnp.bfloat16)

    # per-lane rope vectors (the kernel applies rope without reshapes:
    # see _rope_flat) — lane l has head offset i = l % hd, angle index
    # i % (hd//2); slo/shi mask the two rotate-half partners
    half = hd // 2
    i_lane = np.arange(D) % hd
    idx = jnp.asarray(i_lane % half)
    lo_mask = jnp.asarray(i_lane < half)
    cosv = cos.astype(jnp.float32)[idx].reshape(1, D)
    sin_l = sin.astype(jnp.float32)[idx]
    slo = jnp.where(lo_mask, -sin_l, 0.0).reshape(1, D)
    shi = jnp.where(lo_mask, 0.0, sin_l).reshape(1, D)

    kernel = functools.partial(
        _decode_attn_kernel,
        eps=eps, heads=heads, hd=hd, dblk=dblk, nblk=nblk, tmax=tmax,
        blocked=qkv.blocked,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln_w
            pl.BlockSpec(memory_space=pl.ANY),    # qkv q4 (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv s_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv s_hi
            pl.BlockSpec(memory_space=pl.ANY),    # o q4 (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o s_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o s_hi
            pl.BlockSpec(memory_space=pl.ANY),    # cache k (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # cache v (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cosv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # slo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # shi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # seg
            pl.BlockSpec(memory_space=pltpu.VMEM),   # segt
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BP, D), jnp.bfloat16),           # hbuf
            pltpu.VMEM((_BP, 3 * D), jnp.float32),        # y_qkv
            pltpu.VMEM((_BP, D), jnp.float32),            # y_o
            pltpu.VMEM((2, D, nblk), jnp.int8),           # weight dbuf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, _ROWS, D), jnp.bfloat16),      # K dbuf
            pltpu.VMEM((2, _ROWS, D), jnp.bfloat16),      # V dbuf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        jnp.asarray(li, jnp.int32).reshape(1),
        jnp.asarray(pos, jnp.int32).reshape(1),
        xp,
        ln_w.reshape(1, D).astype(jnp.float32),
        qkv.q4, qkv.s_lo, qkv.s_hi,
        o.q4, o.s_lo, o.s_hi,
        cache_k, cache_v,
        mask.reshape(tmax, 1).astype(jnp.float32),
        cosv, slo, shi,
        seg,
        seg.T,
    )
    return out.reshape(1, 1, D), k_new, v_new
