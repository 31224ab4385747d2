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


def _attn_block_update(q, kb, vb, mb, m, l, acc, seg, segt, scale):
    """One online-softmax update over a ``[_ROWS, D]`` KV block — the ONE
    attention body every decode kernel shares (attn / layer / ring).

    ``logits = (kb*q) @ seg`` sums each head's lanes on the MXU without a
    relayout; the V reduction is the row-contracting dot
    ``C[h,l] = sum_t p[t,h] vb[t,l]`` plus a ``[H, D]`` mask-combine with
    ``segt``.  ``mb`` is the block's mask column (1 = attend).  Returns
    the updated ``(m, l, acc)`` carry."""
    prod = (kb * q).astype(jnp.bfloat16)
    logits = (
        jnp.dot(prod, seg, preferred_element_type=jnp.float32) * scale
    )                                                 # [_ROWS, H]
    logits = logits + (mb - 1.0) * (-_NEG)
    m_blk = jnp.max(logits, axis=0, keepdims=True)    # [1, H]
    m_new = jnp.maximum(m, m_blk)
    alpha = jnp.exp(m - m_new)                        # [1, H]
    p = jnp.exp(logits - m_new)                       # [_ROWS, H]
    l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
    C = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vb,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [H, D]
    contrib = jnp.sum(
        C * segt.astype(jnp.float32), axis=0, keepdims=True
    )
    alpha_lanes = jnp.dot(
        alpha.astype(jnp.bfloat16), segt,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc * alpha_lanes + contrib


def _attn_fold_one(q, k1, v1, m, l, acc, seg, segt, scale):
    """Fold ONE in-register token's k/v into a row's online softmax carry
    ``(m [1,H], l [1,H], acc [1,D])`` — no normalization."""
    cur = (
        jnp.dot(
            (k1 * q).astype(jnp.bfloat16), seg,
            preferred_element_type=jnp.float32,
        )
        * scale
    )                                                 # [1, H]
    m_new = jnp.maximum(m, cur)
    alpha = jnp.exp(m - m_new)
    p_cur = jnp.exp(cur - m_new)                      # [1, H]
    l = l * alpha + p_cur
    alpha_lanes = jnp.dot(
        alpha.astype(jnp.bfloat16), segt, preferred_element_type=jnp.float32
    )
    p_lanes = jnp.dot(
        p_cur.astype(jnp.bfloat16), segt, preferred_element_type=jnp.float32
    )
    acc = acc * alpha_lanes + p_lanes * v1.astype(jnp.float32)
    return m_new, l, acc


def _attn_normalize(l, acc, segt):
    """Divide the lane-layout accumulator by the per-head denominator."""
    l_lanes = jnp.dot(
        l.astype(jnp.float32), segt.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return (acc / jnp.maximum(l_lanes, 1e-30)).astype(jnp.bfloat16)


def _attn_fold_current(q, k_new, v_new, m, l, acc, seg, segt, scale):
    """Fold the current token's k/v into the online softmax from registers
    (it never round-trips through HBM) and normalize; returns the bf16
    ``[1, D]`` attention context.  Shared by all decode kernels."""
    m, l, acc = _attn_fold_one(q, k_new, v_new, m, l, acc, seg, segt, scale)
    return _attn_normalize(l, acc, segt)


def _attn_block_update_shared(
    q_seg, kb, vb, mb, m, l, abuf, segt, scale, rows, heads, row0=0
):
    """Online-softmax update over one ``[_ROWS, D]`` KV block for
    ``rows`` query rows AT ONCE (the speculative-verify path: every row
    attends the SAME cache, so re-streaming it per row would multiply the
    KV bytes by ``rows``).

    ``q_seg [D, rows*H]`` packs each row's per-head query into its own
    column group, so the block's logits for every (row, head) pair come
    out of ONE MXU dot ``kb @ q_seg``; ``m``/``l`` carry ``[1, rows*H]``
    and the f32 context accumulators live in the ``abuf [_BP, D]``
    scratch rows ``row0..row0+rows`` (combined per row with the ``segt``
    head mask).  ``row0 > 0`` is the grouped-verify case: the caller
    narrows ``q_seg`` to one group's columns so each group's cache stream
    only pays its OWN rows' MXU scoring, not the full batch's."""
    logits = (
        jnp.dot(kb, q_seg, preferred_element_type=jnp.float32) * scale
    )                                                 # [_ROWS, rows*H]
    logits = logits + (mb - 1.0) * (-_NEG)            # mb [_ROWS,1] broadcast
    m_blk = jnp.max(logits, axis=0, keepdims=True)
    m_new = jnp.maximum(m, m_blk)
    alpha = jnp.exp(m - m_new)                        # [1, rows*H]
    p = jnp.exp(logits - m_new)
    l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
    C = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vb,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [rows*H, D]
    segtf = segt.astype(jnp.float32)
    for r in range(rows):
        contrib = jnp.sum(
            C[r * heads : (r + 1) * heads] * segtf, axis=0, keepdims=True
        )
        a_r = jnp.dot(
            alpha[:, r * heads : (r + 1) * heads].astype(jnp.bfloat16),
            segt, preferred_element_type=jnp.float32,
        )
        abuf[row0 + r : row0 + r + 1, :] = (
            abuf[row0 + r : row0 + r + 1, :] * a_r + contrib
        )
    return m_new, l_new


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
        slot = jax.lax.rem(tb, 2)

        @pl.when(tb + 1 < nlive)
        def _():
            kv_start(jax.lax.rem(tb + 1, 2), tb + 1)

        kv_wait(slot, tb)
        mb = mask_ref[pl.ds(tb * _ROWS, _ROWS), :]        # [_ROWS, 1]
        return _attn_block_update(
            q, kbuf[slot], vbuf[slot], mb, *carry, seg, segt, scale
        )

    m0 = jnp.full((1, heads), _NEG, jnp.float32)
    l0 = jnp.zeros((1, heads), jnp.float32)
    acc0 = jnp.zeros((1, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nlive, attn_block, (m0, l0, acc0))

    # ---- fold in the current token (never round-trips through HBM) ----
    ctx = _attn_fold_current(q, k_new, v_new, m, l, acc, seg, segt, scale)

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

# ---------------------------------------------------------------------------
# Manual-ring whole-layer kernel: deep DMA lookahead across phase boundaries
# ---------------------------------------------------------------------------

def _decode_ring_kernel(
    li_ref, pos_ref,
    x_ref, ln1_ref, ln2_ref,
    qkv_q4, qkv_sl, qkv_sh,      # q4 in HBM (ANY); scales full VMEM
    o_q4, o_sl, o_sh,
    gu_q4, gu_sl, gu_sh,
    dn_q4, dn_sl, dn_sh,
    kc_ref, vc_ref,
    mask_ref, cosv_ref, slo_ref, shi_ref, seg_ref, segt_ref,
    e_ref, stile_ref,            # shared-cache mode only ([1,1] dummies else)
    out_ref, knew_ref, vnew_ref,
    hbuf, ybuf, cbuf, o1buf, h2buf, ydbuf, abuf,
    wbuf, wsem,                  # [NS, D, nblk] int8 ring + sems (qkv|o|gu)
    dbuf, dsem,                  # [2, IP, nblk] int8 ring + sems (down)
    kbuf, vbuf, ksem, vsem,
    *,
    eps: float, heads: int, hd: int, dblk: int, nblk: int, tmax: int,
    n_qkv: int, n_o: int, n_gu: int, n_dn: int, ns: int, blocked: bool,
    rows: int, shared: bool, group_size: int,
):
    """One program per decode layer with a hand-scheduled DMA pipeline.

    A grid-pipelined whole-layer variant (deleted round 4; BENCH_NOTES
    round 3) measured neutral because the pipeline's one-block lookahead
    leaves the HBM bus idle through the ~25 us attention step.  Here the
    qkv, o-proj and gate_up column blocks
    (all ``[D, nblk]``) ride ONE ``ns``-slot ring in consumption order —
    issue runs ``ns`` blocks ahead of consume, so o/gate_up blocks queue
    up DURING the attention math — and the KV block DMAs are issued at
    fixed points near the tail of the qkv stream so the cache lands just
    as attention starts.  ``down``'s taller ``[IP, nblk]`` blocks use
    their own 2-slot ring, prefetched during the gate_up stream.

    ``rows`` (1..``_BP``) real batch rows ride the SAME weight streams for
    free — the matvecs already process ``_BP`` sublane-padded rows.  Each
    row attends over its own cache ``kc[li, b]`` with its own position /
    mask column / rope vectors; the per-row attention sections run
    sequentially, re-using the 2-slot KV buffers, while the weight ring
    keeps the bus busy underneath (multi-episode serving;
    the reference's 4-env batch, ss_trainer_Dynam3D.py:140-159)."""
    D = x_ref.shape[1]
    half = hd // 2
    li = li_ref[0]
    n_comb = n_qkv + n_o + n_gu     # combined D-row block sequence

    def d_copy(ii):
        """HBM source slices for combined block ``ii`` (one per stream)."""
        jo = ii - n_qkv
        jg = ii - n_qkv - n_o
        if blocked:
            srcs = [qkv_q4.at[jnp.clip(ii, 0, n_qkv - 1)],
                    o_q4.at[jnp.clip(jo, 0, n_o - 1)],
                    gu_q4.at[jnp.clip(jg, 0, n_gu - 1)]]
        else:
            srcs = [
                qkv_q4.at[:, pl.ds(jnp.clip(ii, 0, n_qkv - 1) * nblk, nblk)],
                o_q4.at[:, pl.ds(jnp.clip(jo, 0, n_o - 1) * nblk, nblk)],
                gu_q4.at[:, pl.ds(jnp.clip(jg, 0, n_gu - 1) * nblk, nblk)],
            ]
        return srcs

    def d_start(ii):
        @pl.when(ii < n_comb)
        def _():
            slot = jax.lax.rem(ii, ns)
            srcs = d_copy(ii)

            @pl.when(ii < n_qkv)
            def _():
                pltpu.make_async_copy(srcs[0], wbuf.at[slot],
                                      wsem.at[slot]).start()

            @pl.when((ii >= n_qkv) & (ii < n_qkv + n_o))
            def _():
                pltpu.make_async_copy(srcs[1], wbuf.at[slot],
                                      wsem.at[slot]).start()

            @pl.when(ii >= n_qkv + n_o)
            def _():
                pltpu.make_async_copy(srcs[2], wbuf.at[slot],
                                      wsem.at[slot]).start()

    def d_wait(ci):
        slot = jax.lax.rem(ci, ns)
        srcs = d_copy(ci)

        @pl.when(ci < n_qkv)
        def _():
            pltpu.make_async_copy(srcs[0], wbuf.at[slot],
                                  wsem.at[slot]).wait()

        @pl.when((ci >= n_qkv) & (ci < n_qkv + n_o))
        def _():
            pltpu.make_async_copy(srcs[1], wbuf.at[slot],
                                  wsem.at[slot]).wait()

        @pl.when(ci >= n_qkv + n_o)
        def _():
            pltpu.make_async_copy(srcs[2], wbuf.at[slot],
                                  wsem.at[slot]).wait()

    def kv_dma(b, slot, tb):
        k = pltpu.make_async_copy(
            kc_ref.at[li, b, pl.ds(tb * _ROWS, _ROWS), :],
            kbuf.at[slot], ksem.at[slot],
        )
        v = pltpu.make_async_copy(
            vc_ref.at[li, b, pl.ds(tb * _ROWS, _ROWS), :],
            vbuf.at[slot], vsem.at[slot],
        )
        return k, v

    def dn_dma(jd):
        """Down-block DMA; the slot is always ``jd % 2``."""
        if blocked:
            src = dn_q4.at[jnp.clip(jd, 0, n_dn - 1)]
        else:
            src = dn_q4.at[:, pl.ds(jnp.clip(jd, 0, n_dn - 1) * nblk, nblk)]
        return pltpu.make_async_copy(src, dbuf.at[jax.lax.rem(jd, 2)],
                                     dsem.at[jax.lax.rem(jd, 2)])

    def nlive_of(b):
        return jax.lax.div(pos_ref[b] + _ROWS - 1, _ROWS)

    nlive0 = nlive_of(0)
    nb_kv = tmax // _ROWS

    # ---- prime the ring ----
    for k in range(min(ns, n_comb)):
        d_start(k)

    # ---- rmsnorm + qkv stream ----
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    hbuf[:] = (xf * jax.lax.rsqrt(var + eps) * ln1_ref[:]).astype(
        jnp.bfloat16
    )
    n2_qkv = n_qkv * nblk

    def qkv_body(ci, _):
        d_wait(ci)
        # row 0's KV lands just as attention starts: k0/v0 two blocks from
        # the end of the qkv stream, k1/v1 one block from the end
        @pl.when((ci == n_qkv - 2) & (nlive0 > 0))
        def _():
            k, v = kv_dma(0, 0, 0)
            k.start(); v.start()
        if nb_kv > 1:
            @pl.when((ci == n_qkv - 1) & (nlive0 > 1))
            def _():
                k, v = kv_dma(0, 1, 1)
                k.start(); v.start()
        acc_lo, acc_hi = nibble_matvec_acc(
            hbuf, wbuf.at[jax.lax.rem(ci, ns)], qkv_sl, qkv_sh,
            dblk=dblk, g=qkv_sl.shape[0], col_start=ci * nblk,
        )
        ybuf[:, pl.ds(ci * nblk, nblk)] = acc_lo
        ybuf[:, pl.ds(n2_qkv + ci * nblk, nblk)] = acc_hi
        d_start(ci + ns)
        return 0

    jax.lax.fori_loop(0, n_qkv, qkv_body, 0, unroll=False)

    # ---- rope + attention (bus keeps streaming o/gu blocks meanwhile) ----
    # rope applies to ALL rows at once: the wrapper builds per-row cos/sin
    # lane vectors [_BP, D] from each row's position
    cosv, slo, shi = cosv_ref[:], slo_ref[:], shi_ref[:]
    q_all = _rope_flat(ybuf[:, 0:D], cosv, slo, shi, half)
    k_all = _rope_flat(ybuf[:, D : 2 * D], cosv, slo, shi, half)
    v_all = ybuf[:, 2 * D : 3 * D].astype(jnp.bfloat16)
    knew_ref[:] = k_all
    vnew_ref[:] = v_all

    scale = 1.0 / math.sqrt(hd)
    seg = seg_ref[:]
    segt = segt_ref[:]
    cbuf[:] = jnp.zeros((cbuf.shape[0], D), jnp.bfloat16)

    if shared:
        # speculative-verify attention: all rows are CONSECUTIVE draft
        # tokens of the SAME sequence — stream the (one) cache once with
        # the all-rows block update, then fold the in-register draft
        # k/v causally (row r attends drafts 0..r, itself included)
        # full _BP*H width even when rows < _BP: dead rows' q is zero and
        # their columns are never combined; slicing to rows*H would break
        # lane alignment at rows not a multiple of 4
        rh = _BP * heads
        q_seg = jax.lax.dot_general(
            q_all, e_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [D, _BP*H]
        q_seg = (q_seg * stile_ref[:]).astype(jnp.bfloat16)
        abuf[:] = jnp.zeros((abuf.shape[0], D), jnp.float32)
        nlive = nlive_of(0)

        def attn_block_sh(tb, carry):
            slot = jax.lax.rem(tb, 2)

            @pl.when((tb + 1 < nlive) & (tb + 1 >= 2))
            def _():
                k, v = kv_dma(0, jax.lax.rem(tb + 1, 2), tb + 1)
                k.start(); v.start()

            k, v = kv_dma(0, slot, tb)
            k.wait(); v.wait()
            mb = mask_ref[pl.ds(tb * _ROWS, _ROWS), 0:1]
            m, l = _attn_block_update_shared(
                q_seg, kbuf[slot], vbuf[slot], mb, *carry,
                abuf, segt, scale, rows, heads,
            )
            return m, l

        m0 = jnp.full((1, rh), _NEG, jnp.float32)
        l0 = jnp.zeros((1, rh), jnp.float32)
        m, l = jax.lax.fori_loop(0, nlive, attn_block_sh, (m0, l0))
        for r in range(rows):
            q_r = q_all[r : r + 1]
            m_r = m[:, r * heads : (r + 1) * heads]
            l_r = l[:, r * heads : (r + 1) * heads]
            acc_r = abuf[r : r + 1, :]
            for j in range(r + 1):
                m_r, l_r, acc_r = _attn_fold_one(
                    q_r, k_all[j : j + 1], v_all[j : j + 1],
                    m_r, l_r, acc_r, seg, segt, scale,
                )
            cbuf[r : r + 1, :] = _attn_normalize(l_r, acc_r, segt)

    if group_size and not shared:
        # GROUPED speculative verify (batched multi-episode speculation):
        # row b is draft token b % group_size of episode b // group_size.
        # Each group's episode cache streams ONCE — the all-rows block
        # update scores every row against it on the MXU, and only that
        # group's rows are harvested (with causal register folds over the
        # group's preceding draft k/v) before the m/l/abuf accumulators
        # are re-initialized for the next group's stream.  KV bytes are
        # therefore sum-of-episode-caches, the same as plain batched
        # decode — not group_size x that, as per-row streaming would be.
        # Each group's block update scores only its OWN group_size*H
        # query columns (q_seg sliced per group), so the MXU scoring work
        # totals one full-batch pass, not G x it.
        gh = group_size * heads
        q_seg = jax.lax.dot_general(
            q_all, e_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [D, _BP*H]
        q_seg = (q_seg * stile_ref[:]).astype(jnp.bfloat16)
        abuf[:] = jnp.zeros((abuf.shape[0], D), jnp.float32)
        for gi in range(rows // group_size):
            b0 = gi * group_size
            q_seg_g = q_seg[:, b0 * heads : (b0 + group_size) * heads]
            nlive = nlive_of(b0)
            if gi > 0:
                # group 0's first blocks were issued from the qkv
                # stream's tail; later groups prime their own here —
                # sequencing after the previous group's loop reuses the
                # same 2 slots safely
                @pl.when(nlive > 0)
                def _(gi=gi):
                    k, v = kv_dma(gi, 0, 0)
                    k.start(); v.start()
                if nb_kv > 1:
                    @pl.when(nlive > 1)
                    def _(gi=gi):
                        k, v = kv_dma(gi, 1, 1)
                        k.start(); v.start()

            def attn_block_g(tb, carry, gi=gi, b0=b0, q_seg_g=q_seg_g):
                slot = jax.lax.rem(tb, 2)
                nl = nlive_of(b0)

                @pl.when((tb + 1 < nl) & (tb + 1 >= 2))
                def _():
                    k, v = kv_dma(gi, jax.lax.rem(tb + 1, 2), tb + 1)
                    k.start(); v.start()

                k, v = kv_dma(gi, slot, tb)
                k.wait(); v.wait()
                mb = mask_ref[pl.ds(tb * _ROWS, _ROWS), b0 : b0 + 1]
                m, l = _attn_block_update_shared(
                    q_seg_g, kbuf[slot], vbuf[slot], mb, *carry,
                    abuf, segt, scale, group_size, heads, row0=b0,
                )
                return m, l

            m0 = jnp.full((1, gh), _NEG, jnp.float32)
            l0 = jnp.zeros((1, gh), jnp.float32)
            m, l = jax.lax.fori_loop(0, nlive, attn_block_g, (m0, l0))
            for j in range(group_size):
                r = b0 + j
                q_r = q_all[r : r + 1]
                m_r = m[:, j * heads : (j + 1) * heads]
                l_r = l[:, j * heads : (j + 1) * heads]
                acc_r = abuf[r : r + 1, :]
                for jj in range(b0, r):
                    m_r, l_r, acc_r = _attn_fold_one(
                        q_r, k_all[jj : jj + 1], v_all[jj : jj + 1],
                        m_r, l_r, acc_r, seg, segt, scale,
                    )
                cbuf[r : r + 1, :] = _attn_fold_current(
                    q_r, k_all[r : r + 1], v_all[r : r + 1],
                    m_r, l_r, acc_r, seg, segt, scale,
                )

    # per-row attention, sequential over the (static) batch rows; the
    # weight ring keeps streaming o/gate_up blocks underneath
    for b in range(0 if (shared or group_size) else rows):
        q = q_all[b : b + 1]
        k_new = k_all[b : b + 1]
        v_new = v_all[b : b + 1]
        nlive = nlive_of(b)

        if b > 0:
            # rows > 0 prime their own first KV blocks (row 0's were
            # issued from the qkv stream's tail); sequencing after the
            # previous row's loop reuses the same 2 slots safely
            @pl.when(nlive > 0)
            def _():
                k, v = kv_dma(b, 0, 0)
                k.start(); v.start()
            if nb_kv > 1:
                @pl.when(nlive > 1)
                def _():
                    k, v = kv_dma(b, 1, 1)
                    k.start(); v.start()

        def attn_block(tb, carry, b=b):
            slot = jax.lax.rem(tb, 2)
            nl = nlive_of(b)

            # blocks 0 and 1 were issued before the loop; the in-loop
            # refill only covers block 2 onward — re-starting an
            # already-started slot double-signals its DMA semaphore (a
            # runtime-INTERNAL crash on hardware)
            @pl.when((tb + 1 < nl) & (tb + 1 >= 2))
            def _():
                k, v = kv_dma(b, jax.lax.rem(tb + 1, 2), tb + 1)
                k.start(); v.start()

            k, v = kv_dma(b, slot, tb)
            k.wait(); v.wait()
            mb = mask_ref[pl.ds(tb * _ROWS, _ROWS), b : b + 1]
            return _attn_block_update(
                q, kbuf[slot], vbuf[slot], mb, *carry, seg, segt, scale
            )

        m0 = jnp.full((1, heads), _NEG, jnp.float32)
        l0 = jnp.zeros((1, heads), jnp.float32)
        acc0 = jnp.zeros((1, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nlive, attn_block, (m0, l0, acc0))

        ctx = _attn_fold_current(
            q, k_new, v_new, m, l, acc, seg, segt, scale
        )
        cbuf[b : b + 1, :] = ctx

    # ---- o stream ----
    n2_o = n_o * nblk

    def o_body(jo, _):
        ci = n_qkv + jo
        d_wait(ci)
        acc_lo, acc_hi = nibble_matvec_acc(
            cbuf, wbuf.at[jax.lax.rem(ci, ns)], o_sl, o_sh,
            dblk=dblk, g=o_sl.shape[0], col_start=jo * nblk,
        )
        ybuf[:, pl.ds(jo * nblk, nblk)] = acc_lo
        ybuf[:, pl.ds(n2_o + jo * nblk, nblk)] = acc_hi
        d_start(ci + ns)
        return 0

    jax.lax.fori_loop(0, n_o, o_body, 0, unroll=False)

    # ---- residual + norm2 ----
    o1 = x_ref[:].astype(jnp.float32) + ybuf[:, 0:D]
    o1buf[:] = o1
    var2 = jnp.mean(o1 * o1, axis=-1, keepdims=True)
    hbuf[:] = (o1 * jax.lax.rsqrt(var2 + eps) * ln2_ref[:]).astype(
        jnp.bfloat16
    )

    # ---- gate_up stream -> swiglu; down blocks prefetched near the tail ----
    def gu_body(jg, _):
        ci = n_qkv + n_o + jg
        d_wait(ci)
        # down block 0/1 issued so they land as the gate_up stream ends
        @pl.when(jg == n_gu - 3)
        def _():
            dn_dma(0).start()
        if n_dn > 1:   # a 1-block down has no second DMA to prime
            @pl.when(jg == n_gu - 2)
            def _():
                dn_dma(1).start()
        gate, up = nibble_matvec_acc(
            hbuf, wbuf.at[jax.lax.rem(ci, ns)], gu_sl, gu_sh,
            dblk=dblk, g=gu_sl.shape[0], col_start=jg * nblk,
        )
        h = gate * jax.nn.sigmoid(gate) * up
        h2buf[:, pl.ds(jg * nblk, nblk)] = h.astype(jnp.bfloat16)
        d_start(ci + ns)
        return 0

    jax.lax.fori_loop(0, n_gu, gu_body, 0, unroll=False)

    # ---- down stream -> output with residual folded ----
    d_half = D // 2

    def dn_body(jd, _):
        @pl.when(jd + 2 < n_dn)
        def _():
            dn_dma(jd + 2).start()
        dn_dma(jd).wait()
        lo, hi = nibble_matvec_acc(
            h2buf, dbuf.at[jax.lax.rem(jd, 2)], dn_sl, dn_sh,
            dblk=dblk, g=dn_sl.shape[0], col_start=jd * nblk,
        )
        ydbuf[:, pl.ds(jd * nblk, nblk)] = (
            lo + o1buf[:, pl.ds(jd * nblk, nblk)]
        )
        ydbuf[:, pl.ds(d_half + jd * nblk, nblk)] = (
            hi + o1buf[:, pl.ds(d_half + jd * nblk, nblk)]
        )
        return 0

    jax.lax.fori_loop(0, n_dn, dn_body, 0, unroll=False)
    out_ref[:] = ydbuf[:].astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "heads", "hd", "ns", "shared_cache", "group_size", "interpret"
    ),
)
def decode_layer_ring(
    x: jnp.ndarray,          # [B, 1, D] bf16 (T=1, B <= _BP)
    ln1_w: jnp.ndarray,
    qkv: Int4Weight,
    o: Int4Weight,
    ln2_w: jnp.ndarray,
    gate_up: Int4Weight,
    down: Int4Weight,
    cache_k: jnp.ndarray,    # [L, B, Tmax, D] bf16
    cache_v: jnp.ndarray,
    li,
    pos,                     # int32 scalar or [B]: per-row write slot
    mask: jnp.ndarray,       # [Tmax] or [B, Tmax]
    cos: jnp.ndarray,        # [hd//2] or [B, hd//2]
    sin: jnp.ndarray,
    *,
    eps: float,
    heads: int,
    hd: int,
    ns: int = 4,
    shared_cache: bool = False,
    group_size: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole decode layer with the manual ``ns``-slot DMA ring
    (:func:`_decode_ring_kernel`): one program per layer covering
    qkv + rope + cached attention + o-proj + norms + SwiGLU MLP +
    residuals, generalized to ``B <= 8`` batch rows (multi-episode
    serving): the
    weight streams are shared across rows for free, each row attends over
    its own cache with its own position/mask/rope.  Returns
    ``(x_out [B,1,D], k_new [B,D], v_new [B,D])``.

    ``shared_cache=True`` is the speculative-verify mode: the B rows are
    CONSECUTIVE draft tokens of one sequence — all rows attend cache row
    0 (streamed ONCE, all-rows block updates on the MXU) and row r
    additionally folds draft rows 0..r from registers, so one pass
    verifies B tokens for one weight stream (greedy_decode_spec).

    ``group_size=g`` is the BATCHED speculative-verify mode: the B rows
    are B//g episodes x g draft tokens — row (b, j) streams episode b's
    cache and folds its group's preceding draft rows, so one weight
    stream verifies g tokens for EVERY episode at once
    (greedy_decode_spec_batched).  Mutually exclusive with shared_cache."""
    B = x.shape[0]
    D = x.shape[-1]
    assert 1 <= B <= _BP, B
    assert not (shared_cache and group_size), "modes are mutually exclusive"
    if group_size:
        assert B % group_size == 0, (B, group_size)
        assert cache_k.shape[1] >= B // group_size
    else:
        assert cache_k.shape[1] >= (1 if shared_cache else B)
    tmax = cache_k.shape[2]
    assert tmax % _ROWS == 0
    assert qkv.n == 3 * D and qkv.d == D and o.d == D and o.n == D
    assert gate_up.d == D and down.n == D
    assert gate_up.n == 2 * gate_up.n2 and down.n == 2 * down.n2
    assert qkv.blocked == o.blocked == gate_up.blocked == down.blocked
    nblk = min(qkv.nblk, o.nblk, gate_up.nblk, down.nblk)
    dblk = qkv.dblk
    assert o.dblk == dblk == gate_up.dblk == down.dblk
    ip = down.dp
    n_qkv, n_o = qkv.n2 // nblk, o.n2 // nblk
    n_gu, n_dn = gate_up.n2 // nblk, down.n2 // nblk
    assert gate_up.n2 == ip
    # the down ring is primed at gate_up blocks n_gu-3 / n_gu-2, and row 0's
    # KV blocks are primed at qkv blocks n_qkv-2 / n_qkv-1
    assert n_gu >= 3, f"ring kernel needs >= 3 gate_up blocks, got {n_gu}"
    assert n_qkv >= 2, f"ring kernel needs >= 2 qkv blocks, got {n_qkv}"

    xp = jnp.pad(x.reshape(B, D).astype(jnp.bfloat16), ((0, _BP - B), (0, 0)))
    seg = np.zeros((D, heads), np.float32)
    for hh in range(heads):
        seg[hh * hd : (hh + 1) * hd, hh] = 1.0
    seg = jnp.asarray(seg, jnp.bfloat16)

    half = hd // 2
    i_lane = np.arange(D) % hd
    idx = jnp.asarray(i_lane % half)
    lo_mask = jnp.asarray(i_lane < half)
    cos2 = jnp.atleast_2d(cos.astype(jnp.float32))      # [B, half]
    sin2 = jnp.atleast_2d(sin.astype(jnp.float32))
    if cos2.shape[0] == 1 and B > 1:
        cos2 = jnp.broadcast_to(cos2, (B, half))
        sin2 = jnp.broadcast_to(sin2, (B, half))
    cosv = jnp.pad(cos2[:, idx], ((0, _BP - B), (0, 0)))      # [_BP, D]
    sin_l = jnp.pad(sin2[:, idx], ((0, _BP - B), (0, 0)))
    slo = jnp.where(lo_mask[None, :], -sin_l, 0.0)
    shi = jnp.where(lo_mask[None, :], 0.0, sin_l)

    mask2 = jnp.atleast_2d(mask)                         # [B, Tmax]
    if mask2.shape[0] == 1 and B > 1:
        mask2 = jnp.broadcast_to(mask2, (B, tmax))
    mask_t = jnp.pad(
        mask2.astype(jnp.float32), ((0, _BP - B), (0, 0))
    ).T                                                  # [Tmax, _BP]

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(-1)
    if pos_arr.shape[0] == 1 and B > 1:
        pos_arr = jnp.broadcast_to(pos_arr, (B,))
    pos_arr = jnp.pad(pos_arr, (0, _BP - B))             # dead rows: pos 0

    # shared-cache constants: E packs each row's q into its own column
    # group (q_seg = q_all^T E), seg_tiled masks each group to its head
    if shared_cache or group_size:
        e_np = np.zeros((_BP, _BP * heads), np.float32)
        for r in range(_BP):
            e_np[r, r * heads : (r + 1) * heads] = 1.0
        e_const = jnp.asarray(e_np, jnp.bfloat16)
        stile = jnp.tile(seg.astype(jnp.float32), (1, _BP))   # [D, _BP*H]
    else:
        e_const = jnp.zeros((1, 1), jnp.bfloat16)
        stile = jnp.zeros((1, 1), jnp.float32)

    kernel = functools.partial(
        _decode_ring_kernel,
        eps=eps, heads=heads, hd=hd, dblk=dblk, nblk=nblk, tmax=tmax,
        n_qkv=n_qkv, n_o=n_o, n_gu=n_gu, n_dn=n_dn, ns=ns,
        blocked=qkv.blocked, rows=B, shared=shared_cache,
        group_size=group_size,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            vm,                       # x
            vm, vm,                   # ln1, ln2
            hbm, vm, vm,              # qkv
            hbm, vm, vm,              # o
            hbm, vm, vm,              # gate_up
            hbm, vm, vm,              # down
            hbm, hbm,                 # caches
            vm, vm, vm, vm, vm, vm,   # mask, rope x3, seg, segt
            vm, vm,                   # E, seg_tiled (shared-cache mode)
        ],
        out_specs=[vm, vm, vm],
        scratch_shapes=[
            pltpu.VMEM((_BP, D), jnp.bfloat16),           # hbuf
            pltpu.VMEM((_BP, 3 * D), jnp.float32),        # ybuf
            pltpu.VMEM((_BP, D), jnp.bfloat16),           # cbuf
            pltpu.VMEM((_BP, D), jnp.float32),            # o1buf
            pltpu.VMEM((_BP, ip), jnp.bfloat16),          # h2buf
            pltpu.VMEM((_BP, D), jnp.float32),            # ydbuf
            pltpu.VMEM((_BP, D), jnp.float32),            # abuf
            pltpu.VMEM((ns, D, nblk), jnp.int8),          # D-row ring
            pltpu.SemaphoreType.DMA((ns,)),
            pltpu.VMEM((2, ip, nblk), jnp.int8),          # down ring
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, _ROWS, D), jnp.bfloat16),
            pltpu.VMEM((2, _ROWS, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_BP, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((_BP, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((_BP, D), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        jnp.asarray(li, jnp.int32).reshape(1),
        pos_arr,
        xp,
        ln1_w.reshape(1, D).astype(jnp.float32),
        ln2_w.reshape(1, D).astype(jnp.float32),
        qkv.q4, qkv.s_lo, qkv.s_hi,
        o.q4, o.s_lo, o.s_hi,
        gate_up.q4, gate_up.s_lo, gate_up.s_hi,
        down.q4, down.s_lo, down.s_hi,
        cache_k, cache_v,
        mask_t,
        cosv, slo, shi,
        seg,
        seg.T,
        e_const,
        stile,
    )
    return (
        out[:B].reshape(B, 1, D),
        k_new[:B],
        v_new[:B],
    )
