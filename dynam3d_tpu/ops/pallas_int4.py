"""Pallas TPU kernel: int4 weight-only matvec with unpack-in-VMEM.

Greedy decode is HBM-bound on weight reads (docs/BENCH_NOTES.md): at Phi-3
dims every generated token streams ~3.7 G parameters.  int8 halves the
bytes/token vs bf16; int4 halves them again — but ``jnp.int4`` arrays cannot
cross ``device_put`` on this backend (relayout recursion; see BENCH_NOTES),
so 4-bit storage has to be two-nibbles-per-int8 with the unpack done on-chip.
XLA would materialize the unpacked bf16 weights in HBM between the convert
and the dot, forfeiting the bandwidth win; this kernel unpacks inside VMEM so
HBM only ever sees the packed bytes.

Layout (``pack_int4``):
  - weight ``W[D, N]`` is padded to ``Dp = ceil(D/dblk)*dblk``,
    ``Np = ceil(N/(2*nblk))*2*nblk`` and split column-wise into halves
    ``lo = W[:, :Np/2]``, ``hi = W[:, Np/2:]``.
  - byte ``q4[d, n]`` carries ``lo[d, n]`` in bits 0-3 and ``hi[d, n]`` in
    bits 4-7 (both signed, range [-7, 7]).
  - scales are per (row-group, column): ``s_lo/s_hi[g, n]`` with group size
    ``dblk`` along D.  Group-wise scales cost nothing at matvec time — the
    partial product of each D-chunk is scaled *after* the matmul
    (``y[b,n] = sum_g s[g,n] * sum_{d in g} x[b,d] q[d,n]``), so the VPU
    scales a ``[B, nblk]`` tile instead of a ``[dblk, nblk]`` weight tile.

Kernel structure: grid over column blocks of the packed array; each program
streams its ``[Dp, nblk]`` int8 block HBM->VMEM (auto double-buffered by the
grid pipeline), unpacks chunk-by-chunk with int32 shifts, and runs two
``[B, dblk] @ [dblk, nblk]`` MXU matmuls per chunk (lo and hi halves).
Accumulation is f32.

The reference runs decode through HF ``llava.generate``
(Policy_Dynam3D_VLN.py:463) in fp16 — quantized serving entirely replaces
that path rather than translating it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynam3d_tpu import flags


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
class Int4Weight:
    """Packed int4 weight: ``q4`` int8 (two nibbles/byte, hi signed and lo
    stored biased by +8 — see ``pack_int4``) with
    ``s_lo``/``s_hi`` f32 ``[Dp/dblk, Np/2]`` group-wise scales.  ``d``/``n``
    (the unpadded shape) and the block sizes ride as static aux data so the
    matmul can slice the padding off under ``jit``.

    Two storage layouts for ``q4``:
      - flat (``blocked=False``): ``[Dp, Np/2]`` — a column-block DMA reads
        ``nblk`` bytes per row, a strided pattern;
      - block-major (``blocked=True``): ``[Np/2 // nblk, Dp, nblk]`` — each
        column block is one fully CONTIGUOUS chunk in HBM, which is what the
        DMA engines want (the decode matvecs stream these blocks).
    """

    def __init__(
        self, q4, s_lo, s_hi, d: int, n: int, dblk: int, nblk: int,
        blocked: bool = False,
    ):
        self.q4 = q4
        self.s_lo = s_lo
        self.s_hi = s_hi
        self.d = d
        self.n = n
        self.dblk = dblk
        self.nblk = nblk
        self.blocked = blocked

    @property
    def n2(self) -> int:
        """Packed column count Np/2 regardless of layout."""
        if self.blocked:
            return self.q4.shape[0] * self.q4.shape[2]
        return self.q4.shape[1]

    @property
    def dp(self) -> int:
        return self.q4.shape[1] if self.blocked else self.q4.shape[0]

    def tree_flatten(self):
        return (self.q4, self.s_lo, self.s_hi), (
            self.d, self.n, self.dblk, self.nblk, self.blocked
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def pack_int4(
    w: jnp.ndarray, dblk: int = 1024, nblk: int = 512, blocked: bool = False
) -> Int4Weight:
    """Quantize ``w [D, N]`` to packed int4 with group-``dblk`` scales.

    Block defaults come from an on-chip sweep at the Phi-3 gate_up shape
    (3072x16384, v5e): dblk=1024/nblk=512 measured 40.9 us/matvec = 616 GB/s
    effective HBM read (75% of peak), vs 87 us for the XLA int8 matvec —
    smaller dblk pays more VPU unpack overhead per chunk, larger nblk
    lengthens the pipeline stages past the sweet spot.  ``blocked=True``
    stores block-major (see Int4Weight) so each block DMA is contiguous."""
    d, n = w.shape
    dp, np_ = _round_up(d, dblk), _round_up(n, 2 * nblk)
    wf = jnp.asarray(w, jnp.float32)
    wf = jnp.pad(wf, ((0, dp - d), (0, np_ - n)))
    g = dp // dblk
    grp = wf.reshape(g, dblk, np_)
    scale = jnp.max(jnp.abs(grp), axis=1) / 7.0          # [G, Np]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(grp / scale[:, None, :]), -7, 7
    ).astype(jnp.int32).reshape(dp, np_)
    n2 = np_ // 2
    lo, hi = q[:, :n2], q[:, n2:]
    # Biased-lo byte format: b = 16*hi + (lo+8), i.e. the lo nibble is
    # stored UNSIGNED (0..15).  This lets the matvec kernels unpack with a
    # single int8 AND — ``x@lo = x@(b&15) - 8*sum(x)`` and
    # ``x@hi = (x@b - x@(b&15))/16`` — instead of four vector shifts, which
    # moves the kernel from VPU-unpack-bound (599 GB/s) to its DMA floor
    # (703 GB/s, 86% of v5e HBM peak); measured bit-exact vs the shift
    # unpack (tools/bench_int4_unpack.py).
    packed = ((hi & 0xF) << 4) | ((lo + 8) & 0xF)        # 0..255 in int32
    packed = jnp.where(packed >= 128, packed - 256, packed).astype(jnp.int8)
    if blocked:
        packed = packed.reshape(dp, n2 // nblk, nblk).transpose(1, 0, 2)
    return Int4Weight(
        packed, scale[:, :n2], scale[:, n2:], d, n, dblk, nblk, blocked
    )


def unblock_q4(w: Int4Weight) -> jnp.ndarray:
    """The flat ``[Dp, Np/2]`` view of ``q4`` in either layout."""
    if not w.blocked:
        return w.q4
    nb, dp, nblk = w.q4.shape
    return w.q4.transpose(1, 0, 2).reshape(dp, nb * nblk)


def _unpack_i32(q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Biased-lo int8 packed -> (lo, hi) signed int32 nibbles."""
    qi = q.astype(jnp.int32)
    lo = (qi & 15) - 8
    hi = (qi << 24) >> 28
    return lo, hi


def nibble_matvec_acc(
    src_ref, q_ref, sl_ref, sh_ref, *, dblk: int, g: int, col_start=0
):
    """The ONE chunked packed-int4 matvec body every kernel shares.

    ``src [Bp, >=g*dblk] @ unpack(q [g*dblk, nblk])`` accumulated over
    ``g`` D-chunks with group-wise scales applied to the partial products;
    returns ``(acc_lo, acc_hi)`` f32 ``[Bp, nblk]``.  ``col_start`` slices
    the scale columns when the scale refs are full-width (the fused decode
    kernel passes them whole; the grid-blocked kernels pass per-block
    scale refs and use the default 0).

    Unpack uses the biased-lo format (see ``pack_int4``): the stored byte
    is ``b = 16*hi + lo_u`` with ``lo_u = lo+8`` unsigned, so one int8 AND
    recovers ``lo_u`` and both halves fall out of two MXU dots —
    ``x@lo = x@lo_u - 8*sum(x)``, ``x@hi = (x@b - x@lo_u) * 1/16`` — with
    no vector shifts (Mosaic cannot lower int8 shifts, and the int32-widen
    unpack was VPU-bound at ~73% of HBM peak vs 86% for this form).
    """
    nblk = q_ref.shape[1]

    def chunk(i, carry):
        acc_lo, acc_hi = carry
        b = q_ref[pl.ds(i * dblk, dblk), :]              # int8, lo biased
        lo_u = b & jnp.int8(15)
        xc = src_ref[:, pl.ds(i * dblk, dblk)]
        sumx = jnp.sum(xc.astype(jnp.float32), axis=-1, keepdims=True)
        p_b = jnp.dot(
            xc, b.astype(xc.dtype), preferred_element_type=jnp.float32
        )
        p_lo = jnp.dot(
            xc, lo_u.astype(xc.dtype), preferred_element_type=jnp.float32
        )
        sl = sl_ref[pl.ds(i, 1), pl.ds(col_start, nblk)]
        sh = sh_ref[pl.ds(i, 1), pl.ds(col_start, nblk)]
        acc_lo = acc_lo + (p_lo - 8.0 * sumx) * sl
        acc_hi = acc_hi + (p_b - p_lo) * (0.0625 * sh)
        return acc_lo, acc_hi

    z = jnp.zeros((src_ref.shape[0], nblk), jnp.float32)
    return jax.lax.fori_loop(0, g, chunk, (z, z))


def _kernel(x_ref, q_ref, sl_ref, sh_ref, out_ref, *, dblk: int):
    """One column block: x [Bp, Dp] @ unpack(q [Dp, nblk]) -> out [2, Bp, nblk]."""
    acc_lo, acc_hi = nibble_matvec_acc(
        x_ref, q_ref, sl_ref, sh_ref, dblk=dblk, g=sl_ref.shape[0]
    )
    out_ref[0] = acc_lo
    out_ref[1] = acc_hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_int4_matmul(
    xp: jnp.ndarray, w: Int4Weight, interpret: bool = False
) -> jnp.ndarray:
    """xp [Bp, Dp] bf16 (padded) -> [Bp, Np] f32 (padded, halves concatenated)."""
    bp, dp = xp.shape
    n2 = w.n2
    g = w.s_lo.shape[0]
    nblk = min(w.nblk, n2)
    if w.blocked:
        # block-major storage: block j is q4[j] — one CONTIGUOUS chunk;
        # the leading None squeezes it so the kernel body is unchanged
        q4_spec = pl.BlockSpec(
            (None, dp, nblk), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        q4_spec = pl.BlockSpec(
            (dp, nblk), lambda j: (0, j), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        functools.partial(_kernel, dblk=w.dblk),
        grid=(n2 // nblk,),
        in_specs=[
            pl.BlockSpec((bp, dp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            q4_spec,
            pl.BlockSpec((g, nblk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nblk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, bp, nblk), lambda j: (0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, bp, n2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * dp * n2,
            bytes_accessed=dp * n2 + bp * dp * 2 + 2 * bp * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(xp, w.q4, w.s_lo, w.s_hi)
    return jnp.concatenate([out[0], out[1]], axis=-1)


def _kernel2d(x_ref, q_ref, sl_ref, sh_ref, out_ref):
    """One (row-chunk, column-block) tile per program; rows accumulate into
    the revisited output block.  The 2D grid turns the whole matvec into
    uniform small tiles, so the HBM pipeline has g x n_j stages to overlap
    instead of n_j ramp-limited ones — tall weights (down-proj: 8 row
    chunks, 3 column blocks) pipeline much better this way."""
    i = pl.program_id(1)
    lo, hi = _unpack_i32(q_ref[:])
    xc = x_ref[:]
    p_lo = jnp.dot(xc, lo.astype(xc.dtype), preferred_element_type=jnp.float32)
    p_hi = jnp.dot(xc, hi.astype(xc.dtype), preferred_element_type=jnp.float32)
    # scale blocks carry all G rows (a (1, nblk) block violates the TPU
    # sublane-divisibility rule); select this program's row-chunk scale
    p_lo = p_lo * sl_ref[pl.ds(i, 1), :]
    p_hi = p_hi * sh_ref[pl.ds(i, 1), :]

    @pl.when(i == 0)
    def _():
        out_ref[0] = p_lo
        out_ref[1] = p_hi

    @pl.when(i > 0)
    def _():
        out_ref[0] += p_lo
        out_ref[1] += p_hi


def _pallas_int4_matmul2d(
    xp: jnp.ndarray, w: Int4Weight, interpret: bool = False
) -> jnp.ndarray:
    """2D-grid twin of :func:`_pallas_int4_matmul` (same in/out contract).

    Not jitted itself: nesting this jit under an outer trace alongside the
    1D variant trips a jax-0.9 lowering-cache KeyError (closed_call); it is
    only ever called from already-jitted callers anyway."""
    bp, dp = xp.shape
    n2 = w.n2
    g = w.s_lo.shape[0]
    nblk = min(w.nblk, n2)
    dblk = w.dblk
    if w.blocked:
        q4_spec = pl.BlockSpec(
            (None, dblk, nblk), lambda j, i: (j, i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        q4_spec = pl.BlockSpec(
            (dblk, nblk), lambda j, i: (i, j), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        _kernel2d,
        grid=(n2 // nblk, g),
        in_specs=[
            pl.BlockSpec((bp, dblk), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            q4_spec,
            pl.BlockSpec((g, nblk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nblk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, bp, nblk), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, bp, n2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * dp * n2,
            bytes_accessed=dp * n2 + bp * dp * 2 + 2 * bp * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(xp, w.q4, w.s_lo, w.s_hi)
    return jnp.concatenate([out[0], out[1]], axis=-1)


def _xla_int4_matmul(xp: jnp.ndarray, w: Int4Weight) -> jnp.ndarray:
    """Fallback (CPU tests / non-TPU): dequantize then matmul.  Materializes
    the bf16 weights, so it carries none of the bandwidth win."""
    lo, hi = _unpack_i32(unblock_q4(w))
    g, dblk = w.s_lo.shape[0], w.dblk
    n2 = w.n2

    def deq(q, s):
        qf = q.reshape(g, dblk, n2).astype(jnp.float32)
        return (qf * s[:, None, :]).reshape(g * dblk, n2)

    wf = jnp.concatenate([deq(lo, w.s_lo), deq(hi, w.s_hi)], axis=-1)
    return jnp.dot(
        xp, wf.astype(xp.dtype), preferred_element_type=jnp.float32
    )


def _mlp_kernel(
    x_ref, qgu_ref, sgl_ref, sgh_ref, qdn_ref, sdl_ref, sdh_ref,
    out_ref, h_ref, *, dblk: int, n_gu: int,
):
    """Fused SwiGLU MLP: phase 1 (programs [0, n_gu)) fills the hidden
    activation scratch ``h = silu(gate) * up`` column-block by column-block;
    phase 2 streams the down-projection against the completed scratch.

    Correct because the TPU Pallas grid executes SEQUENTIALLY and scratch
    persists across grid steps — h is fully written before the first
    phase-2 program runs.  gate|up arrive as the lo|hi nibble halves of one
    packed array, so the SwiGLU product needs no extra pass."""
    j = pl.program_id(0)
    nblk = qgu_ref.shape[1]

    @pl.when(j == 0)
    def _():
        # the down pack's padded rows are zero weights, but 0 * garbage VMEM
        # could still be NaN — zero the whole activation scratch once
        h_ref[...] = jnp.zeros_like(h_ref)

    @pl.when(j < n_gu)
    def _():
        gate, up = nibble_matvec_acc(
            x_ref, qgu_ref, sgl_ref, sgh_ref, dblk=dblk, g=sgl_ref.shape[0]
        )
        h = gate * jax.nn.sigmoid(gate) * up                    # SwiGLU
        h_ref[:, pl.ds(j * nblk, nblk)] = h.astype(jnp.bfloat16)

    @pl.when(j >= n_gu)
    def _():
        lo, hi = nibble_matvec_acc(
            h_ref, qdn_ref, sdl_ref, sdh_ref, dblk=dblk, g=sdl_ref.shape[0]
        )
        out_ref[0] = lo
        out_ref[1] = hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_int4_mlp(
    xp: jnp.ndarray, gu: Int4Weight, dn: Int4Weight, interpret: bool = False
) -> jnp.ndarray:
    """xp [Bp, Dp] bf16 -> [Bp, Np_dn] f32 (padded halves concatenated)."""
    bp, dp = xp.shape
    assert gu.blocked == dn.blocked
    n2_gu = gu.n2                     # = intermediate size I (lo=gate, hi=up)
    n2_dn = dn.n2
    ip = dn.dp                        # padded I for the down projection
    nblk = gu.nblk
    n_gu = n2_gu // nblk
    n_dn = n2_dn // nblk
    g_gu = gu.s_lo.shape[0]
    g_dn = dn.s_lo.shape[0]
    if gu.blocked:   # block-major: every weight-block DMA is contiguous
        qgu_spec = pl.BlockSpec(
            (None, dp, nblk), lambda j: (jnp.minimum(j, n_gu - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        qdn_spec = pl.BlockSpec(
            (None, ip, nblk), lambda j: (jnp.maximum(j - n_gu, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        qgu_spec = pl.BlockSpec(
            (dp, nblk), lambda j: (0, jnp.minimum(j, n_gu - 1)),
            memory_space=pltpu.VMEM,
        )
        qdn_spec = pl.BlockSpec(
            (ip, nblk), lambda j: (0, jnp.maximum(j - n_gu, 0)),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, dblk=gu.dblk, n_gu=n_gu),
        grid=(n_gu + n_dn,),
        in_specs=[
            pl.BlockSpec((bp, dp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            qgu_spec,
            pl.BlockSpec(
                (g_gu, nblk), lambda j: (0, jnp.minimum(j, n_gu - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_gu, nblk), lambda j: (0, jnp.minimum(j, n_gu - 1)),
                memory_space=pltpu.VMEM,
            ),
            qdn_spec,
            pl.BlockSpec(
                (g_dn, nblk), lambda j: (0, jnp.maximum(j - n_gu, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_dn, nblk), lambda j: (0, jnp.maximum(j - n_gu, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, bp, nblk), lambda j: (0, 0, jnp.maximum(j - n_gu, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, bp, n2_dn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, max(ip, n2_gu)), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * (dp * n2_gu + ip * n2_dn),
            bytes_accessed=dp * n2_gu + ip * n2_dn,
            transcendentals=bp * n2_gu,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp, gu.q4, gu.s_lo, gu.s_hi, dn.q4, dn.s_lo, dn.s_hi)
    return jnp.concatenate([out[0], out[1]], axis=-1)


def int4_mlp(
    x: jnp.ndarray, gate_up: Int4Weight, down: Int4Weight, out_dtype=None
) -> jnp.ndarray:
    """Fused SwiGLU MLP ``down(silu(gate(x)) * up(x))`` over packed int4
    weights — one kernel launch instead of two plus XLA glue (the decode
    hot path; docs/BENCH_NOTES.md round-2 notes).

    Constraints (guaranteed by ``quantize_phi3``'s packing): gate_up's lo/hi
    halves are exactly gate|up, ``down``'s row padding Ip >= I, and both
    packs share ``nblk``/``dblk``.  Falls back to two unfused matmuls off
    TPU or for prefill-sized row counts.
    """
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    use_pallas = (
        jax.default_backend() == "tpu"
        and rows <= 16
        and gate_up.nblk == down.nblk
        and gate_up.dblk == down.dblk
        # lo|hi nibble halves are exactly gate|up ONLY when the packed
        # column count had no padding (I a multiple of nblk) — true at
        # Phi-3 dims (8192/512); tiny configs fall back
        and gate_up.n == 2 * gate_up.n2
        and gate_up.blocked == down.blocked
        and not flags.DISABLE_PALLAS
    )
    if not use_pallas:
        h = int4_matmul(x, gate_up, out_dtype=jnp.float32)
        gate, up = jnp.split(h, 2, axis=-1)
        h = (jax.nn.silu(gate) * up).astype(x.dtype)
        # re-pad hidden to the down pack's row count
        pad = down.dp - h.shape[-1]
        if pad:
            h = jnp.concatenate(
                [h, jnp.zeros((*h.shape[:-1], pad), h.dtype)], axis=-1
            )
        return int4_matmul(h, down, out_dtype=out_dtype or x.dtype)
    d = x.shape[-1]
    dp = gate_up.dp
    bp = _round_up(max(rows, 1), 16)
    xp = jnp.pad(
        x.reshape(rows, d).astype(jnp.bfloat16),
        ((0, bp - rows), (0, dp - d)),
    )
    # the scratch covers Ip rows; silu(0)*0 pads are exactly zero, so the
    # padded hidden columns contribute nothing to the down matmul
    y = _pallas_int4_mlp(xp, gate_up, down)
    return (
        y[:rows, : down.n]
        .reshape(*lead, down.n)
        .astype(out_dtype or x.dtype)
    )


def _mlp_block_kernel(
    x_ref, lnw_ref, qgu_ref, sgl_ref, sgh_ref, qdn_ref, sdl_ref, sdh_ref,
    out_ref, xn_ref, h_ref, *, dblk: int, n_gu: int, eps: float,
):
    """``_mlp_kernel`` plus the surrounding layer glue: the input rmsnorm
    (j==0) and the residual add (phase 2), so a whole decode-MLP half runs
    as one program with zero XLA segments around it."""
    j = pl.program_id(0)
    nblk = qgu_ref.shape[1]

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn_ref[:] = (xf * jax.lax.rsqrt(var + eps) * lnw_ref[:]).astype(
            jnp.bfloat16
        )
        h_ref[...] = jnp.zeros_like(h_ref)

    @pl.when(j < n_gu)
    def _():
        gate, up = nibble_matvec_acc(
            xn_ref, qgu_ref, sgl_ref, sgh_ref, dblk=dblk, g=sgl_ref.shape[0]
        )
        h = gate * jax.nn.sigmoid(gate) * up
        h_ref[:, pl.ds(j * nblk, nblk)] = h.astype(jnp.bfloat16)

    @pl.when(j >= n_gu)
    def _():
        # residual add per output block: the lo half covers output columns
        # [jd*nblk, +nblk), the hi half the same range offset by D/2
        jd = j - n_gu
        lo, hi = nibble_matvec_acc(
            h_ref, qdn_ref, sdl_ref, sdh_ref, dblk=dblk, g=sdl_ref.shape[0]
        )
        d_half = x_ref.shape[1] // 2
        out_ref[0] = lo + x_ref[:, pl.ds(jd * nblk, nblk)].astype(jnp.float32)
        out_ref[1] = hi + x_ref[
            :, pl.ds(d_half + jd * nblk, nblk)
        ].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _pallas_int4_mlp_block(
    xp: jnp.ndarray, lnw: jnp.ndarray, gu: Int4Weight, dn: Int4Weight,
    eps: float, interpret: bool = False,
) -> jnp.ndarray:
    """xp [Bp, D] bf16 raw residual input -> [Bp, D] f32
    ``x + down(swiglu(rmsnorm(x)))`` (halves concatenated by the caller's
    reshape).  Requires unpadded dims: gu.d == xp.shape[1] == dn.n."""
    bp, d = xp.shape
    assert gu.blocked == dn.blocked
    n2_gu = gu.n2
    n2_dn = dn.n2
    ip = dn.dp
    nblk = gu.nblk
    n_gu = n2_gu // nblk
    n_dn = n2_dn // nblk
    if gu.blocked:
        qgu_spec = pl.BlockSpec(
            (None, d, nblk), lambda j: (jnp.minimum(j, n_gu - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        qdn_spec = pl.BlockSpec(
            (None, ip, nblk), lambda j: (jnp.maximum(j - n_gu, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        qgu_spec = pl.BlockSpec(
            (d, nblk), lambda j: (0, jnp.minimum(j, n_gu - 1)),
            memory_space=pltpu.VMEM,
        )
        qdn_spec = pl.BlockSpec(
            (ip, nblk), lambda j: (0, jnp.maximum(j - n_gu, 0)),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        functools.partial(
            _mlp_block_kernel, dblk=gu.dblk, n_gu=n_gu, eps=eps
        ),
        grid=(n_gu + n_dn,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            qgu_spec,
            pl.BlockSpec(
                (gu.s_lo.shape[0], nblk),
                lambda j: (0, jnp.minimum(j, n_gu - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (gu.s_hi.shape[0], nblk),
                lambda j: (0, jnp.minimum(j, n_gu - 1)),
                memory_space=pltpu.VMEM,
            ),
            qdn_spec,
            pl.BlockSpec(
                (dn.s_lo.shape[0], nblk),
                lambda j: (0, jnp.maximum(j - n_gu, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (dn.s_hi.shape[0], nblk),
                lambda j: (0, jnp.maximum(j - n_gu, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, bp, nblk), lambda j: (0, 0, jnp.maximum(j - n_gu, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, bp, n2_dn), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bp, d), jnp.bfloat16),
            pltpu.VMEM((bp, max(ip, n2_gu)), jnp.bfloat16),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * (d * n2_gu + ip * n2_dn),
            bytes_accessed=d * n2_gu + ip * n2_dn,
            transcendentals=bp * n2_gu,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp, lnw, gu.q4, gu.s_lo, gu.s_hi, dn.q4, dn.s_lo, dn.s_hi)
    return jnp.concatenate([out[0], out[1]], axis=-1)


def int4_mlp_block(
    x: jnp.ndarray,          # [..., D] residual input (pre-norm)
    ln_w: jnp.ndarray,       # [D] post-attention rmsnorm weight
    gate_up: Int4Weight,
    down: Int4Weight,
    eps: float,
    out_dtype=None,
) -> jnp.ndarray:
    """``x + down(silu(gate(rmsnorm(x))) * up(rmsnorm(x)))`` in one kernel.

    The decode-layer MLP half including its surrounding XLA glue (norm +
    residual).  Same eligibility as :func:`int4_mlp` plus unpadded D
    (``gate_up.d == D == down.n``); falls back to the norm + int4_mlp chain
    otherwise.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    use_pallas = (
        jax.default_backend() == "tpu"
        and rows <= 16
        and gate_up.nblk == down.nblk
        and gate_up.dblk == down.dblk
        and gate_up.n == 2 * gate_up.n2
        and down.n == 2 * down.n2
        and gate_up.d == d == down.n
        and gate_up.dp == d
        and gate_up.blocked == down.blocked
        and not flags.DISABLE_PALLAS
    )
    if not use_pallas:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h = (xf * jax.lax.rsqrt(var + eps) * ln_w).astype(jnp.bfloat16)
        return (
            x.astype(jnp.float32)
            + int4_mlp(h, gate_up, down, out_dtype=jnp.float32)
        ).astype(out_dtype or x.dtype)
    bp = _round_up(max(rows, 1), 16)
    xp = jnp.pad(
        x.reshape(rows, d).astype(jnp.bfloat16), ((0, bp - rows), (0, 0))
    )
    y = _pallas_int4_mlp_block(
        xp, ln_w.reshape(1, d).astype(jnp.float32), gate_up, down, eps
    )
    return y[:rows].reshape(*lead, d).astype(out_dtype or x.dtype)


def int4_matmul(x: jnp.ndarray, w: Int4Weight, out_dtype=None) -> jnp.ndarray:
    """``x [..., D] @ W[D, N]`` against a packed int4 weight.

    Dispatches to the Pallas kernel on TPU when the flattened row count is
    small (the matvec/decode regime it is tiled for); otherwise the XLA
    dequantize fallback.  Output dtype follows ``x`` unless overridden
    (accumulation is f32 either way).
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    xp = x.reshape(rows, d).astype(jnp.bfloat16)
    dp = w.dp
    bp = _round_up(max(rows, 1), 16)
    xp = jnp.pad(xp, ((0, bp - rows), (0, dp - d)))
    use_pallas = (
        jax.default_backend() == "tpu"
        and rows <= 16
        and not flags.DISABLE_PALLAS
    )
    if use_pallas:
        if flags.INT4_GRID2D:
            y = _pallas_int4_matmul2d(xp, w)
        else:
            y = _pallas_int4_matmul(xp, w)
    else:
        y = _xla_int4_matmul(xp, w)
    return y[:rows, : w.n].reshape(*lead, w.n).astype(out_dtype or x.dtype)
