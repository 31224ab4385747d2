"""Sweep manual-DMA ring depth for the streamed int4 matvec.

Hypothesis (docs/BENCH_NOTES.md round 3): the int4 matvec plateaus at
~60-75% of HBM peak because the 2-slot ring keeps only ONE weight DMA in
flight, so per-DMA fixed latency never amortizes — block-major contiguity
was measured neutral, which rules out stride inefficiency, and
``pl.Buffered`` tops out at double buffering, so deeper pipelining must be
hand-rolled.  This sweeps slot count S x nblk on a manual-DMA matvec at
the Phi-3 gate_up shape (3072x16384) and prints effective HBM GB/s.

Measurement rules (perf-findings memory):
  - chain two lengths, use the slope (cancels tunnel RTT + dispatch);
  - the kernel streams NW distinct stacked weights per step via a grid
    dimension (no XLA dynamic-slice copy, no VMEM hoisting possible);
  - weights are arguments, never closed over.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynam3d_tpu.ops.pallas_decode import _matvec_acc
    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    D, N = 3072, 16384
    NW = 4                       # distinct weights streamed per chain step
    BP = 8
    dblk = 1024

    rng = np.random.default_rng(0)
    ws = [
        pack_int4(
            jnp.asarray(rng.normal(scale=0.05, size=(D, N)), jnp.float32),
            dblk=dblk, nblk=512,
        )
        for _ in range(NW)
    ]
    q4s = jnp.stack([w.q4 for w in ws])          # [NW, D, N/2] int8, HBM
    sls = jnp.stack([w.s_lo for w in ws])        # [NW, g, N/2] f32
    shs = jnp.stack([w.s_hi for w in ws])
    xp = jnp.asarray(rng.normal(size=(BP, D)), jnp.bfloat16)

    n2 = N // 2
    bytes_per_mv = D * n2

    def kernel_idx(x_ref, sl_ref, sh_ref, q4_hbm, y_ref, wbuf, wsem,
                   *, S, nblk):
        w = pl.program_id(0)
        nb = n2 // nblk

        def dma(slot, jb):
            return pltpu.make_async_copy(
                q4_hbm.at[w, :, pl.ds(jb * nblk, nblk)], wbuf.at[slot],
                wsem.at[slot],
            )

        for k in range(S - 1):
            if k < nb:
                dma(k, k).start()

        def body(jb, _):
            slot = jax.lax.rem(jb, S)

            @pl.when(jb + S - 1 < nb)
            def _():
                dma(jax.lax.rem(jb + S - 1, S), jb + S - 1).start()

            dma(slot, jb).wait()
            _matvec_acc(x_ref, wbuf.at[slot], sl_ref, sh_ref, y_ref,
                        jb=jb, dblk=dblk, nblk=nblk, n2=n2)
            return 0

        jax.lax.fori_loop(0, nb, body, 0, unroll=False)

    def matvec(xq, q4, sl, sh, *, S, nblk):
        g = sl.shape[1]
        return pl.pallas_call(
            functools.partial(kernel_idx, S=S, nblk=nblk),
            grid=(NW,),
            in_specs=[
                pl.BlockSpec((BP, D), lambda w: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, g, n2), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, g, n2), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BP, N), lambda w: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BP, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((S, D, nblk), jnp.int8),
                pltpu.SemaphoreType.DMA((S,)),
            ],
        )(xq, sl, sh, q4)

    def make_chain(n, *, S, nblk):
        def f(xq, q4, sl, sh):
            def body(i, acc):
                y = matvec(acc, q4, sl, sh, S=S, nblk=nblk)
                nxt = (y[:, :D] + y[:, D:2 * D]) * 1e-12 + xq
                return nxt.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, xq)
        return f

    def sync(y):
        return np.asarray(y.ravel()[:1])

    def slope_us(mk, n1=32, n2=160, reps=7):
        f1 = jax.jit(mk(n1))
        f2 = jax.jit(mk(n2))
        sync(f1(xp, q4s, sls, shs)); sync(f2(xp, q4s, sls, shs))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.time(); sync(f1(xp, q4s, sls, shs)); t1s.append(time.time() - t0)
            t0 = time.time(); sync(f2(xp, q4s, sls, shs)); t2s.append(time.time() - t0)
        # per single-weight matvec (each chain step streams NW weights)
        return (np.percentile(t2s, 50) - np.percentile(t1s, 50)) / (
            (n2 - n1) * NW) * 1e6

    variants = [
        dict(S=2, nblk=512),     # the in-tree _streamed_matvec scheme
        dict(S=3, nblk=512),
        dict(S=4, nblk=512),
        dict(S=4, nblk=256),
        dict(S=6, nblk=256),
        dict(S=8, nblk=128),
    ]
    for v in variants:
        try:
            us = slope_us(lambda n, v=v: make_chain(n, **v))
            gbs = bytes_per_mv / us / 1e3
            print(f"S={v['S']} nblk={v['nblk']:4d}: {us:7.1f} us/mv  "
                  f"{gbs:6.0f} GB/s  ({gbs / 819 * 100:4.1f}% peak)",
                  flush=True)
        except Exception as e:
            print(f"S={v['S']} nblk={v['nblk']:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
