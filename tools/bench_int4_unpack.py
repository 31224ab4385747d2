"""A/B compute variants of the streamed int4 matvec body.

Ring-depth sweep (bench_int4_stream.py) showed S=2 is optimal (582 GB/s,
71% peak; deeper rings monotonically worse), so the plateau is COMPUTE:
the per-block nibble unpack runs ~7 VPU ops/element (int32 widen, 4
shifts, 2 bf16 converts).  Variants, all at S=2/nblk=512, NW=4 stacked
weights streamed per step (no hoisting, no dynamic-slice copies):

  dma-floor : wait-only loop + trivial accumulate — the streaming ceiling
  current   : int32-widen unpack -> bf16 dot (the in-tree body)
  int8      : int8-native shifts (3 ops) -> bf16 dot — numerically
              IDENTICAL to current, just fewer VPU ops
  w4a8      : int8-native shifts -> s8 x s8 MXU dot with int32
              accumulate, f32 rescale — needs int8 activations (the
              per-row activation quant runs once per matvec, not per
              block); introduces activation-quant error
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

    from dynam3d_tpu.ops.pallas_int4 import pack_int4

    D, N = 3072, 16384
    NW = 4
    BP = 8
    dblk = 1024
    nblk = 512
    S = 2

    rng = np.random.default_rng(0)
    ws = [
        pack_int4(
            jnp.asarray(rng.normal(scale=0.05, size=(D, N)), jnp.float32),
            dblk=dblk, nblk=nblk,
        )
        for _ in range(NW)
    ]
    q4s = jnp.stack([w.q4 for w in ws])
    sls = jnp.stack([w.s_lo for w in ws])
    shs = jnp.stack([w.s_hi for w in ws])
    xp = jnp.asarray(rng.normal(size=(BP, D)), jnp.bfloat16)
    q4s_b = q4s ^ jnp.int8(8)          # lo nibble biased by +8 (mod 16)

    n2 = N // 2
    g = D // dblk
    bytes_per_mv = D * n2

    # ---- per-variant block bodies: (x_ref, wblk, sl_ref, sh_ref, y_ref, jb)
    def body_current(x_ref, wblk, sl_ref, sh_ref, y_ref, jb):
        def chunk(i, carry):
            acc_lo, acc_hi = carry
            qi = wblk[pl.ds(i * dblk, dblk), :].astype(jnp.int32)
            lo = (qi << 28) >> 28
            hi = (qi << 24) >> 28
            xc = x_ref[:, pl.ds(i * dblk, dblk)]
            p_lo = jnp.dot(xc, lo.astype(xc.dtype),
                           preferred_element_type=jnp.float32)
            p_hi = jnp.dot(xc, hi.astype(xc.dtype),
                           preferred_element_type=jnp.float32)
            acc_lo = acc_lo + p_lo * sl_ref[pl.ds(i, 1), pl.ds(jb * nblk, nblk)]
            acc_hi = acc_hi + p_hi * sh_ref[pl.ds(i, 1), pl.ds(jb * nblk, nblk)]
            return acc_lo, acc_hi
        z = jnp.zeros((BP, nblk), jnp.float32)
        acc_lo, acc_hi = jax.lax.fori_loop(0, g, chunk, (z, z))
        y_ref[:, pl.ds(jb * nblk, nblk)] = acc_lo
        y_ref[:, pl.ds(n2 + jb * nblk, nblk)] = acc_hi

    def body_andtrick(x_ref, wblk, sl_ref, sh_ref, y_ref, jb):
        # biased pack (b = q4 ^ 0x08): b = 16*hi + lo_u with lo_u = lo+8 in
        # 0..15, so  x.lo = x.lo_u - 8*sum(x)  and  x.hi = (x.b - x.lo_u)/16
        # — ONE int8 AND per element instead of four shifts; both dots ride
        # the MXU as before.
        def chunk(i, carry):
            acc_lo, acc_hi = carry
            b = wblk[pl.ds(i * dblk, dblk), :]          # int8, lo biased
            lo_u = b & jnp.int8(15)
            xc = x_ref[:, pl.ds(i * dblk, dblk)]
            sumx = jnp.sum(xc.astype(jnp.float32), -1, keepdims=True)
            p_b = jnp.dot(xc, b.astype(xc.dtype),
                          preferred_element_type=jnp.float32)
            p_lo = jnp.dot(xc, lo_u.astype(xc.dtype),
                           preferred_element_type=jnp.float32)
            sl = sl_ref[pl.ds(i, 1), pl.ds(jb * nblk, nblk)]
            sh = sh_ref[pl.ds(i, 1), pl.ds(jb * nblk, nblk)]
            acc_lo = acc_lo + (p_lo - 8.0 * sumx) * sl
            acc_hi = acc_hi + (p_b - p_lo) * (0.0625 * sh)
            return acc_lo, acc_hi
        z = jnp.zeros((BP, nblk), jnp.float32)
        acc_lo, acc_hi = jax.lax.fori_loop(0, g, chunk, (z, z))
        y_ref[:, pl.ds(jb * nblk, nblk)] = acc_lo
        y_ref[:, pl.ds(n2 + jb * nblk, nblk)] = acc_hi

    def body_w4a8(x_ref, wblk, sl_ref, sh_ref, y_ref, jb):
        # same AND trick, s8 x s8 MXU dots with int32 accumulate — zero
        # convert ops on the weight block; x_ref is int8 activations
        def chunk(i, carry):
            acc_lo, acc_hi = carry
            b = wblk[pl.ds(i * dblk, dblk), :]
            lo_u = b & jnp.int8(15)
            xc = x_ref[:, pl.ds(i * dblk, dblk)]        # int8
            sumx = jnp.sum(xc.astype(jnp.int32), -1, keepdims=True)
            p_b = jnp.dot(xc, b, preferred_element_type=jnp.int32)
            p_lo = jnp.dot(xc, lo_u, preferred_element_type=jnp.int32)
            sl = sl_ref[pl.ds(i, 1), pl.ds(jb * nblk, nblk)]
            sh = sh_ref[pl.ds(i, 1), pl.ds(jb * nblk, nblk)]
            acc_lo = acc_lo + (p_lo - 8 * sumx).astype(jnp.float32) * sl
            acc_hi = acc_hi + (p_b - p_lo).astype(jnp.float32) * (0.0625 * sh)
            return acc_lo, acc_hi
        z = jnp.zeros((BP, nblk), jnp.float32)
        acc_lo, acc_hi = jax.lax.fori_loop(0, g, chunk, (z, z))
        y_ref[:, pl.ds(jb * nblk, nblk)] = acc_lo
        y_ref[:, pl.ds(n2 + jb * nblk, nblk)] = acc_hi

    def body_floor(x_ref, wblk, sl_ref, sh_ref, y_ref, jb):
        # minimal data dependence on the streamed bytes: one row reduce
        y_ref[:, pl.ds(jb * nblk, nblk)] = (
            wblk[0:8, :].astype(jnp.float32)
        )

    bodies = {
        "dma-floor": body_floor,
        "current": body_current,
        "andtrick": body_andtrick,
        "w4a8": body_w4a8,
    }

    def kernel(x_ref, sl_ref, sh_ref, q4_hbm, y_ref, wbuf, wsem, *, body):
        w = pl.program_id(0)
        nb = n2 // nblk

        def dma(slot, jb):
            return pltpu.make_async_copy(
                q4_hbm.at[w, :, pl.ds(jb * nblk, nblk)], wbuf.at[slot],
                wsem.at[slot],
            )

        dma(0, 0).start()

        def loop(jb, _):
            slot = jax.lax.rem(jb, S)

            @pl.when(jb + 1 < nb)
            def _():
                dma(jax.lax.rem(jb + 1, S), jb + 1).start()

            dma(slot, jb).wait()
            body(x_ref, wbuf.at[slot], sl_ref, sh_ref, y_ref, jb)
            return 0

        jax.lax.fori_loop(0, nb, loop, 0, unroll=False)

    def matvec(xq, q4, sl, sh, *, name):
        xdt = jnp.int8 if name == "w4a8" else jnp.bfloat16
        return pl.pallas_call(
            functools.partial(kernel, body=bodies[name]),
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

    def make_chain(n, *, name):
        def f(xq, q4, sl, sh):
            def body(i, acc):
                if name == "w4a8":
                    # per-row dynamic activation quant (once per matvec)
                    am = jnp.max(jnp.abs(acc.astype(jnp.float32)), -1,
                                 keepdims=True)
                    sx = am / 127.0
                    xi = jnp.clip(
                        jnp.round(acc.astype(jnp.float32) / sx), -127, 127
                    ).astype(jnp.int8)
                    y = matvec(xi, q4, sl, sh, name=name) * sx
                elif name == "andtrick":
                    y = matvec(acc, q4, sl, sh, name=name)
                else:
                    y = matvec(acc, q4, sl, sh, name=name)
                nxt = (y[:, :D] + y[:, D:2 * D]) * 1e-12 + xq
                return nxt.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, xq)
        return f

    def sync(y):
        return np.asarray(y.ravel()[:1])

    def slope_us(mk, n1=32, n2=160, reps=7, q4_use=None):
        q4_use = q4s if q4_use is None else q4_use
        f1 = jax.jit(mk(n1))
        f2 = jax.jit(mk(n2))
        sync(f1(xp, q4_use, sls, shs)); sync(f2(xp, q4_use, sls, shs))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.time(); sync(f1(xp, q4_use, sls, shs)); t1s.append(time.time() - t0)
            t0 = time.time(); sync(f2(xp, q4_use, sls, shs)); t2s.append(time.time() - t0)
        return (np.percentile(t2s, 50) - np.percentile(t1s, 50)) / (
            (n2 - n1) * NW) * 1e6

    # numerics first (vs the current body), on-chip
    y_base = matvec(xp, q4s, sls, shs, name="current")
    y_trick = matvec(xp, q4s_b, sls, shs, name="andtrick")
    err = np.abs(np.asarray(y_trick[:, :512]) - np.asarray(y_base[:, :512]))
    den = np.abs(np.asarray(y_base[:, :512])) + 1.0
    print(f"andtrick vs current: max abs {err.max():.4f} "
          f"max rel-ish {(err/den).max():.4f}", flush=True)

    for name in bodies:
        try:
            q4_use = q4s_b if name in ("andtrick", "w4a8") else q4s
            us = slope_us(lambda n, name=name: make_chain(n, name=name),
                          q4_use=q4_use)
            gbs = bytes_per_mv / us / 1e3
            print(f"{name:9s}: {us:7.1f} us/mv  {gbs:6.0f} GB/s  "
                  f"({gbs / 819 * 100:4.1f}% peak)", flush=True)
        except Exception as e:
            print(f"{name:9s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
