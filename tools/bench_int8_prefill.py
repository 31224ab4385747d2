"""Is W8A8 (int8 MXU) worth it for PREFILL?

Decode is HBM-bound, and there W4A8 measured slower than the bf16
AND-trick dots (docs/BENCH_NOTES.md).  Prefill is the opposite regime —
MXU-compute-bound at ~62-76% MFU of the v5e's 197 bf16 TFLOP/s — and the
MXU's int8 peak is 2x bf16, so int8 x int8 -> int32 dots could halve the
~50 ms net prefill.  This measures the pure matmul rate at the real
prefill shapes (T=896 tokens, Phi-3-mini qkv / gate_up / down) for:

  - bf16 x bf16 -> f32 (current path: int8 weights dequantized to bf16)
  - int8 x int8 -> int32 + f32 rescale (dynamic per-token activation
    quant included in the timed region, since serving would pay it)

Chain-slope method (n vs 2n matmuls, alternating 2 weight buffers so
nothing hoists); reports us/matmul and effective TFLOP/s.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    T = int(os.environ.get("DYNAM3D_PREFILL_T", "896"))
    shapes = [("qkv", 3072, 9216), ("gate_up", 3072, 16384),
              ("down", 8192, 3072)]
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(x.ravel()[:1])

    def slope_us(fn, x, w0, w1, n1=32, n2=128, reps=6):
        def chain(n):
            def f(xx, a, b):
                def body(i, acc):
                    w = jax.lax.cond(
                        jax.lax.rem(i, 2) == 0, lambda: a, lambda: b
                    )
                    y = fn(acc, w)
                    # keep a data dependence without folding (scalar so it
                    # broadcasts regardless of the output width)
                    return acc + 1e-12 * y[0, 0].astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, xx)
            return jax.jit(f)
        f1, f2 = chain(n1), chain(n2)
        sync(f1(x, w0, w1)), sync(f2(x, w0, w1))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.time(); sync(f1(x, w0, w1)); t1s.append(time.time() - t0)
            t0 = time.time(); sync(f2(x, w0, w1)); t2s.append(time.time() - t0)
        t1 = float(np.percentile(t1s, 50))
        t2 = float(np.percentile(t2s, 50))
        return (t2 - t1) / (n2 - n1) * 1e6

    for name, d, n in shapes:
        x = jnp.asarray(rng.normal(size=(T, d)), jnp.bfloat16)
        wf = rng.normal(scale=0.02, size=(d, n)).astype(np.float32)
        scale = np.abs(wf).max(0, keepdims=True) / 127.0
        wq = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        w_bf = jnp.asarray(wq.astype(np.float32) * scale, jnp.bfloat16)
        w_i8 = jnp.asarray(wq)
        w_bf1, w_i81 = w_bf + 0, w_i8 + 0   # distinct buffers
        ws = jnp.asarray(scale, jnp.float32)

        def mm_bf16(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        def mm_w8a8(a, w):
            # dynamic per-token activation quant (timed: serving pays it)
            am = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=1,
                         keepdims=True) / 127.0
            am = jnp.maximum(am, 1e-8)
            aq = jnp.clip(jnp.round(a.astype(jnp.float32) / am), -127, 127
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                aq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * am * ws

        flops = 2.0 * T * d * n
        us_bf = slope_us(mm_bf16, x, w_bf, w_bf1)
        us_i8 = slope_us(mm_w8a8, x, w_i8, w_i81)
        # one-shot numeric check of the w8a8 path vs bf16
        y_bf = np.asarray(mm_bf16(x, w_bf), np.float32)
        y_i8 = np.asarray(mm_w8a8(x, w_i8), np.float32)
        denom = np.maximum(np.abs(y_bf), 1e-3)
        rel = float(np.median(np.abs(y_i8 - y_bf) / denom))
        print(
            f"{name:8s} [{T}x{d}x{n}]: bf16 {us_bf:7.1f} us"
            f" ({flops/us_bf/1e6:6.1f} TF/s) | w8a8 {us_i8:7.1f} us"
            f" ({flops/us_i8/1e6:6.1f} TF/s, med rel err {rel:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
