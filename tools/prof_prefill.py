"""Per-phase PREFILL profiling: where do the ~75-88 ms actually go?

The per-matmul W8A8 microbench measures 209-219 TF/s (tools/
bench_int8_prefill.py) yet the e2e prefill runs at ~98 TF/s effective —
roughly half the prefill walltime is unattributed.  This tool times each
prefill component as an n1-vs-n2 chained program at full Phi-3-mini dims
(T=816 prompt, the bench default; cache 1024), so the slope cancels the
tunnel RTT:

  - e2e phi3.forward (W8A8 default, and weight-only int8 for reference)
  - the four matmuls per layer x 32 (the supposed ~90% of the FLOPs)
  - attention core (einsum + masked softmax + einsum) x 32
  - glue x 32: rmsnorm x2, rope, residuals, cache dynamic_update_slice
  - lm_head over all T vs the last position only

Usage: python tools/prof_prefill.py   (real TPU; ~5-10 min warm cache)
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

    from dynam3d_tpu import flags
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3

    cfg = Phi3Config()
    D, L = cfg.hidden_size, cfg.num_layers
    B, T = 1, 816
    total = 1024

    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    params = phi3.quantize_phi3(params, bits=4, consume=True)
    lp = params["layers"][0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.02, size=(B, T, D)), jnp.bfloat16)
    valid = jnp.ones((B, T), bool)
    positions = jnp.tile(jnp.arange(T), (B, 1))
    mask = phi3.prefill_mask(valid, total)

    def sync(y):
        return np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])

    def slope_ms(make_fn, n1=1, n2=3, reps=6):
        f1, f2 = jax.jit(make_fn(n1)), jax.jit(make_fn(n2))
        a = (params, lp, x)
        sync(f1(*a)), sync(f2(*a))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.time(); sync(f1(*a)); t1s.append(time.time() - t0)
            t0 = time.time(); sync(f2(*a)); t2s.append(time.time() - t0)
        t1 = float(np.percentile(t1s, 50))
        t2 = float(np.percentile(t2s, 50))
        return (t2 - t1) / (n2 - n1) * 1e3

    results = {}

    # ---- e2e forward (cache init inside, as greedy_decode does) ----
    def mk_e2e(n):
        def f(fp, wp, xx):
            def body(i, acc):
                cache = phi3.init_cache(cfg, B, total, dtype=acc.dtype)
                logits, cache = phi3.forward(
                    fp, cfg, acc, positions, cache, 0, mask
                )
                return acc + 1e-12 * logits[:, -1, :D].astype(acc.dtype)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    results["e2e_w8a8"] = slope_ms(mk_e2e)

    flags.W8A8_PREFILL = False

    def mk_e2e_wo(n):
        def f(fp, wp, xx):
            def body(i, acc):
                cache = phi3.init_cache(cfg, B, total, dtype=acc.dtype)
                logits, cache = phi3.forward(
                    fp, cfg, acc, positions, cache, 0, mask
                )
                return acc + 1e-12 * logits[:, -1, :D].astype(acc.dtype)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    results["e2e_weight_only_int8"] = slope_ms(mk_e2e_wo)
    flags.W8A8_PREFILL = True

    # ---- the 4 matmuls per layer x L (no attention / glue) ----
    def mk_matmuls(n):
        def f(fp, wp, xx):
            def body(i, acc):
                a = acc
                for li in range(L):
                    p = fp["layers"][li]
                    qkv = phi3._mm(p["qkv"], a)
                    o_in = qkv[..., :D].astype(a.dtype)
                    a2 = phi3._mm(p["o"], o_in)
                    gu = phi3._mm(p["gate_up"], a2.astype(a.dtype))
                    gate, up = jnp.split(gu, 2, axis=-1)
                    dn = phi3._mm(p["down"], (jax.nn.silu(gate) * up))
                    a = a + 1e-12 * dn.astype(a.dtype)
                return a
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    results["matmuls_x32_w8a8"] = slope_ms(mk_matmuls)

    flags.W8A8_PREFILL = False
    results["matmuls_x32_weight_only"] = slope_ms(mk_matmuls)
    flags.W8A8_PREFILL = True

    # ---- attention core x L ----
    import math

    def mk_attn(n):
        def f(fp, wp, xx):
            q0 = xx.reshape(B, T, cfg.num_heads, cfg.head_dim)
            kk = jnp.pad(q0, ((0, 0), (0, total - T), (0, 0), (0, 0)))
            def body(i, acc):
                a = acc
                for li in range(L):
                    q = a.reshape(B, T, cfg.num_heads, cfg.head_dim)
                    logits = jnp.einsum(
                        "bqhd,bkhd->bhqk", q, kk,
                        preferred_element_type=jnp.float32,
                    ) / math.sqrt(cfg.head_dim)
                    logits = jnp.where(
                        mask[:, None, :, :], logits,
                        jnp.finfo(jnp.float32).min,
                    )
                    attn = jax.nn.softmax(logits, axis=-1).astype(a.dtype)
                    o = jnp.einsum(
                        "bhqk,bkhd->bqhd", attn, kk,
                        preferred_element_type=jnp.float32,
                    ).reshape(B, T, D)
                    a = a + 1e-12 * o.astype(a.dtype)
                return a
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    results["attention_x32"] = slope_ms(mk_attn)

    # ---- glue x L: norms, rope, residual, cache writes ----
    def mk_glue(n):
        def f(fp, wp, xx):
            ck = jnp.zeros((B, total, cfg.num_kv_heads, cfg.head_dim),
                           xx.dtype)
            def body(i, acc):
                a = acc
                for li in range(L):
                    p = fp["layers"][li]
                    h = phi3.rms_norm(p["input_ln"], a, cfg.rms_eps)
                    k = h.reshape(B, T, cfg.num_heads, cfg.head_dim)
                    k = phi3._rope(k, positions, cfg.rope_theta)
                    kc = jax.lax.dynamic_update_slice(
                        ck, k, (0, 0, 0, 0)
                    )
                    h2 = phi3.rms_norm(p["post_ln"], a, cfg.rms_eps)
                    a = a + 1e-12 * (
                        h2 + kc[:, :T].reshape(B, T, D)
                    ).astype(a.dtype)
                return a
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    results["glue_x32"] = slope_ms(mk_glue)

    # ---- lm_head: all T vs last position ----
    def mk_lm_full(n):
        def f(fp, wp, xx):
            def body(i, acc):
                lg = phi3._lm_head(fp, acc)
                return acc + 1e-12 * lg[:, :, :D].astype(acc.dtype)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    def mk_lm_last(n):
        def f(fp, wp, xx):
            def body(i, acc):
                lg = phi3._lm_head(fp, acc[:, -1:, :])
                return acc + 1e-12 * jnp.pad(
                    lg[:, :, :D], ((0, 0), (0, T - 1), (0, 0))
                ).astype(acc.dtype)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    results["lm_head_all_T"] = slope_ms(mk_lm_full, n1=2, n2=8)
    results["lm_head_last_only"] = slope_ms(mk_lm_last, n1=2, n2=8)

    attributed = (
        results["matmuls_x32_w8a8"] + results["attention_x32"]
        + results["glue_x32"] + results["lm_head_all_T"]
    )
    results["attributed_sum"] = attributed
    results["unattributed"] = results["e2e_w8a8"] - attributed

    print("\n=== prefill attribution (ms, chain slopes, T=%d) ===" % T)
    for k, v in results.items():
        print(f"  {k:28s} {v:8.2f}")


if __name__ == "__main__":
    main()
