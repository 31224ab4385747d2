"""Per-phase decode profiling: where do the ms/token actually go?

Times each decode component as an N-vs-2N chained program (the slope
cancels tunnel RTT and dispatch), at full Phi-3-mini dims with int4
weights, against its HBM byte bound:

  - fused attention layer (ops/pallas_decode.decode_attn_layer)
  - fused MLP block (ops/pallas_int4.int4_mlp_block)
  - unfused attention half (qkv matvec + XLA attention + o matvec)
  - unfused MLP (int4_mlp)
  - lm_head matvec + argmax
  - one-step LOGITS parity fused vs unfused (the random-weight token
    divergence check: argmax gaps are tiny under random weights, so token
    flips alone do not indicate a bug)
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
    from dynam3d_tpu.ops.pallas_decode import decode_attn_layer
    from dynam3d_tpu.ops.pallas_int4 import int4_mlp_block

    cfg = Phi3Config()
    D = cfg.hidden_size
    L = cfg.num_layers
    tmax = 1024
    pos = 830

    rng = np.random.default_rng(0)
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    params = phi3.quantize_phi3(params, bits=4, consume=True)
    lp = params["layers"][0]

    x = jnp.asarray(rng.normal(size=(1, 1, D)), jnp.bfloat16)
    ck = jnp.asarray(
        rng.normal(scale=0.1, size=(L, 1, tmax, D)), jnp.bfloat16
    )
    cv = jnp.asarray(
        rng.normal(scale=0.1, size=(L, 1, tmax, D)), jnp.bfloat16
    )
    mask = np.zeros(tmax, np.float32)
    mask[:pos] = 1.0
    mask = jnp.asarray(mask)
    half = cfg.head_dim // 2
    freqs = 1e4 ** (-np.arange(half) / half)
    cos = jnp.asarray(np.cos(pos * freqs), jnp.float32)
    sin = jnp.asarray(np.sin(pos * freqs), jnp.float32)

    def sync(y):
        return np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])

    def slope_us(make_fn, n1=128, n2=1024, reps=8):
        """per-iteration microseconds via the chain slope.  Every chained
        function takes (weights lp, full params, caches, x) as ARGUMENTS —
        closing over any of them bakes GBs of constants into the compile
        request."""
        f1, f2 = jax.jit(make_fn(n1)), jax.jit(make_fn(n2))
        a = (lp, params, ck, cv, x)
        sync(f1(*a)), sync(f2(*a))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.time(); sync(f1(*a)); t1s.append(time.time() - t0)
            t0 = time.time(); sync(f2(*a)); t2s.append(time.time() - t0)
        t1 = float(np.percentile(t1s, 50))
        t2 = float(np.percentile(t2s, 50))
        return (t2 - t1) / (n2 - n1) * 1e6

    # ---- fused attention layer ----
    def mk_attn(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                out, k_new, v_new = decode_attn_layer(
                    acc, wp["input_ln"], wp["qkv"]["q4"], wp["o"]["q4"],
                    kc, vc, 0, pos, mask, cos, sin,
                    eps=cfg.rms_eps, heads=cfg.num_heads, hd=cfg.head_dim,
                )
                # 1e-12 scale keeps a real data dependence (0.0* would fold)
                return out + 1e-12 * (k_new.sum() + v_new.sum())
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    # ---- fused MLP block ----
    def mk_mlp(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                return int4_mlp_block(
                    acc, wp["post_ln"], wp["gate_up"]["q4"],
                    wp["down"]["q4"], cfg.rms_eps,
                )
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    # ---- unfused attention half ----
    m_np = np.asarray(mask).copy()
    m_np[pos] = 1.0
    m3 = jnp.asarray(m_np > 0).reshape(1, 1, tmax)
    positions = jnp.full((1, 1), pos, jnp.int32)

    def attn_half(p, acc, q, kk, vv):
        # the attention half of phi3._attn_mlp (einsum + masked softmax + o)
        import math as _math

        B, T, _ = acc.shape
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kk, preferred_element_type=jnp.float32
        ) / _math.sqrt(cfg.head_dim)
        logits = jnp.where(
            m3[:, None, :, :], logits, jnp.finfo(jnp.float32).min
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(acc.dtype)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, vv, preferred_element_type=jnp.float32
        ).reshape(B, T, D).astype(acc.dtype)
        return acc + phi3._mm(p["o"], o)

    def mk_unfused_attn(n):
        def f(wp, fp, kc, vc, xx):
            khh = kc[0].reshape(1, tmax, cfg.num_kv_heads, cfg.head_dim)
            vhh = vc[0].reshape(1, tmax, cfg.num_kv_heads, cfg.head_dim)
            def body(i, acc):
                q, k, v = phi3._qkv(wp, cfg, acc, positions)
                kk = jax.lax.dynamic_update_slice(khh, k, (0, pos, 0, 0))
                vv = jax.lax.dynamic_update_slice(vhh, v, (0, pos, 0, 0))
                return attn_half(wp, acc, q, kk, vv)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    # ---- unfused MLP (norm + int4_mlp + residual) ----
    def mk_unfused_mlp(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                h = phi3.rms_norm(wp["post_ln"], acc, cfg.rms_eps)
                return acc + phi3._mlp(wp, h)
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    # ---- lm_head + argmax ----
    def mk_head(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                logits = phi3._lm_head(fp, acc)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.bfloat16)
                return acc + 1e-12 * nxt[None, None]
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    kv_bytes = pos * D * 2 * 2
    bounds_mb = {
        "fused_attn": (lp["qkv"]["q4"].q4.size + lp["o"]["q4"].q4.size
                       + kv_bytes) / 1e6,
        "fused_mlp": (lp["gate_up"]["q4"].q4.size
                      + lp["down"]["q4"].q4.size) / 1e6,
        "lm_head": params["lm_head"]["q4"].q4.size / 1e6,
    }
    bounds_mb["unfused_attn"] = bounds_mb["fused_attn"]
    bounds_mb["unfused_mlp"] = bounds_mb["fused_mlp"]
    peak = 819e3  # MB/s

    # single-matvec chains isolate which weight shape drags the rate
    from dynam3d_tpu.ops.pallas_int4 import int4_matmul

    def mk_gu(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                y = int4_matmul(acc[0], wp["gate_up"]["q4"],
                                out_dtype=jnp.bfloat16)
                return acc + 1e-12 * y.sum()
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    hvec0 = jnp.asarray(
        rng.normal(size=(1, 1, cfg.intermediate_size)), jnp.bfloat16
    )

    def mk_dn(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                y = int4_matmul(
                    hvec0[0] + acc[0, :, :1], wp["down"]["q4"],
                    out_dtype=jnp.bfloat16,
                )
                return acc + 1e-12 * y.sum()
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    def mk_qkv(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                y = int4_matmul(acc[0], wp["qkv"]["q4"],
                                out_dtype=jnp.bfloat16)
                return acc + 1e-12 * y.sum()
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    bounds_mb["gate_up_only"] = lp["gate_up"]["q4"].q4.size / 1e6
    bounds_mb["down_only"] = lp["down"]["q4"].q4.size / 1e6
    bounds_mb["qkv_only"] = lp["qkv"]["q4"].q4.size / 1e6

    # ---- whole-layer program (attention + MLP as one kernel) ----
    from dynam3d_tpu.ops.pallas_decode import decode_layer_ring

    def mk_ring(n):
        def f(wp, fp, kc, vc, xx):
            def body(i, acc):
                out, k_new, v_new = decode_layer_ring(
                    acc, wp["input_ln"], wp["qkv"]["q4"], wp["o"]["q4"],
                    wp["post_ln"], wp["gate_up"]["q4"], wp["down"]["q4"],
                    kc, vc, 0, pos, mask, cos, sin,
                    eps=cfg.rms_eps, heads=cfg.num_heads, hd=cfg.head_dim,
                )
                return out + 1e-12 * (k_new.sum() + v_new.sum())
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    bounds_mb["fused_ring"] = bounds_mb["fused_attn"] + bounds_mb["fused_mlp"]

    for name, mk in [
        ("fused_ring", mk_ring),
        ("fused_attn", mk_attn), ("fused_mlp", mk_mlp),
        ("unfused_attn", mk_unfused_attn), ("unfused_mlp", mk_unfused_mlp),
        ("lm_head", mk_head),
        ("gate_up_only", mk_gu), ("down_only", mk_dn), ("qkv_only", mk_qkv),
    ]:
        try:
            us = slope_us(mk)
            mb = bounds_mb[name]
            print(
                f"{name:14s}: {us:7.1f} us/call  "
                f"(bytes {mb:5.1f} MB -> bound {mb/peak*1e6:5.1f} us, "
                f"{mb/peak*1e6/max(us,1e-9)*100:4.0f}% of peak)",
                flush=True,
            )
        except Exception as e:
            print(f"{name:14s}: FAILED {type(e).__name__}: {e}", flush=True)

    # ---- one-step logits parity at full dims ----
    valid = np.zeros((1, tmax), bool)
    valid[0, :pos] = True
    valid[0, pos] = True
    valid = jnp.asarray(valid)
    e = jnp.asarray(rng.normal(size=(1, 1, D)), jnp.bfloat16)
    pp = jnp.full((1, 1), pos, jnp.int32)
    cache = phi3.KVCache(
        ck.reshape(L, 1, tmax, cfg.num_kv_heads, cfg.head_dim),
        cv.reshape(L, 1, tmax, cfg.num_kv_heads, cfg.head_dim),
    )
    flat = phi3.KVCache(ck, cv)
    lu, _ = jax.jit(
        lambda p, c, ee: phi3.decode_forward(
            p, cfg, ee, pp, c, pos, valid[:, None, :]
        )
    )(params, cache, e)
    lf, _ = jax.jit(
        lambda p, c, ee: phi3._decode_forward_fused(
            p, cfg, ee, pp, c, pos, valid
        )
    )(params, flat, e)
    lu = np.asarray(lu, np.float32)[0, 0]
    lf = np.asarray(lf, np.float32)[0, 0]
    rel = np.abs(lf - lu) / (np.abs(lu).max() + 1e-9)
    top_u = np.argsort(lu)[-5:][::-1]
    print(
        f"logits parity: max_abs {np.abs(lf-lu).max():.4f} "
        f"max_rel {rel.max():.4f} argmax {'SAME' if lu.argmax()==lf.argmax() else 'DIFF'} "
        f"top1_gap_unfused {lu[top_u[0]]-lu[top_u[1]]:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
