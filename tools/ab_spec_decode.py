"""A/B speculative decode on hardware: verify-pass cost + e2e spec runs.

Measures, at full Phi-3-mini dims (T=816 prompt, int4 weights):

  1. verify-pass cost: k-row decode_forward pass chains (slope 8->32
     passes) for k in {1, 4, 8} — decode is weight-stream-bound, so the
     pass cost should be ~flat in k; the ratio to the plain fused decode
     step is the speculation overhead factor.
  2. e2e greedy_decode_spec with a PLANTED continuation (the 100%%-
     acceptance upper bound) vs plain greedy_decode, 20 and 120 token
     chains; plus spec with NO lookup (the all-miss overhead bound).

Usage: python tools/ab_spec_decode.py     (real TPU, ~10 min warm)
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

    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3

    cfg = Phi3Config()
    T = int(os.environ.get("DYNAM3D_AB_PROMPT", "816"))
    rng = np.random.default_rng(0)
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    params = phi3.quantize_phi3(params, bits=4, consume=True)

    D = cfg.hidden_size
    embeds = jnp.asarray(rng.normal(scale=0.5, size=(1, T, D)), jnp.bfloat16)
    valid = np.ones((1, T), bool)
    valid[0, 700:708] = False
    valid = jnp.asarray(valid)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def p50(fn, *a, reps=6):
        ts = []
        for _ in range(reps):
            t0 = time.time(); sync(fn(*a)); ts.append(time.time() - t0)
        return float(np.percentile(ts, 50) * 1e3)

    # ---- 1. verify-pass cost vs k (chained passes, slope cancels RTT) ----
    n1, n2 = 8, 32
    total = T + n2 * 8 + 16   # room for every pass's k rows (no clamped writes)
    for k in (1, 4, 8):
        def chain(n, k=k):
            def f(p, e, v):
                cache = phi3.init_cache(cfg, 1, total, dtype=e.dtype)
                positions = jnp.maximum(
                    jnp.cumsum(v.astype(jnp.int32), 1) - 1, 0)
                mask = phi3.prefill_mask(v, total)
                _, cache = phi3.forward(
                    p, cfg, e, positions, cache, 0, mask,
                    lm_at=jnp.sum(v.astype(jnp.int32), 1) - 1)
                vv = jnp.concatenate(
                    [v, jnp.zeros((1, total - T), bool)], 1)
                t_iota = jnp.arange(total)
                kk = jnp.arange(k)

                def body(i, carry):
                    ckv, acc = carry
                    e1 = jnp.broadcast_to(
                        acc.reshape(1, 1, D), (1, k, D)).astype(jnp.bfloat16)
                    pos = (jnp.sum(v) + i * k + kk)[None]
                    wslot = T + i * k
                    row_extra = (t_iota[None] >= wslot) & (
                        t_iota[None] <= wslot + kk[:, None])
                    m = vv[:, None, :] | row_extra[None]
                    lg, c2 = phi3.decode_forward(
                        p, cfg, e1, pos, phi3.KVCache(*ckv), wslot, m)
                    return (c2.k, c2.v), acc + 1e-9 * lg[0, -1, :D]
                (_, acc) = jax.lax.fori_loop(
                    0, n, body, ((cache.k, cache.v),
                                 jnp.zeros((D,), jnp.float32)))
                return acc
            return jax.jit(f)

        f1, f2 = chain(n1), chain(n2)
        sync(f1(params, embeds, valid)); sync(f2(params, embeds, valid))
        t1 = p50(f1, params, embeds, valid)
        t2 = p50(f2, params, embeds, valid)
        ms = (t2 - t1) / (n2 - n1)
        print(f"verify pass k={k}: {ms:.3f} ms/pass "
              f"({ms / max(k, 1):.3f} ms/token at full acceptance)",
              flush=True)

    # ---- 2. e2e spec vs plain greedy ----
    from dynam3d_tpu import flags as _flags

    lens = [20, 120]
    outs = {}
    for name in ("plain", "spec_planted", "spec_nolookup", "spec_forced"):
        per = {}
        for n in lens:
            if name == "plain":
                fn = jax.jit(lambda p, e, v, n=n: phi3.greedy_decode(
                    p, cfg, e, v, n, stop_token=-1))
                args = (params, embeds, valid)
            elif name == "spec_forced":
                # alpha=1 machinery throughput (flags.SPEC_FORCE_ACCEPT):
                # same compute path, accept decision overridden
                _flags.SPEC_FORCE_ACCEPT = True
                fn = jax.jit(lambda p, e, v, n=n: phi3.greedy_decode_spec(
                    p, cfg, e, v, n, stop_token=-1))
                args = (params, embeds, valid)
            elif name == "spec_nolookup":
                fn = jax.jit(lambda p, e, v, n=n: phi3.greedy_decode_spec(
                    p, cfg, e, v, n, stop_token=-1))
                args = (params, embeds, valid)
            else:
                # plant spec's OWN output (one throwaway run): on random
                # weights the fused plain path and the unfused verify path
                # diverge by accumulation-order argmax flips, so planting
                # the plain stream would never match.  Self-planting
                # measures the full-acceptance regime honestly.
                pre = jax.jit(
                    lambda p, e, v, n=n: phi3.greedy_decode_spec(
                        p, cfg, e, v, n, stop_token=-1))
                ref = np.asarray(pre(params, embeds, valid))[0]
                lk = np.full((n + 16,), -1, np.int32)
                lk[4 : 4 + n] = ref
                fn = jax.jit(
                    lambda p, e, v, l, n=n: phi3.greedy_decode_spec(
                        p, cfg, e, v, n, stop_token=-1, lookup_ids=l))
                args = (params, embeds, valid, jnp.asarray(lk))
            t0 = time.time(); out = fn(*args); sync(out)
            compile_s = time.time() - t0
            per[n] = p50(fn, *args)
            outs[(name, n)] = np.asarray(out)[0]
            print(f"{name} n={n}: p50 {per[n]:.1f} ms "
                  f"(compile {compile_s:.1f}s)", flush=True)
        if len(per) == 2:
            hi, lo = max(lens), min(lens)
            print(f"{name}: {(per[hi] - per[lo]) / (hi - lo):.3f} ms/token "
                  f"(slope {lo}->{hi})", flush=True)

    _flags.SPEC_FORCE_ACCEPT = False
    for n in lens:
        for name in ("spec_planted", "spec_nolookup"):
            if (name, n) in outs:
                diff = outs[(name, n)] != outs[("plain", n)]
                nd = int(diff.sum())
                first = int(np.argmax(diff)) if nd else -1
                print(f"token parity {name} vs plain n={n}: "
                      f"{'EXACT' if nd == 0 else f'{nd} differ (first at {first})'}",
                      flush=True)


if __name__ == "__main__":
    main()
