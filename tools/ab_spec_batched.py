"""A/B BATCHED speculative decode on hardware (greedy_decode_spec_batched).

At full Phi-3-mini dims (T=816 prompt, int4 weights), for B in {2, 4}
episodes (g = 8 // B drafts each, so B*g = 8 kernel rows per verify
pass):

  1. plain batched greedy_decode (B rows, ring kernel), 20/120-token
     chains -> ms/token slope (the per-EPISODE cost is slope, since all
     B rows decode in one kernel pass).
  2. spec_batched with DYNAM3D_SPEC_FORCE_ACCEPT (alpha=1 machinery
     throughput: every pass advances g tokens for every episode).
  3. spec_batched with no lookup (all-miss bound: first-draft-only
     acceptance, i.e. each pass advances >=1).
  4. token parity of (3) vs (1) row-wise.

The single-episode analogue is tools/ab_spec_decode.py; the batched mode
shares ONE weight stream across all B*g rows, so at alpha=1 the weight
traffic per generated token is 1/(B*g) of plain decode's.

Usage: python tools/ab_spec_batched.py     (real TPU, ~10 min warm)
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

    from dynam3d_tpu import flags as _flags
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3

    cfg = Phi3Config()
    T = int(os.environ.get("DYNAM3D_AB_PROMPT", "816"))
    rng = np.random.default_rng(0)
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    params = phi3.quantize_phi3(params, bits=4, consume=True)
    D = cfg.hidden_size

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def p50(fn, *a, reps=6):
        ts = []
        for _ in range(reps):
            t0 = time.time(); sync(fn(*a)); ts.append(time.time() - t0)
        return float(np.percentile(ts, 50) * 1e3)

    lens = [20, 120]
    for B in (2, 4):
        g = 8 // B
        embeds = jnp.asarray(
            rng.normal(scale=0.5, size=(B, T, D)), jnp.bfloat16)
        valid = np.ones((B, T), bool)
        for b in range(B):   # per-row prompt lengths differ
            valid[b, T - 9 * b - 8 : T - 9 * b] = False
        valid = jnp.asarray(valid)

        outs = {}
        per_name = {}
        for name in ("plain", "spec_forced", "spec_nolookup"):
            per = {}
            for n in lens:
                if name == "plain":
                    fn = jax.jit(lambda p, e, v, n=n: phi3.greedy_decode(
                        p, cfg, e, v, n, stop_token=-1))
                elif name == "spec_forced":
                    _flags.SPEC_FORCE_ACCEPT = True
                    fn = jax.jit(
                        lambda p, e, v, n=n: phi3.greedy_decode_spec_batched(
                            p, cfg, e, v, n, stop_token=-1))
                else:
                    _flags.SPEC_FORCE_ACCEPT = False
                    fn = jax.jit(
                        lambda p, e, v, n=n: phi3.greedy_decode_spec_batched(
                            p, cfg, e, v, n, stop_token=-1))
                t0 = time.time(); out = fn(params, embeds, valid); sync(out)
                compile_s = time.time() - t0
                per[n] = p50(fn, params, embeds, valid)
                outs[(name, n)] = np.asarray(out)
                print(f"B={B} g={g} {name} n={n}: p50 {per[n]:.1f} ms "
                      f"(compile {compile_s:.1f}s)", flush=True)
            hi, lo = max(lens), min(lens)
            slope = (per[hi] - per[lo]) / (hi - lo)
            per_name[name] = slope
            print(f"B={B} g={g} {name}: {slope:.3f} ms/token-per-episode "
                  f"(slope {lo}->{hi})", flush=True)
        _flags.SPEC_FORCE_ACCEPT = False

        for n in lens:
            diff = outs[("spec_nolookup", n)] != outs[("plain", n)]
            nd = int(diff.sum())
            where = np.argwhere(diff)[:1]
            print(f"B={B} token parity spec_nolookup vs plain n={n}: "
                  f"{'EXACT' if nd == 0 else f'{nd} differ (first at {where})'}",
                  flush=True)


if __name__ == "__main__":
    main()
