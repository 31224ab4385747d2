"""A/B the fused decode-attention kernel against the unfused int4 path.

Measures pure-LLM greedy decode at full Phi-3-mini dims on the real chip
using the chain-slope method (20-token vs 5-token decode; the slope cancels
tunnel RTT, prefill, and cache-init), and checks one-step logits/token
parity between the two paths.

Usage:  python tools/ab_fused_decode.py            # both paths + parity
        DYNAM3D_AB_TOKENS=20,5 python tools/...    # custom chain lengths
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

    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynam3d_tpu import flags
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.models.vlm import phi3

    cfg = Phi3Config()
    T = int(os.environ.get("DYNAM3D_AB_PROMPT", "816"))
    B = int(os.environ.get("DYNAM3D_AB_BATCH", "1"))
    lens = [
        int(x) for x in os.environ.get("DYNAM3D_AB_TOKENS", "20,5").split(",")
    ]
    if len(set(lens)) < 2:
        raise SystemExit("DYNAM3D_AB_TOKENS needs two distinct chain lengths")

    rng = np.random.default_rng(0)
    params = phi3.init_phi3_params(jax.random.PRNGKey(0), cfg)
    params = phi3.quantize_phi3(params, bits=4, consume=True)

    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(B, T, cfg.hidden_size)), jnp.bfloat16
    )
    valid = np.ones((B, T), bool)
    valid[0, 700:708] = False  # padding holes exercise the mask path
    for b in range(1, B):      # rows with different prompt lengths
        valid[b, T - 60 * b :] = False
    valid = jnp.asarray(valid)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    results = {}
    tokens = {}
    # three-way: unfused XLA chain / split (attn program + MLP program) /
    # ring (one whole-layer program per layer; the deleted grid-pipelined
    # "layer" variant measured neutral — BENCH_NOTES round 3)
    configs = [
        ("unfused", False, False),
        ("split", True, False),
        ("ring", True, True),
    ]
    only = os.environ.get("DYNAM3D_AB_ONLY")
    if only:
        # the unfused control rides along for the slope comparison unless
        # explicitly dropped (DYNAM3D_AB_NO_CONTROL=1 — e.g. the B=4 batched
        # chain, whose unfused control hit a >80-min compile-server stall)
        keep = set(only.split(","))
        if os.environ.get("DYNAM3D_AB_NO_CONTROL") != "1":
            keep |= {"unfused"}
        configs = [c for c in configs if c[0] in keep]
    if B > 1:
        # the split path caps at batch == 1 — at B > 1 it would silently
        # fall back to the unfused path and report mislabeled numbers
        dropped = [c[0] for c in configs if c[0] == "split"]
        if dropped:
            print(f"B={B}: dropping ineligible configs {dropped}", flush=True)
        configs = [c for c in configs if c[0] != "split"]
    for name, attn_on, ring_on in configs:
        flags.FUSED_DECODE_ATTN = attn_on
        flags.FUSED_DECODE_RING = ring_on
        per_len = {}
        for n in lens:
            # params MUST be an argument: closing over them bakes gigabytes
            # of constants into lowering (takes tens of minutes).
            # stop_token=-1 (unreachable) disables greedy_decode's early-exit
            # while_loop: under random weights one path can emit the real stop
            # token a few steps in, which truncates the chain and makes the
            # slope nonsense (a measured 0.411 "ms/token" artifact).
            fn = jax.jit(
                lambda p, e, v, n=n: phi3.greedy_decode(
                    p, cfg, e, v, n, stop_token=-1
                )
            )
            t0 = time.time()
            out = fn(params, embeds, valid)
            sync(out)
            compile_s = time.time() - t0
            ts = []
            for _ in range(6):
                t0 = time.time()
                out = fn(params, embeds, valid)
                sync(out)
                ts.append(time.time() - t0)
            per_len[n] = float(np.percentile(ts, 50))
            print(
                f"{name} n={n}: p50 {per_len[n]*1e3:.1f} ms "
                f"(compile {compile_s:.1f}s)", flush=True,
            )
            if n == max(lens):
                tokens[name] = np.asarray(out)[0]
        hi, lo = max(lens), min(lens)
        slope = (per_len[hi] - per_len[lo]) / (hi - lo) * 1e3
        results[name] = slope
        print(f"{name}: {slope:.3f} ms/token (slope {lo}->{hi})", flush=True)

    for name in tokens:
        if name == "unfused" or "unfused" not in tokens:
            continue
        n_diff = int((tokens[name] != tokens["unfused"]).sum())
        d = "EXACT" if n_diff == 0 else f"{n_diff} tokens differ"
        print(f"token parity {name} vs unfused: {d}", flush=True)
    print(
        " | ".join(f"{name} {results[name]:.3f} ms/tok" for name in results),
        flush=True,
    )


if __name__ == "__main__":
    main()
