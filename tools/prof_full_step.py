"""True device-side cost of ONE fused full step, via an in-program chain.

The bench headline subtracts one measured tunnel RTT from the overlapped
p50 (`device_step_ms = p50 - rtt_p50`), but a closed loop may pay MORE
than one transport round-trip per step (dispatch command + result fetch),
in which case that estimate overstates the on-device time.  This tool
removes transport entirely: N full steps run inside ONE jitted
``lax.scan`` — memory state threaded, a DIFFERENT pre-staged frame per
step (so the 3D memory and the generation drift exactly like the closed
loop), each step's generation priming the next step's spec drafts (the
production EpisodeRunner wiring).  The (t_N2 - t_N1)/(N2 - N1) slope is
the pure device step; comparing it to the bench's ``device_step_ms``
splits the headline into device work vs transport.

Run (on the chip): python tools/prof_full_step.py [--n1 4 --n2 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n1", type=int, default=4)
    p.add_argument("--n2", type=int, default=10)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--scale", default="full", choices=("full", "tiny"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.vlm.phi3 import quantize_phi3
    from dynam3d_tpu.runtime.episode import EpisodeRunner
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

    cfg = bench._config(args.scale)
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    params["llava"]["phi3"] = quantize_phi3(
        params["llava"]["phi3"], bits=4, consume=True
    )
    runner = EpisodeRunner(params, cfg)
    splice = runner.splice_start
    new_tok = cfg.llava.max_new_tokens

    # pre-stage n2 DISTINCT frames (the feed walking the room), uploaded
    # once — inside the chain each step consumes frame i, so the memory
    # tables grow and the generation drifts like the real loop
    feed = SyntheticRoomFeed(
        rgb_size=cfg.clip.image_size,
        depth_size=256 if args.scale == "full" else 32, views=1,
    )
    obs = feed.reset()
    frames = []
    for _ in range(args.n2):
        frames.append((obs.rgb, np.asarray(obs.depth, np.float32),
                       np.asarray(obs.position, np.float32),
                       np.float32(obs.heading)))
        obs, _, _ = feed.step((0.1, 0.25))
    # obs.rgb/depth already carry the leading views dim -> [N,V,...]
    rgb = jnp.asarray(np.stack([f[0] for f in frames]))
    depth = jnp.asarray(np.stack([f[1] for f in frames]))
    pos = jnp.asarray(np.stack([f[2] for f in frames]))
    hd = jnp.asarray(np.stack([f[3] for f in frames]))
    ids, tvalid, _ = runner._prompt_ids([obs.instruction], [["none\n"] * 4])

    def chain(n):
        def f(p, st0, rgb, depth, pos, hd, ids, tv):
            def body(carry, xs):
                st, pg = carry
                r, d, po, h = xs
                st, gen = policy_mod.full_step(
                    p, cfg, st, r[None], d[None], po[None], h[None],
                    ids, tv, splice, prev_gen=pg,
                )
                return (st, gen), gen[0, 0]
            (st, _), toks = jax.lax.scan(
                body,
                (st0, jnp.full((1, new_tok), -1, jnp.int32)),
                (rgb[:n], depth[:n], pos[:n], hd[:n]),
            )
            return toks
        return jax.jit(f)

    st0 = policy_mod.batched_init_state(cfg, 1)
    f1, f2 = chain(args.n1), chain(args.n2)

    def run(f):
        out = f(params, st0, rgb, depth, pos, hd, ids, tvalid)
        np.asarray(out.ravel()[:1])
        return out

    t0 = time.time()
    run(f1)
    c1 = time.time() - t0
    t0 = time.time()
    run(f2)
    c2 = time.time() - t0

    t1s, t2s = [], []
    for _ in range(args.reps):
        t0 = time.time()
        run(f1)
        t1s.append(time.time() - t0)
        t0 = time.time()
        run(f2)
        t2s.append(time.time() - t0)
    t1 = float(np.median(t1s))
    t2 = float(np.median(t2s))
    slope_ms = (t2 - t1) / (args.n2 - args.n1) * 1e3
    print(json.dumps({
        "metric": "device_full_step_chain_ms",
        "value": round(slope_ms, 2),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "baseline": "chain-slope (transport-free)",
            "n1": args.n1, "n2": args.n2, "reps": args.reps,
            "t_n1_ms": round(t1 * 1e3, 1), "t_n2_ms": round(t2 * 1e3, 1),
            "compile_s": round(c1 + c2, 1),
            "backend": jax.default_backend(),
            "scale": args.scale,
        },
    }))


if __name__ == "__main__":
    main()
