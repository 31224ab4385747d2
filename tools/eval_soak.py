"""Round-5 on-chip eval soak (VERDICT r4 item 8): >=20 full episodes through
``vln_loop.evaluate`` — the thing base_il_trainer.py:774-889 exists to do —
exercising the prefill bucket-recompile ladder, episode termination/replace,
rank-sharded aggregation, and the stats_ep/stats json artifacts at realistic
scale in one shot.

Feeds are a seed-varied mix of FloorplanFeed (geodesic oracle) and
SyntheticRoomFeed; weights default to random-init full dims (pass
--converted to run the converter-runway checkpoint instead); decode runs the
production serving config (int4 + speculative).

Run (on the chip):
    python tools/eval_soak.py --out runs/eval_soak_r05 [--episodes 20]
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
    p.add_argument("--out", required=True)
    p.add_argument("--episodes", type=int, default=20)
    p.add_argument("--scale", default="full", choices=("full", "tiny"))
    p.add_argument("--quant-bits", type=int, default=4)
    p.add_argument("--converted", default=None,
                   help="orbax ckpt of converted reference weights "
                        "(tools/parity_run.py --save-converted)")
    p.add_argument("--world", type=int, default=1,
                   help="shard episodes as rank 0 of N (exercises "
                        "shard_episodes at N>1)")
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime import vln_loop
    from dynam3d_tpu.runtime.feed import FloorplanFeed, SyntheticRoomFeed

    cfg = bench._config(args.scale)
    if args.converted:
        from dynam3d_tpu.runtime.checkpoint import load_checkpoint

        payload = load_checkpoint(args.converted)
        params = payload["params"] if "params" in payload else payload
        weights = args.converted
    else:
        params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
        weights = "random-init"
    if args.quant_bits:
        from dynam3d_tpu.models.vlm.phi3 import quantize_phi3

        params["llava"]["phi3"] = quantize_phi3(
            params["llava"]["phi3"], bits=args.quant_bits, consume=True
        )

    depth_size = 256 if args.scale == "full" else 32
    feeds, gt_paths = [], []
    for i in range(args.episodes):
        if i % 2 == 0:
            f = FloorplanFeed(rgb_size=cfg.clip.image_size,
                              depth_size=depth_size, seed=i)
        else:
            f = SyntheticRoomFeed(rgb_size=cfg.clip.image_size,
                                  depth_size=depth_size, seed=i,
                                  goal=(4.0 + (i % 5), 5.0 + (i % 3)))
        o = f.reset()
        feeds.append(f)
        # straight-line gt locations (start -> goal): the metric inputs the
        # reference reads from {split}_gt.json.gz (measures.py:266-333)
        start = np.asarray(o.position, np.float32)
        goal = np.asarray(f.goal, np.float32)
        gt_paths.append(np.stack(
            [start + t * (goal - start) for t in np.linspace(0, 1, 8)]
        ))

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    # ignore_stop: random weights decode to unparseable/stop text almost
    # immediately; the soak's purpose is full-trajectory machinery coverage
    agg = vln_loop.evaluate(
        params, cfg, feeds, gt_paths, out_dir=args.out,
        ckpt_name="soak_r05", rank=0, world=args.world, ignore_stop=True,
    )
    wall = time.time() - t0
    report = {
        "backend": jax.default_backend(),
        "scale": args.scale,
        "weights": weights,
        "quant_bits": args.quant_bits,
        "episodes": args.episodes,
        "world": args.world,
        "wall_s": round(wall, 1),
        "s_per_episode": round(wall / max(args.episodes, 1), 2),
        "metrics": agg,
    }
    with open(os.path.join(args.out, "soak_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
