"""Record feed episodes to npz for RecordedEpisodeFeed golden-trace replay.

The SURVEY.md §4 test strategy: capture posed RGB-D observations per step so
parity runs need no simulator.  Works with any Feed provider (the Habitat
adapter on a GPU host records real R2R-CE episodes; the synthetic feed
records procedural ones for CI).

Usage:
    python tools/record_episodes.py --out data/episodes --episodes 3
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def record(feed, policy_fn, max_steps: int, out_path: str) -> int:
    """Roll one episode, record per-step observations, save npz.

    ``policy_fn(obs, t) -> action`` decides the motion (e.g. a teacher).
    """
    obs = feed.reset()
    rgbs, depths, poss, hds = [], [], [], []
    for t in range(max_steps):
        rgbs.append(obs.rgb)
        depths.append(obs.depth)
        poss.append(obs.position)
        hds.append(obs.heading)
        action = policy_fn(obs, t)
        obs, done, _ = feed.step(action)
        if done:
            break
    extra = {}
    if getattr(feed, "goal", None) is not None:
        extra["goal"] = np.asarray(feed.goal, np.float32)
    np.savez_compressed(
        out_path,
        rgb=np.stack(rgbs),
        depth=np.stack(depths),
        position=np.stack(poss),
        heading=np.asarray(hds, np.float32),
        instruction=obs.instruction,
        gt_locations=np.stack(poss),
        **extra,
    )
    return len(rgbs)


def main(argv=None):
    from dynam3d_tpu.runtime.feed import STOP, SyntheticRoomFeed

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/episodes")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--max-steps", type=int, default=10)
    p.add_argument("--rgb-size", type=int, default=336)
    p.add_argument("--depth-size", type=int, default=256)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    for e in range(args.episodes):
        feed = SyntheticRoomFeed(
            rgb_size=args.rgb_size, depth_size=args.depth_size, seed=e
        )

        def teacher(obs, t):
            # greedy teacher: pick the best of a candidate fan
            cands = [(a, d) for a in np.linspace(0, 2 * np.pi, 12, endpoint=False)
                     for d in (0.25, 0.75, 1.5)]
            dists = [feed.cand_dist_to_goal(a, d) for a, d in cands]
            if feed.oracle_distance() < 1.5:
                return STOP
            return cands[int(np.argmin(dists))]

        n = record(feed, teacher, args.max_steps, os.path.join(args.out, f"ep{e}.npz"))
        print(f"episode {e}: {n} steps -> {args.out}/ep{e}.npz")


if __name__ == "__main__":
    main()
