"""Build the committed golden episode fixtures (tests/fixtures/*.npz).

Two recorded episodes drive RecordedEpisodeFeed through the full eval
pipeline in tests (SURVEY.md §4 golden-trace harness; VERDICT r1 item 9):

  - ``golden_box_ep.npz``     — convex SyntheticRoomFeed room
  - ``golden_floorplan_ep.npz`` — non-convex FloorplanFeed apartment where
    the teacher must route through a doorway (geodesic != euclidean)

Deterministic: greedy teacher over the oracle candidate fan, fixed seeds.
Re-run this script only when the feed geometry changes; tests pin the
recorded trajectories' metrics as golden values.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dynam3d_tpu.runtime.feed import STOP, FloorplanFeed, SyntheticRoomFeed  # noqa: E402
from record_episodes import record  # noqa: E402


def greedy_teacher(feed):
    cands = [
        (a, d)
        for a in np.linspace(0, 2 * np.pi, 12, endpoint=False)
        for d in (0.25, 0.75, 1.5)
    ]

    def teacher(obs, t):
        if feed.oracle_distance() < 1.0:
            return STOP
        dists = [feed.cand_dist_to_goal(a, d) for a, d in cands]
        return cands[int(np.argmin(dists))]

    return teacher


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(out, exist_ok=True)

    box = SyntheticRoomFeed(rgb_size=56, depth_size=32, seed=11)
    n = record(box, greedy_teacher(box), 12, os.path.join(out, "golden_box_ep.npz"))
    print(f"golden_box_ep: {n} steps")

    flo = FloorplanFeed(rgb_size=56, depth_size=32, seed=12)
    n = record(
        flo, greedy_teacher(flo), 24, os.path.join(out, "golden_floorplan_ep.npz")
    )
    print(f"golden_floorplan_ep: {n} steps, final geodesic "
          f"{flo.oracle_distance():.2f} m")


if __name__ == "__main__":
    main()
