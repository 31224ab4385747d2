"""HabitatFeed body driven end-to-end against a scripted habitat_sim stub.

The real habitat-sim is host-side C++ and absent from this image, so the
adapter (runtime/habitat_feed.py, mirroring environments.py:46-243 +
nav.py:28-95) is exercised against tests/habitat_sim_stub.py — a fake
Simulator/agent/pathfinder that encodes habitat's pose conventions,
sliding collision, and deterministic pose-keyed rendering.
"""

import math

import numpy as np
import pytest

from dynam3d_tpu.runtime import habitat_feed as hf
from dynam3d_tpu.runtime.feed import STOP
from tests import habitat_sim_stub as stub


@pytest.fixture(autouse=True)
def _patch_habitat(monkeypatch):
    monkeypatch.setattr(hf, "habitat_sim", stub)


def _episode(start=(4.0, 0.0, -1.0), heading=0.0, goal=(6.5, 0.0, -6.0)):
    return {
        "start_position": list(start),
        "heading": heading,
        "goals": [{"position": list(goal)}],
        "instruction": {"instruction_text": "walk to the far corner"},
    }


def _feed(views=1, **kw):
    return hf.HabitatFeed(
        "stub_scene.glb", _episode(**kw), rgb_size=24, depth_size=16,
        views=views,
    )


def _expected_forward(start, heading, dist, amount=0.25):
    k = int(dist // amount)
    fwd = np.array([-math.sin(heading), 0.0, -math.cos(heading)])
    return np.asarray(start) + k * amount * fwd


def test_reset_shapes_and_pose():
    feed = _feed(heading=0.7)
    obs = feed.reset()
    assert obs.rgb.shape == (1, 24, 24, 3) and obs.rgb.dtype == np.uint8
    assert obs.depth.shape == (1, 16, 16)
    assert float(obs.depth.max()) <= 1.0 and float(obs.depth.min()) >= 0.0
    np.testing.assert_allclose(obs.position, [4.0, 0.0, -1.0])
    assert abs(obs.heading - 0.7) < 1e-6
    assert obs.instruction == "walk to the far corner"


def test_reset_heading_from_start_rotation():
    ep = _episode()
    del ep["heading"]
    ep["start_rotation"] = list(hf.heading_to_quat(1.1))
    feed = hf.HabitatFeed("s.glb", ep, rgb_size=8, depth_size=8)
    obs = feed.reset()
    assert abs(obs.heading - 1.1) < 1e-9


def test_step_angle_dist_semantics():
    """(angle, dist): absolute-heading turn then int(dist//0.25) forward
    steps (nav.py:28-95 MoveHighToLow + environments.py:136-138)."""
    feed = _feed()
    feed.reset()
    obs, done, info = feed.step((0.5, 0.8))  # 3 whole steps of 0.25
    assert not done
    assert abs(obs.heading - 0.5) < 1e-6
    np.testing.assert_allclose(
        obs.position, _expected_forward([4.0, 0.0, -1.0], 0.5, 0.8),
        atol=1e-5,
    )
    assert len(info["position"]) == 2 and info["collisions"] == 0
    # stub pathfinder: straight-line xz geodesic
    want = float(np.linalg.norm(
        (np.asarray(obs.position) - np.asarray([6.5, 0.0, -6.0]))[[0, 2]]
    ))
    assert abs(info["distance_to_goal"] - want) < 1e-5


def test_stop_action_terminates():
    feed = _feed()
    feed.reset()
    obs, done, info = feed.step(STOP)
    assert done
    np.testing.assert_allclose(obs.position, [4.0, 0.0, -1.0])


def test_collision_blocks_and_counts():
    """Walking straight into the interior wall: sliding leaves zero
    progress on a perpendicular hit, and the adapter counts it."""
    feed = _feed(start=(4.0, 0.0, -3.9), heading=0.0)  # faces -z, wall at z<=-4
    feed.reset()
    obs, _, info = feed.step((0.0, 0.5))
    np.testing.assert_allclose(obs.position, [4.0, 0.0, -3.9], atol=1e-6)
    assert info["collisions"] == 1


def test_collision_slides_along_wall():
    """A near-perpendicular hit slides along the unblocked axis
    (allow_sliding) but still counts as a collision (moved < step/2);
    a shallow graze that keeps most of its momentum does not count."""
    # near-perpendicular into the x=0 wall: forward ~ (-0.988, 0, -0.156)
    feed = _feed(start=(0.1, 0.0, -5.0), heading=0.0)
    feed.reset()
    obs, _, info = feed.step((0.45 * math.pi, 0.25))
    assert obs.position[0] >= 0.0          # clamped at the wall
    assert obs.position[2] < -5.0          # but slid along -z
    assert info["collisions"] == 1
    # shallow graze (45 deg): slide covers ~0.7 of the step -> not counted
    feed2 = _feed(start=(0.1, 0.0, -5.0), heading=0.0)
    feed2.reset()
    obs2, _, info2 = feed2.step((0.25 * math.pi, 0.25))
    assert obs2.position[2] < -5.0
    assert info2["collisions"] == 0


def test_cand_rpcs_save_and_restore_state():
    """cand_dist_to_goal / get_cand_real_pos simulate the candidate and
    restore the agent exactly (environments.py:120-147,180-202)."""
    feed = _feed(heading=0.3)
    feed.reset()
    before = feed._get_state()
    cand = feed.get_cand_real_pos(0.4, 1.0)
    np.testing.assert_allclose(
        cand, _expected_forward([4.0, 0.0, -1.0], 0.7, 1.0), atol=1e-5
    )
    d = feed.cand_dist_to_goal(0.4, 1.0)
    want = float(np.linalg.norm(
        (cand - np.asarray([6.5, 0.0, -6.0], np.float32))[[0, 2]]
    ))
    assert abs(d - want) < 1e-5
    after = feed._get_state()
    np.testing.assert_allclose(after.position, before.position)
    assert abs(feed._heading - 0.3) < 1e-9


def test_get_observation_pose_override_renders_and_restores():
    """Rendering at an arbitrary pose equals actually standing there (the
    stub's images are a pure function of pose), and the agent pose is
    untouched afterwards (get_observation_at, environments.py:88-96)."""
    feed = _feed(heading=0.2)
    feed.reset()
    probe_pos, probe_h = np.float32([2.0, 0.0, -6.5]), 1.9
    obs = feed.get_observation(probe_pos, probe_h)
    # ground truth: a second feed whose episode STARTS at the probe pose
    ref = _feed(start=tuple(probe_pos), heading=probe_h)
    ref_obs = ref.reset()
    np.testing.assert_array_equal(obs.rgb, ref_obs.rgb)
    np.testing.assert_allclose(obs.depth, ref_obs.depth)
    # original agent untouched
    np.testing.assert_allclose(
        feed._get_state().position, [4.0, 0.0, -1.0]
    )
    assert abs(feed._heading - 0.2) < 1e-9


def test_panorama_12_views_convention():
    """View v of the pano renders at heading + v*(-pi/6)
    (observations_by_angles, environments.py:98-113)."""
    pano = _feed(views=12, heading=0.9)
    obs = pano.reset()
    assert obs.rgb.shape == (12, 24, 24, 3)
    assert obs.depth.shape == (12, 16, 16)
    for v in (0, 3, 7):
        single = _feed(heading=(0.9 - v * math.pi / 6.0) % (2 * math.pi))
        sv = single.reset()
        np.testing.assert_array_equal(obs.rgb[v], sv.rgb[0])
    # pano render restores the agent's own heading
    assert abs(pano._heading - 0.9) < 1e-9


def test_depth_normalized_by_far_plane():
    feed = hf.HabitatFeed(
        "s.glb", _episode(), rgb_size=8, depth_size=8, max_depth=10.0
    )
    obs = feed.reset()
    # stub depths are uniform [0, 12): clipping at far plane must engage
    assert float(obs.depth.max()) == 1.0
    assert float(obs.depth.min()) >= 0.0


def test_feeds_from_episode_file(tmp_path):
    import json

    eps = {
        "episodes": [
            {
                "episode_id": i,
                "scene_id": "sceneA/sceneA.glb",
                "start_position": [4.0, 0.0, -1.0],
                "start_rotation": list(hf.heading_to_quat(0.4)),
                "instruction": {"instruction_text": f"episode {i}"},
                "reference_path": [[4.0, 0.0, -1.0], [6.0, 0.0, -5.0]],
                "goals": [{"position": [6.0, 0.0, -5.0]}],
            }
            for i in range(2)
        ]
    }
    p = tmp_path / "val_seen.json"
    p.write_text(json.dumps(eps))
    feeds = hf.feeds_from_episode_file(
        str(p), str(tmp_path), rgb_size=8, depth_size=8
    )
    assert len(feeds) == 2
    obs = feeds[1].reset()
    assert obs.instruction == "episode 1"
    assert abs(obs.heading - 0.4) < 1e-9
    for f in feeds:
        f.close()
        assert f._sim.closed


def test_close_closes_simulator():
    feed = _feed()
    feed.close()
    assert feed._sim.closed
