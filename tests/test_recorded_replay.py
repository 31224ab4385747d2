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
