"""VectorFeedPool: forked feed workers behind the Feed protocol."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from dynam3d_tpu.runtime.feed import STOP, FloorplanFeed, SyntheticRoomFeed
from dynam3d_tpu.runtime.vector_feed import VectorFeedPool


def test_pool_matches_inprocess_feeds():
    """Batched reset/step through workers == the same feeds run in-process."""
    factories = [
        functools.partial(SyntheticRoomFeed, rgb_size=32, depth_size=16, seed=1),
        functools.partial(SyntheticRoomFeed, rgb_size=32, depth_size=16, seed=2),
        functools.partial(FloorplanFeed, rgb_size=32, depth_size=16),
    ]
    local = [f() for f in factories]
    with VectorFeedPool(factories) as pool:
        obs_p = pool.reset()
        obs_l = [f.reset() for f in local]
        for op, ol in zip(obs_p, obs_l):
            np.testing.assert_array_equal(op.rgb, ol.rgb)
            np.testing.assert_allclose(op.depth, ol.depth)
        acts = [(0.3, 0.5), (1.2, 0.25), (0.0, 0.75)]
        out_p = pool.step(acts)
        out_l = [f.step(a) for f, a in zip(local, acts)]
        for (op, dp, ip), (ol, dl, il) in zip(out_p, out_l):
            np.testing.assert_allclose(op.position, ol.position)
            assert dp == dl
            np.testing.assert_allclose(
                ip["distance_to_goal"], il["distance_to_goal"]
            )


def test_proxy_oracle_rpcs():
    """Per-index proxies answer the oracle RPCs like a local feed."""
    with VectorFeedPool(
        [functools.partial(SyntheticRoomFeed, rgb_size=32, depth_size=16, seed=5)]
    ) as pool:
        proxy = pool.feeds[0]
        local = SyntheticRoomFeed(rgb_size=32, depth_size=16, seed=5)
        proxy.reset()
        local.reset()
        np.testing.assert_allclose(
            proxy.cand_dist_to_goal(0.5, 0.75),
            local.cand_dist_to_goal(0.5, 0.75),
        )
        np.testing.assert_allclose(
            proxy.get_cand_real_pos(0.5, 0.75),
            local.get_cand_real_pos(0.5, 0.75),
        )
        o_p = proxy.get_observation(np.float32([3, 1.25, 3]), 0.7)
        o_l = local.get_observation(np.float32([3, 1.25, 3]), 0.7)
        np.testing.assert_array_equal(o_p.rgb, o_l.rgb)


def test_worker_error_surfaces():
    """Unknown names raise AttributeError at ACCESS time (the proxy probes
    the worker), so getattr(feed, name, default) semantics match a local
    feed; real method errors still surface as RuntimeError at call time."""
    import pytest

    with VectorFeedPool(
        [functools.partial(SyntheticRoomFeed, rgb_size=16, depth_size=8)]
    ) as pool:
        with pytest.raises(AttributeError):
            pool.feeds[0].no_such_method
        assert getattr(pool.feeds[0], "no_such_attr", None) is None
        with pytest.raises(RuntimeError, match="TypeError"):
            pool.feeds[0].step()  # missing required action argument


def test_proxy_data_attributes_fetch_values():
    """Data attributes of the live feed come back by VALUE (not as truthy
    RPC callables): goal / instruction on the worker-held feed equal the
    local feed's, and re-fetch after reset."""
    with VectorFeedPool(
        [functools.partial(SyntheticRoomFeed, rgb_size=16, depth_size=8, seed=3)]
    ) as pool:
        proxy = pool.feeds[0]
        local = SyntheticRoomFeed(rgb_size=16, depth_size=8, seed=3)
        proxy.reset(), local.reset()
        assert isinstance(proxy.instruction, str)
        assert proxy.instruction == local.instruction
        np.testing.assert_allclose(proxy.goal, local.goal)
        # methods stay callable through the same lookup path
        assert callable(proxy.cand_dist_to_goal)


def test_pool_drains_responses_after_worker_failure():
    """A failing worker mid-collect must not desync the other pipes: the
    pool drains every dispatched response before raising, so later RPCs on
    healthy workers still see fresh (not stale off-by-one) replies."""
    import pytest

    with VectorFeedPool(
        [
            functools.partial(SyntheticRoomFeed, rgb_size=16, depth_size=8, seed=0),
            functools.partial(SyntheticRoomFeed, rgb_size=16, depth_size=8, seed=1),
        ]
    ) as pool:
        pool.reset()
        # worker 0 fails (bad action arity), worker 1 succeeds; both
        # responses must be consumed
        with pytest.raises(RuntimeError, match="feed worker 0"):
            pool.call("step", [(), ((0.1, 0.25),)])
        # the pool is still usable and in sync afterwards
        out = pool.step([(0.2, 0.25), (0.3, 0.25)])
        local = SyntheticRoomFeed(rgb_size=16, depth_size=8, seed=1)
        local.reset()
        local.step((0.1, 0.25))
        obs_l, _, _ = local.step((0.3, 0.25))
        np.testing.assert_allclose(out[1][0].position, obs_l.position)


def test_episode_runner_over_pool():
    """EpisodeRunner drives pooled proxies unchanged (the VectorEnv role)."""
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime.episode import EpisodeRunner
    from tests.test_e2e_slice import tiny_config

    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(0), cfg, llm_dtype=jnp.float32
    )
    runner = EpisodeRunner(params, cfg)
    with VectorFeedPool(
        [
            functools.partial(SyntheticRoomFeed, rgb_size=56, depth_size=32, seed=0),
            functools.partial(SyntheticRoomFeed, rgb_size=56, depth_size=32, seed=1),
        ]
    ) as pool:
        res = runner.run(pool.feeds, max_steps=2)
    assert len(res) == 2
    assert all(r is not None and r["steps"] >= 1 for r in res)


def test_habitat_feed_import_gate_and_helpers():
    """HabitatFeed ships as code but habitat-sim is absent in this image:
    construction raises an actionable ImportError, and the pure-python
    pose-math helpers (the reference's quaternion conventions,
    environments.py:18-24,132) round-trip."""
    import pytest

    from dynam3d_tpu.runtime import habitat_feed as hf

    assert hf.habitat_sim is None  # not installed in the TPU image
    with pytest.raises(ImportError, match="habitat-sim"):
        hf.HabitatFeed("scene.glb", {"goals": [{"position": [0, 0, 0]}]})
    for heading in (0.0, 0.7, np.pi, 5.1):
        q = hf.heading_to_quat(heading)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-12)
        np.testing.assert_allclose(
            hf.quat_to_heading(q), heading % (2 * np.pi), atol=1e-9
        )
