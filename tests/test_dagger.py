"""Tests for DAgger trajectory collection + replay."""

import numpy as np
import pytest

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.runtime.dagger import collect_trajectories, iterate_store
from dynam3d_tpu.runtime.feed import SyntheticRoomFeed


def test_collect_and_replay(tmp_path):
    try:
        import dynam3d_tpu.native  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native unavailable: {e}")
    cfg = Dynam3DConfig()
    path = str(tmp_path / "traj.bin")
    n = collect_trajectories(
        cfg,
        lambda: SyntheticRoomFeed(rgb_size=32, depth_size=16, views=1),
        path,
        episodes=2,
        max_steps=5,
    )
    assert n >= 2
    seen = 0
    for (rgb, depth, pos, heading, gt), meta in iterate_store(path):
        assert rgb.shape == (1, 32, 32, 3)
        assert depth.shape == (1, 16, 16)
        assert pos.shape == (3,)
        assert gt.endswith("<|end|>")
        assert meta["instruction"]
        seen += 1
    assert seen == n
    # the teacher converges: last stored step of an episode is stop or move
    assert any("stop" in s or "move" in s for s in [gt])
