"""Tests for metrics (nDTW/SPL/etc.) and the native C++ components."""

import numpy as np
import pytest

from dynam3d_tpu.runtime.metrics import (
    aggregate,
    dedup_path,
    episode_metrics,
    euclidean_dtw,
    ndtw,
    shard_episodes,
)


def _py_dtw(pred, gt):
    n, m = len(pred), len(gt)
    d = np.linalg.norm(pred[:, None] - gt[None, :], axis=-1)
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            acc[i, j] = d[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i - 1, j - 1], acc[i, j - 1]
            )
    return acc[n, m]


def test_dtw_identical_paths_zero():
    p = np.random.default_rng(0).normal(size=(10, 3))
    assert euclidean_dtw(p, p) < 1e-9
    assert abs(ndtw(p, p) - 1.0) < 1e-9


def test_dtw_matches_reference_dp():
    rng = np.random.default_rng(1)
    p = rng.normal(size=(13, 3))
    g = rng.normal(size=(9, 3))
    np.testing.assert_allclose(euclidean_dtw(p, g), _py_dtw(p, g), rtol=1e-9)


def test_native_dtw_if_buildable():
    try:
        from dynam3d_tpu.native import dtw_native
        rng = np.random.default_rng(2)
        p = rng.normal(size=(20, 3))
        g = rng.normal(size=(15, 3))
        np.testing.assert_allclose(dtw_native(p, g), _py_dtw(p, g), rtol=1e-9)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


def test_episode_metrics_success_case():
    path = np.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    dists = np.asarray([2.5, 1.5, 0.5], np.float32)
    gt = path.copy()
    m = episode_metrics(path, dists, gt, steps_taken=3, collisions=1)
    assert m["success"] == 1.0 and m["oracle_success"] == 1.0
    np.testing.assert_allclose(m["path_length"], 2.0)
    np.testing.assert_allclose(m["spl"], 1.0)  # gt_length 2.5 <= path 2.0 -> capped
    assert abs(m["ndtw"] - 1.0) < 1e-6
    assert m["sdtw"] == m["ndtw"]
    np.testing.assert_allclose(m["collisions"], 1 / 3)


def test_episode_metrics_failure_case():
    path = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
    dists = np.asarray([8.0, 7.0], np.float32)
    gt = np.asarray([[0, 0, 0], [5, 0, 0]], np.float32)
    m = episode_metrics(path, dists, gt, steps_taken=2)
    assert m["success"] == 0.0 and m["sdtw"] == 0.0
    assert 0 < m["ndtw"] < 1


def test_aggregate_and_shard():
    eps = [{"success": 1.0, "spl": 0.5}, {"success": 0.0, "spl": 0.0}]
    agg = aggregate(eps)
    assert agg == {"success": 0.5, "spl": 0.25}
    ids = list(range(10))
    assert shard_episodes(ids, 0, 3) == [0, 3, 6, 9]
    assert shard_episodes(ids, 2, 3) == [2, 5, 8]


def test_dedup_path():
    pos = [[0, 0, 0], [0, 0, 0], [1, 0, 0], [1, 0, 0], [2, 0, 0]]
    hds = [0.0, 0.1, 0.2, 0.3, 0.4]
    out = dedup_path(pos, hds)
    assert [p["position"] for p in out] == [[0, 0, 0], [1, 0, 0], [2, 0, 0]]
    assert out[-1]["stop"] and not out[0]["stop"]


def test_episode_store_roundtrip(tmp_path):
    try:
        from dynam3d_tpu.native import EpisodeStore, write_episode_store
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(0)
    steps = [rng.integers(0, 255, 1024, dtype=np.uint8).tobytes() for _ in range(5)]
    path = str(tmp_path / "ep.bin")
    write_episode_store(path, steps, {"views": 1, "note": "test"})
    store = EpisodeStore(path)
    assert store.n_steps == 5 and store.step_bytes == 1024
    assert store.meta["views"] == 1
    for t in range(5):
        assert store.read(t) == steps[t]
    store.close()
