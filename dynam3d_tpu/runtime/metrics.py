"""VLN-CE episode metrics.

Host-side ports of the reference's measure classes
(habitat_extensions/measures.py) and the trainer-side recomputation
(ss_trainer_Dynam3D.py:725-749): steps_taken, distance_to_goal (NE), success
(SR@3m), oracle_success (OSR), path_length, collision rate, SPL, nDTW, SDTW.

nDTW = exp(-DTW(pred, gt) / (len(gt) * 3.0)) (measures.py:320-333).  The
reference computes DTW with the *approximate* ``fastdtw`` package; this build
uses exact O(nm) DTW (paths are <= 500 poses, trivial on host; a C++ kernel
in native/ accelerates long batches).  Exact DTW <= fastdtw's approximation,
so reported nDTW is >= the reference's on identical paths.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

try:  # optional native acceleration (dynam3d_tpu/native)
    from dynam3d_tpu.native import dtw_native as _dtw_native
except Exception:  # pragma: no cover - native lib optional
    _dtw_native = None


def euclidean_dtw(pred: np.ndarray, gt: np.ndarray) -> float:
    """Exact DTW with euclidean point distance (NDTW.euclidean_distance)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if _dtw_native is not None:
        return float(_dtw_native(pred, gt))
    n, m = len(pred), len(gt)
    d = np.linalg.norm(pred[:, None, :] - gt[None, :, :], axis=-1)
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            acc[i, j] = d[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i - 1, j - 1], acc[i, j - 1]
            )
    return float(acc[n, m])


def ndtw(pred_path: np.ndarray, gt_path: np.ndarray, success_distance: float = 3.0) -> float:
    dtw = euclidean_dtw(pred_path, gt_path)
    return float(np.exp(-dtw / (len(gt_path) * success_distance)))


def episode_metrics(
    pred_path: np.ndarray,          # [T,3] agent positions incl. start
    distances_to_goal: np.ndarray,  # [T] geodesic (or euclidean) dist per step
    gt_path: np.ndarray,            # [N,3] gt locations
    steps_taken: int,
    collisions: int = 0,
    success_distance: float = 3.0,
) -> Dict[str, float]:
    """Port of the per-episode metric block (ss_trainer_Dynam3D.py:731-749)."""
    pred_path = np.asarray(pred_path, np.float32)
    distances = np.asarray(distances_to_goal, np.float32)
    m: Dict[str, float] = {}
    m["steps_taken"] = float(steps_taken)
    m["distance_to_goal"] = float(distances[-1])
    m["success"] = 1.0 if distances[-1] <= success_distance else 0.0
    m["oracle_success"] = 1.0 if (distances <= success_distance).any() else 0.0
    m["path_length"] = float(
        np.linalg.norm(pred_path[1:] - pred_path[:-1], axis=1).sum()
    )
    m["collisions"] = collisions / max(len(pred_path), 1)
    gt_length = float(distances[0])
    m["spl"] = m["success"] * gt_length / max(gt_length, m["path_length"], 1e-9)
    m["ndtw"] = ndtw(pred_path, np.asarray(gt_path, np.float32), success_distance)
    m["sdtw"] = m["ndtw"] * m["success"]
    return m


def aggregate(per_episode: Sequence[Dict[str, float]]) -> Dict[str, float]:
    """Mean over episodes (the reference's cross-rank weighted merge,
    ss_trainer_Dynam3D.py:389-408, reduces to this within one process)."""
    if not per_episode:
        return {}
    keys = per_episode[0].keys()
    return {k: float(np.mean([e[k] for e in per_episode])) for k in keys}


def shard_episodes(episode_ids: Sequence, rank: int, world: int) -> list:
    """Strided eval/inference episode sharding ``traj[rank::world]``
    (base_il_trainer.py:729,770)."""
    return list(episode_ids)[rank::world]


def dedup_path(
    positions: Sequence[Sequence[float]],
    headings: Sequence[float],
    max_len: int = 500,
) -> list:
    """Inference path postprocess (ss_trainer_Dynam3D.py:752-775): drop
    consecutive duplicate positions, cap at ``max_len``, mark last as stop."""
    out = [{"position": list(positions[0]), "heading": float(headings[0]), "stop": False}]
    for p, h in zip(positions[1:], headings[1:]):
        if list(p) != out[-1]["position"]:
            out.append({"position": list(p), "heading": float(h), "stop": False})
    out = out[:max_len]
    out[-1]["stop"] = True
    return out
