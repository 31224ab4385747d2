"""Profiling helpers (the tracing subsystem the reference lacks, SURVEY §5.1).

The reference's only performance introspection is tqdm + GPU-memory polling;
this build exposes the JAX profiler (xplane traces viewable in TensorBoard /
Perfetto) plus a lightweight step timer that forces completion through a tiny
transfer (``jax.block_until_ready`` is unreliable on experimental backends).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xplane trace around a code region.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force device completion via a tiny transfer (tunnel-safe)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0].ravel()[0:1])


class StepTimer:
    """Percentile step timer; persists a jsonl summary."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.time() - self._t0)

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples) * 1000.0
        return {
            "name": self.name,
            "n": len(arr),
            "p50_ms": float(np.percentile(arr, 50)),
            "p90_ms": float(np.percentile(arr, 90)),
            "mean_ms": float(arr.mean()),
        }

    def dump(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(self.stats()) + "\n")
