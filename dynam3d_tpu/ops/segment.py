"""Segment reductions and free-slot allocation over masked fixed-capacity tables.

These replace the reference's Python-side ragged bookkeeping:

  - per-segment means over FastSAM partitions (`for segm_id in torch.unique(...)`
    loops, feature_fields.py:580-601) become one-hot segment-sums that XLA maps
    onto the MXU;
  - dict-based id reuse (``assign_new_patch_ids`` etc., feature_fields.py:433-475,
    which hand out the smallest free ids) becomes a cumsum-based "first k free
    slots" primitive over the validity mask.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def segment_count(seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """``[S]`` member counts of each segment id over a flat id map ``[N]``."""
    onehot = seg_ids[None, :] == jnp.arange(num_segments)[:, None]
    return jnp.sum(onehot, axis=1)


def segment_mean(
    values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-segment mean of ``values [N,D]`` partitioned by ``seg_ids [N]``.

    Returns ``(means [S,D], counts [S])``; empty segments get zeros.
    """
    onehot = (seg_ids[None, :] == jnp.arange(num_segments)[:, None]).astype(
        values.dtype
    )  # [S,N]
    sums = onehot @ values  # [S,D] — MXU
    counts = jnp.sum(onehot, axis=1)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return means, counts


def first_free_slots(valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the first ``k`` free (invalid) slots, ascending.

    Reproduces the reference's id allocators, which scan for the smallest
    unused ids (feature_fields.py:433-475).  If fewer than ``k`` slots are
    free the tail indices point at the LAST slot (capacity overflow — callers
    gate on the validity of the allocation via :func:`free_slot_ok`).

    Args:
      valid: ``[C]`` bool, True where the slot is occupied.
      k: number of slots to allocate (static).

    Returns: ``[k]`` int32 slot indices.
    """
    free = ~valid
    # rank of each free slot among free slots (1-based), 0 for occupied
    rank = jnp.cumsum(free.astype(jnp.int32)) * free.astype(jnp.int32)
    C = valid.shape[0]
    # slot index holding rank r, else C-1 sentinel
    idx = jnp.arange(C, dtype=jnp.int32)
    out = jnp.full((k,), C - 1, jnp.int32)
    # scatter: out[rank-1] = idx  for rank in 1..k
    take = jnp.where((rank >= 1) & (rank <= k), rank - 1, k)  # k = dropped
    out = jnp.zeros((k + 1,), jnp.int32).at[take].max(idx, mode="drop")
    # rows never written stay 0 — fix by marking unfilled ranks with sentinel
    nfree = jnp.sum(free.astype(jnp.int32))
    filled = jnp.arange(k) < nfree
    return jnp.where(filled, out[:k], C - 1)


def free_slot_ok(valid: jnp.ndarray, k_needed: jnp.ndarray) -> jnp.ndarray:
    """True if the table has at least ``k_needed`` free slots."""
    return jnp.sum((~valid).astype(jnp.int32)) >= k_needed
