"""Per-view "segment everything" providers for the 3D memory.

The reference runs FastSAM (YOLOv8-seg) over each RGB view and downsamples
the union of masks to a 24x24 segment-id map
(``Feature_Fields.get_patch_segm``, feature_fields.py:400-430), with an
all-zeros fallback when FastSAM fails (":424-426").

This module defines the segmenter contract — ``[HW] int32 ids in
[0, max_segments)`` per view — and two TPU-native providers:

  - :func:`depth_plane_segments` — a jittable geometric segmenter: connected
    components over the patch grid where 4-neighbors with similar depth are
    connected (iterative min-label propagation; fixed shapes, no host sync).
    Used for tests/benchmarks and as the runtime fallback.
  - :func:`zero_segments` — the reference's failure fallback (one segment).

The learned FastSAM/YOLOv8-seg port lives in models/encoders/yolov8_seg.py
and emits the same contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zero_segments(hw: int) -> jnp.ndarray:
    """Single-segment fallback (feature_fields.py:426)."""
    return jnp.zeros((hw,), jnp.int32)


def depth_plane_segments(
    depth: jnp.ndarray,
    height: int,
    width: int,
    max_segments: int,
    rel_threshold: float = 0.08,
    n_iters: int | None = None,
) -> jnp.ndarray:
    """Segment the patch grid by depth continuity (connected components).

    Two 4-neighbors join iff ``|d_a - d_b| <= rel_threshold * max(d_a, d_b)``.
    Labels = min patch index in the component, then compacted to consecutive
    ids (first-occurrence order, matching get_patch_segm's renumbering at
    feature_fields.py:416-420).  Components beyond ``max_segments`` collapse
    into the last id.

    Args:
      depth: ``[H*W]`` metric depth of the view.

    Returns: ``[H*W] int32`` segment ids in ``[0, max_segments)``.
    """
    hw = height * width
    d = depth.reshape(height, width)
    same_r = jnp.abs(d[:, 1:] - d[:, :-1]) <= rel_threshold * jnp.maximum(
        d[:, 1:], d[:, :-1]
    )
    same_d = jnp.abs(d[1:, :] - d[:-1, :]) <= rel_threshold * jnp.maximum(
        d[1:, :], d[:-1, :]
    )

    labels = jnp.arange(hw, dtype=jnp.int32).reshape(height, width)
    big = jnp.int32(hw)

    def prop(lab):
        left = jnp.concatenate(
            [jnp.full((height, 1), big), jnp.where(same_r, lab[:, :-1], big)], axis=1
        )
        right = jnp.concatenate(
            [jnp.where(same_r, lab[:, 1:], big), jnp.full((height, 1), big)], axis=1
        )
        up = jnp.concatenate(
            [jnp.full((1, width), big), jnp.where(same_d, lab[:-1, :], big)], axis=0
        )
        down = jnp.concatenate(
            [jnp.where(same_d, lab[1:, :], big), jnp.full((1, width), big)], axis=0
        )
        return jnp.minimum(jnp.minimum(lab, jnp.minimum(left, right)), jnp.minimum(up, down))

    iters = n_iters or (height + width)
    labels = jax.lax.fori_loop(0, iters, lambda _, l: prop(l), labels).reshape(-1)

    # compact to consecutive ids by first occurrence (root == own index)
    is_root = labels == jnp.arange(hw, dtype=jnp.int32)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # rank of each root
    seg_of_root = jnp.where(is_root, rank, 0)
    ids = seg_of_root[labels]
    return jnp.minimum(ids, max_segments - 1).astype(jnp.int32)
