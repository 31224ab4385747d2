"""Masked k-nearest-neighbor queries over fixed-capacity point tables.

TPU-native replacement for the reference's ``torch_kdtree`` (CUDA kd-tree;
used at feature_fields.py:246,303,364,540,584,606).  Two observations make a
kd-tree the wrong tool on TPU:

1. The *instance* table is tiny (<= a few thousand live entries), so the
   merge-proposal query (k=2/4 nearest instances, feature_fields.py:606) is a
   single masked distance matmul on the MXU — far cheaper than any tree.
2. The *ray-render* query (501x144 sample points against the patch table,
   src_3dff feature_fields.py:540,584) is bandwidth-bound; a tiled scan with a
   running top-k keeps the working set in VMEM-sized chunks and lets XLA
   pipeline HBM reads.

Semantics preserved from torch_kdtree / the call sites:
  - returned distances are SQUARED (the reference sqrt's them explicitly);
  - invalid/tombstoned slots never win: the reference tombstones deleted
    entries at position -10000 so they fall out of every radius query
    (feature_fields.py:357,378); here an explicit validity mask pushes their
    distance to +inf, which also handles the "gt_dists.sum() > 1e6" dead-slot
    detection at feature_fields.py:607-610;
  - neighbors beyond ``radius`` are marked index -1 (":543,587").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


def _pairwise_sq_dists(queries: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances ``[Q,P]`` via the MXU-friendly expansion."""
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)          # [Q,1]
    p2 = jnp.sum(points * points, axis=-1, keepdims=True).T          # [1,P]
    # HIGHEST precision is required on TPU: the default bf16 MXU pass loses
    # ~1e-2 relative on the cross term, which the q2+p2-2ab cancellation
    # amplifies into metre-scale errors near zero distance.
    cross = jnp.dot(
        queries,
        points.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)


def knn_brute(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN by full distance matrix; use when ``points`` is small.

    Args:
      queries: ``[Q,3]`` float32.
      points: ``[P,3]`` float32 table (may contain dead slots).
      valid: ``[P]`` bool.
      k: number of neighbors (static).

    Returns:
      ``(sq_dists [Q,k], indices [Q,k])`` sorted ascending by distance;
      dead slots surface as distance >= 1e10.
    """
    d = _pairwise_sq_dists(queries.astype(jnp.float32), points.astype(jnp.float32))
    d = jnp.where(valid[None, :], d, _BIG)
    neg_top, idx = jax.lax.top_k(-d, k)
    return -neg_top, idx


@functools.partial(jax.jit, static_argnames=("k", "tile", "q_chunk"))
def knn_tiled(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    tile: int = 2048,
    q_chunk: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN with a running top-k over point tiles; for large tables.

    Scans ``points`` in ``tile``-sized chunks per ``q_chunk`` queries so the
    live distance block stays ~[q_chunk, tile] (VMEM-tileable), instead of
    materializing the full [Q,P] matrix.
    """
    Q = queries.shape[0]
    P = points.shape[0]
    qpad = (-Q) % q_chunk
    ppad = (-P) % tile
    queries_p = jnp.pad(queries, ((0, qpad), (0, 0)))
    points_p = jnp.pad(points, ((0, ppad), (0, 0)))
    valid_p = jnp.pad(valid, (0, ppad))
    n_tiles = points_p.shape[0] // tile
    pts_t = points_p.reshape(n_tiles, tile, -1)
    val_t = valid_p.reshape(n_tiles, tile)

    def per_chunk(qc):
        init = (
            jnp.full((q_chunk, k), _BIG, jnp.float32),
            jnp.full((q_chunk, k), -1, jnp.int32),
        )

        def body(carry, tile_in):
            best_d, best_i = carry
            pts, val, start = tile_in
            d = _pairwise_sq_dists(qc, pts)
            d = jnp.where(val[None, :], d, _BIG)
            ids = start + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, ids], axis=1)
            neg_top, sel = jax.lax.top_k(-cat_d, k)
            new_i = jnp.take_along_axis(cat_i, sel, axis=1)
            return (-neg_top, new_i), None

        starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
        (best_d, best_i), _ = jax.lax.scan(body, init, (pts_t, val_t, starts))
        return best_d, best_i

    qs = queries_p.reshape(-1, q_chunk, queries.shape[-1]).astype(jnp.float32)
    dists, inds = jax.lax.map(per_chunk, qs)
    dists = dists.reshape(-1, k)[:Q]
    inds = inds.reshape(-1, k)[:Q]
    return dists, inds


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "band", "with_indices")
)
def knn_banded(
    q_struct: jnp.ndarray,     # [R, NS, 3] ray-structured queries
    points: jnp.ndarray,       # [P, 3]
    valid: jnp.ndarray,        # [P]
    k: int,
    radius: float,
    tile: int = 2048,
    band: int = 32,
    with_indices: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius-exact k-NN for RAY-STRUCTURED queries with spatial culling.

    The render stage-1 query has structure the flat scan ignores: samples
    at the same depth index across all rays form a thin shell, and the
    patch table is inserted frame-by-frame so point tiles are spatially
    coherent.  This variant chunks queries into depth BANDS (``band``
    consecutive samples of every ray), precomputes per-tile bounding boxes,
    and skips (band, tile) pairs whose boxes are farther than ``radius``
    apart with a real branch (``lax.cond``) inside the tile scan.

    Contract: EXACT for every neighbor within ``radius`` (a tile holding a
    point within ``radius`` of any band query can never be culled); beyond
    the radius distances may surface as >= 1e10 instead of their true
    value — exactly what :func:`radius_mask_fill` consumers observe, since
    they clamp (stage 1, ":542-544") or -1-fill (stage 2) at the radius.

    Measured (v5e, 32k walk-clustered patches, 144x501 samples): 97.6 ms
    vs 160.9 ms for :func:`knn_tiled` — net ~2x after dispatch RTT; on
    uniformly scattered tables culling finds nothing and it degrades
    toward ``knn_tiled`` plus the bbox tests.

    ``with_indices=False`` (the render stage-1 shape, which consumes only
    the distance field) replaces the per-tile ``lax.top_k`` merge — a full
    sort network over ``tile + k`` columns, by far the dominant cost of a
    near pair — with ``k`` unrolled argmin-extraction rounds (3 linear
    passes each) and skips the index iota / gather entirely.  Positional
    (argmin) extraction keeps exact-duplicate distances distinct, so the
    distances are identical to the top_k path's.

    Returns flat ``(sq_dists [R*NS, k], indices [R*NS, k])``; with
    ``with_indices=False`` the indices are all -1.
    """
    R, NS, _ = q_struct.shape
    nb = -(-NS // band)
    pad_ns = nb * band - NS
    qp = jnp.pad(q_struct, ((0, 0), (0, pad_ns), (0, 0)), constant_values=1e6)
    qb = qp.reshape(R, nb, band, 3).transpose(1, 0, 2, 3).reshape(nb, R * band, 3)

    P = points.shape[0]
    ppad = (-P) % tile
    pp = jnp.pad(points, ((0, ppad), (0, 0)))
    vp = jnp.pad(valid, (0, ppad))
    nt = pp.shape[0] // tile
    pts_t = pp.reshape(nt, tile, 3)
    val_t = vp.reshape(nt, tile)
    t_lo = jnp.min(jnp.where(val_t[..., None], pts_t, jnp.inf), axis=1)
    t_hi = jnp.max(jnp.where(val_t[..., None], pts_t, -jnp.inf), axis=1)

    def per_band(qc):
        real = qc[:, 0] < 1e5
        lo = jnp.min(jnp.where(real[:, None], qc, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(real[:, None], qc, -jnp.inf), axis=0)
        Q = qc.shape[0]
        init = (
            jnp.full((Q, k), _BIG, jnp.float32),
            jnp.full((Q, k), -1, jnp.int32),
        )

        def body(carry, tin):
            pts, val, start, tlo, thi = tin
            gap = jnp.maximum(jnp.maximum(tlo - hi, lo - thi), 0.0)
            near = jnp.sum(gap * gap) < radius * radius

            def compute(c):
                bd, bi = c
                d = _pairwise_sq_dists(qc, pts)
                d = jnp.where(val[None, :], d, _BIG)
                if not with_indices:
                    cd = jnp.concatenate([bd, d], axis=1)
                    cols = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 1)
                    outs = []
                    for _ in range(k):
                        am = jnp.argmin(cd, axis=1)
                        outs.append(jnp.min(cd, axis=1))
                        cd = jnp.where(cols == am[:, None], _BIG, cd)
                    return jnp.stack(outs, axis=1), bi
                ids = start + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
                cd = jnp.concatenate([bd, d], axis=1)
                ci = jnp.concatenate([bi, ids], axis=1)
                neg, sel = jax.lax.top_k(-cd, k)
                return -neg, jnp.take_along_axis(ci, sel, axis=1)

            return jax.lax.cond(near, compute, lambda c: c, carry), None

        starts = jnp.arange(nt, dtype=jnp.int32) * tile
        (bd, bi), _ = jax.lax.scan(body, init, (pts_t, val_t, starts, t_lo, t_hi))
        return bd, bi

    d, i = jax.lax.map(per_band, qb)
    d = (
        d.reshape(nb, R, band, k).transpose(1, 0, 2, 3)
        .reshape(R, nb * band, k)[:, :NS]
    )
    i = (
        i.reshape(nb, R, band, k).transpose(1, 0, 2, 3)
        .reshape(R, nb * band, k)[:, :NS]
    )
    return d.reshape(R * NS, k), i.reshape(R * NS, k)


def radius_mask_fill(
    sq_dists: jnp.ndarray,
    indices: jnp.ndarray,
    radius: float,
    clamp_dist: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the reference's radius filter: index -> -1 beyond ``radius``.

    Mirrors feature_fields.py:542-544 (sqrt, compare to radius, -1 fill,
    optionally clamp the distance to ``radius``).  Input distances are
    squared; returned distances are EUCLIDEAN (sqrt'd), as the reference
    consumes them post-sqrt.
    """
    d = jnp.sqrt(sq_dists)
    out_of_range = d >= radius
    idx = jnp.where(out_of_range, -1, indices)
    if clamp_dist:
        d = jnp.where(out_of_range, radius, d)
    return d, idx


def _spread10(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of int32 ``x`` to every 3rd bit (Morton)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton (Z-order) codes over the VALID points' bounding box.

    Each axis is quantized to 10 bits over the live bbox; invalid slots get
    the maximal code so a sort pushes them to the end.  Nearby points in
    space get nearby codes, which is exactly what :func:`knn_banded`'s
    per-tile bounding boxes need — the patch table is filled in insertion
    order, so a walk that revisits an area scatters spatially-close patches
    across distant tiles, bloating the boxes the culling tests.
    """
    big = jnp.where(valid[:, None], points, jnp.nan)
    lo = jnp.nanmin(big, axis=0)
    hi = jnp.nanmax(big, axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(
        ((points - lo) / span * 1023.0), 0.0, 1023.0
    ).astype(jnp.int32)
    code = (
        _spread10(q[:, 0])
        | (_spread10(q[:, 1]) << 1)
        | (_spread10(q[:, 2]) << 2)
    )
    return jnp.where(valid, code, jnp.int32(0x7FFFFFFF))


def morton_perm(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Permutation sorting the table into Morton order (invalid slots last)."""
    return jnp.argsort(morton_codes(points, valid), stable=True)
