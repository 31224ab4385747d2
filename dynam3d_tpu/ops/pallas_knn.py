"""Pallas TPU kernel: masked k-NN over the patch/instance tables.

The torch_kdtree replacement's hot configuration is the renderer's ray query
(72k sample points x 32k-capacity patch table, src_3dff
feature_fields.py:540,584).  The jnp fallback (ops/knn.py:knn_tiled) pays an
HBM round-trip per tile for the concat/top_k; this kernel keeps the whole
candidate set in VMEM:

  - the POINT table fits VMEM outright (32k x 3 f32 = 384 KB), so each grid
    program streams only its query tile;
  - distances are computed chunk-by-chunk over points ([TQ, CHUNK] f32 tiles)
    with the running top-k (k<=8) merged by iterative min-extraction — no
    sort, no HBM spills;
  - dead slots (validity mask) get +inf distance, reproducing the tombstone
    semantics.

Falls back to interpret mode off-TPU (tests) and to ops.knn.knn_tiled when
shapes are tiny.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _kernel(q_ref, pts_ref, valid_ref, dist_ref, idx_ref, *, k: int, chunk: int):
    TQ = q_ref.shape[0]
    P = pts_ref.shape[0]
    n_chunks = P // chunk

    q = q_ref[:]                                   # [TQ,3]
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)    # [TQ,1]

    best_d = jnp.full((TQ, k), _BIG, jnp.float32)
    best_i = jnp.full((TQ, k), -1, jnp.int32)

    def chunk_body(c, carry):
        best_d, best_i = carry
        pts = pts_ref[pl.ds(c * chunk, chunk), :]          # [CH,3]
        val = valid_ref[pl.ds(c * chunk, chunk), 0]        # [CH]
        p2 = jnp.sum(pts * pts, axis=-1)[None, :]          # [1,CH]
        cross = jax.lax.dot_general(
            q, pts,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [TQ,CH]
        d = jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)
        d = jnp.where(val[None, :] != 0, d, _BIG)
        ids = c * chunk + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

        cat_d = jnp.concatenate([best_d, d], axis=1)       # [TQ,k+CH]
        cat_i = jnp.concatenate([best_i, ids], axis=1)

        # k is tiny (<=8): unroll the min-extractions; Mosaic supports
        # neither value-dynamic_update_slice nor fancy gathers, so the
        # winner is selected by masked reduction and knocked out by where.
        nb_d_cols, nb_i_cols = [], []
        iota = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
        for _ in range(k):
            m = jnp.min(cat_d, axis=1)                      # [TQ]
            am = jnp.argmin(cat_d, axis=1)                  # [TQ]
            hit = iota == am[:, None]
            sel = jnp.max(jnp.where(hit, cat_i, -1), axis=1)
            nb_d_cols.append(m)
            nb_i_cols.append(sel)
            cat_d = jnp.where(hit, _BIG, cat_d)
        best_d = jnp.stack(nb_d_cols, axis=1)
        best_i = jnp.stack(nb_i_cols, axis=1)
        return best_d, best_i

    best_d, best_i = jax.lax.fori_loop(0, n_chunks, chunk_body, (best_d, best_i))
    dist_ref[:] = best_d
    idx_ref[:] = best_i


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "chunk", "interpret")
)
def pallas_knn(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    tile_q: int = 256,
    chunk: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared-distance k-NN with -1/BIG dead-slot semantics (== knn_brute)."""
    Q = queries.shape[0]
    P = points.shape[0]
    qpad = (-Q) % tile_q
    chunk = min(chunk, max(128, P))
    ppad = (-P) % chunk
    q = jnp.pad(queries.astype(jnp.float32), ((0, qpad), (0, 0)))
    pts = jnp.pad(points.astype(jnp.float32), ((0, ppad), (0, 0)))
    val = jnp.pad(valid.astype(jnp.int32), (0, ppad))[:, None]

    grid = (q.shape[0] // tile_q,)
    dists, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pts.shape[0], 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((val.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.int32),
        ],
        interpret=interpret,
    )(q, pts, val)
    return dists[:Q], idx[:Q]


def knn_auto(
    queries: jnp.ndarray, points: jnp.ndarray, valid: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch: Pallas on TPU, tiled-jnp elsewhere.

    ``DYNAM3D_DISABLE_PALLAS=1`` forces the jnp path (escape hatch)."""
    import os

    import jax as _jax

    if (
        _jax.default_backend() == "tpu"
        and points.shape[0] >= 1024
        and not os.environ.get("DYNAM3D_DISABLE_PALLAS")
    ):
        return pallas_knn(queries, points, valid, k)
    from dynam3d_tpu.ops.knn import knn_tiled

    return knn_tiled(queries, points, valid, k)
