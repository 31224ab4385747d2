"""Pallas TPU kernel: masked k-NN over the patch/instance tables.

The torch_kdtree replacement's hot configuration is the renderer's ray query
(72k sample points x 32k-capacity patch table, src_3dff
feature_fields.py:540,584).  The jnp fallback (ops/knn.py:knn_tiled) pays an
HBM round-trip per tile for the concat/top_k; this kernel keeps the working
set in VMEM.

Design (v2 — the v1 in-kernel chunk loop kept every chunk's buffers live and
blew the 128 MB VMEM budget on hardware):

  - 2D grid ``(q_tiles, p_chunks)``; TPU iterates the LAST grid dim
    sequentially, so each query tile's running top-k lives in its OUTPUT
    refs and accumulates across point chunks (out index_map ignores the
    chunk index — the canonical revisiting-accumulator pattern);
  - per step only one ``[TILE_Q, CHUNK]`` distance block is live (~1 MB);
  - the top-k merge is k (<=8) unrolled masked min-extractions — no sorts,
    no gathers (Mosaic supports neither well);
  - dead slots get +inf distance, preserving tombstone semantics.
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
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        dist_ref[:] = jnp.full_like(dist_ref, _BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    q = q_ref[:]                                       # [TQ,3]
    pts = pts_ref[:]                                   # [CH,3]
    val = valid_ref[:, 0]                              # [CH]
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(pts * pts, axis=-1)[None, :]
    cross = jax.lax.dot_general(
        q, pts,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)        # [TQ,CH]
    d = jnp.where(val[None, :] != 0, d, _BIG)
    ids = c * chunk + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

    # chunk-local top-k via min + VALUE-equality select (v4: argmin's Mosaic
    # lowering caused register-spill blowups; duplicates resolve to the
    # smallest id, keeping extraction deterministic)
    big_id = jnp.int32(1 << 30)
    ch_d, ch_i = [], []
    for _ in range(k):
        m = jnp.min(d, axis=1)                           # [TQ]
        hit = d == m[:, None]
        sel = jnp.min(jnp.where(hit, ids, big_id), axis=1)
        ch_d.append(m)
        ch_i.append(sel)
        d = jnp.where(ids == sel[:, None], _BIG, d)

    # merge with the running best in a tiny [TQ, 2k] workspace
    md = jnp.concatenate([dist_ref[:], jnp.stack(ch_d, axis=1)], axis=1)
    mi = jnp.concatenate([idx_ref[:], jnp.stack(ch_i, axis=1)], axis=1)
    mpos = jax.lax.broadcasted_iota(jnp.int32, md.shape, 1)
    nb_d, nb_i = [], []
    for _ in range(k):
        m = jnp.min(md, axis=1)
        hit = md == m[:, None]
        # tie-break by workspace position (stable)
        pos = jnp.min(jnp.where(hit, mpos, big_id), axis=1)
        take = mpos == pos[:, None]
        sel = jnp.max(jnp.where(take, mi, -(1 << 30)), axis=1)
        nb_d.append(m)
        nb_i.append(sel)
        md = jnp.where(take, _BIG, md)
    dist_ref[:] = jnp.stack(nb_d, axis=1)
    idx_ref[:] = jnp.stack(nb_i, axis=1)


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
    n_chunks = pts.shape[0] // chunk

    grid = (q.shape[0] // tile_q, n_chunks)
    dists, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 3), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * pts.shape[0] * 3,
            bytes_accessed=(q.shape[0] * 3 + pts.shape[0] * 4) * 4,
            transcendentals=0,
        ),
    )(q, pts, val)
    return dists[:Q], idx[:Q]


def knn_auto(
    queries: jnp.ndarray, points: jnp.ndarray, valid: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend dispatch for the big ray-query k-NN.

    Default is the XLA tiled-scan path (ops/knn.py): on current Mosaic the
    unrolled top-k extraction in the Pallas kernel triggers ~256 MB of
    register-allocator spills at the 72k x 32k renderer shape (3 hardware
    attempts, see git history), so the kernel is opt-in via
    ``DYNAM3D_ENABLE_PALLAS_KNN=1`` until the lowering improves."""
    import jax as _jax

    from dynam3d_tpu import flags

    if (
        _jax.default_backend() == "tpu"
        and points.shape[0] >= 1024
        and flags.ENABLE_PALLAS_KNN
    ):
        return pallas_knn(queries, points, valid, k)
    from dynam3d_tpu.ops.knn import knn_tiled

    return knn_tiled(queries, points, valid, k)
