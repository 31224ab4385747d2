"""Tests for masked k-NN, segment reductions, free-slot allocation, and NMS."""

import numpy as np
import jax.numpy as jnp

from dynam3d_tpu.ops import (
    first_free_slots,
    heatmap_nms,
    knn_brute,
    knn_tiled,
    radius_mask_fill,
    segment_mean,
)
from dynam3d_tpu.ops.segment import free_slot_ok


def _np_knn(q, p, valid, k):
    d = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    d[:, ~valid] = 1e10
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_brute_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(37, 3)).astype(np.float32)
    p = rng.normal(size=(101, 3)).astype(np.float32)
    valid = rng.uniform(size=101) > 0.3
    want_d, want_i = _np_knn(q, p, valid, 4)
    got_d, got_i = knn_brute(jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid), 4)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-4)
    # indices may differ on exact ties; compare distances at indices instead
    d_at = np.take_along_axis(
        ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1), np.asarray(got_i), axis=1
    )
    np.testing.assert_allclose(d_at, want_d, rtol=1e-4, atol=1e-4)


def test_knn_tiled_matches_brute():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(333, 3)).astype(np.float32)
    p = rng.normal(size=(5000, 3)).astype(np.float32)
    valid = rng.uniform(size=5000) > 0.1
    bd, _ = knn_brute(jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid), 4)
    td, _ = knn_tiled(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid), 4, tile=512, q_chunk=128
    )
    np.testing.assert_allclose(np.asarray(td), np.asarray(bd), rtol=1e-4, atol=1e-4)


def test_knn_all_invalid_gives_big_dists():
    q = jnp.zeros((5, 3))
    p = jnp.ones((10, 3))
    d, i = knn_brute(q, p, jnp.zeros(10, bool), 2)
    assert np.all(np.asarray(d) >= 1e9)


def test_radius_mask_fill():
    sq = jnp.asarray([[0.25, 4.0]])
    idx = jnp.asarray([[3, 7]])
    d, i = radius_mask_fill(sq, idx, radius=1.0, clamp_dist=True)
    np.testing.assert_allclose(np.asarray(d), [[0.5, 1.0]])
    np.testing.assert_array_equal(np.asarray(i), [[3, -1]])


def test_segment_mean():
    vals = jnp.asarray([[1.0], [3.0], [5.0], [7.0]])
    ids = jnp.asarray([0, 0, 2, 2])
    means, counts = segment_mean(vals, ids, 3)
    np.testing.assert_allclose(np.asarray(means)[:, 0], [2.0, 0.0, 6.0])
    np.testing.assert_array_equal(np.asarray(counts), [2, 0, 2])


def test_first_free_slots_reuses_smallest_ids():
    valid = jnp.asarray([True, False, True, False, False, True])
    slots = first_free_slots(valid, 3)
    np.testing.assert_array_equal(np.asarray(slots), [1, 3, 4])
    # overflow: only 3 free, ask for 5 -> tail gets sentinel C-1
    slots = first_free_slots(valid, 5)
    np.testing.assert_array_equal(np.asarray(slots), [1, 3, 4, 5, 5])
    assert bool(free_slot_ok(valid, 3)) and not bool(free_slot_ok(valid, 4))


def test_first_free_slots_empty_table():
    valid = jnp.zeros(8, bool)
    slots = first_free_slots(valid, 4)
    np.testing.assert_array_equal(np.asarray(slots), [0, 1, 2, 3])


def _ref_nms(pred, max_predictions, sigma):
    """Numpy transcription of waypoint_pred/utils.py:37-64 (rectangular)."""
    B, H, W = pred.shape
    flat_pred = pred.reshape(B, -1).copy()
    supp = pred.copy()
    out = np.zeros((B, H * W), np.float32)
    for _ in range(max_predictions):
        fs = supp.reshape(B, -1)
        ix = fs.argmax(1)
        out[np.arange(B), ix] = flat_pred[np.arange(B), ix]
        y = ix / W  # true division, as in the reference
        x = ix % W
        xs = np.arange(W, dtype=np.float32)[None, None, :]
        ys = np.arange(H, dtype=np.float32)[None, :, None]
        x_diff = xs - x[:, None, None]
        x_diff = np.minimum(np.abs(x_diff), np.abs(x_diff + W))
        y_diff = ys - y[:, None, None]
        g = ((np.abs(x_diff) <= sigma[0]) & (np.abs(y_diff) <= sigma[1])).astype(
            np.float32
        )
        supp = supp * (1 - g)
    out = out.reshape(B, H, W)
    out[out < 0] = 0
    return out


def test_heatmap_nms_matches_reference():
    rng = np.random.default_rng(2)
    pred = rng.uniform(size=(2, 122, 12)).astype(np.float32)
    want = _ref_nms(pred, 5, (7.0, 5.0))
    got = np.asarray(heatmap_nms(jnp.asarray(pred), 5, (7.0, 5.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (got > 0).sum() <= 5 * 2


def test_depth_plane_segments_splits_on_discontinuity():
    from dynam3d_tpu.models.segmenter import depth_plane_segments, zero_segments

    # left half at 2m, right half at 6m: two components
    d = np.full((8, 8), 2.0, np.float32)
    d[:, 4:] = 6.0
    ids = np.asarray(
        depth_plane_segments(jnp.asarray(d.reshape(-1)), 8, 8, 8)
    ).reshape(8, 8)
    assert len(np.unique(ids)) == 2
    assert (ids[:, :4] == ids[0, 0]).all()
    assert (ids[:, 4:] == ids[0, 7]).all()
    # smooth ramp within threshold: one component
    ramp = np.linspace(2.0, 2.5, 64).reshape(8, 8).astype(np.float32)
    ids2 = np.asarray(depth_plane_segments(jnp.asarray(ramp.reshape(-1)), 8, 8, 8))
    assert len(np.unique(ids2)) == 1
    # fallback
    np.testing.assert_array_equal(np.asarray(zero_segments(4)), [0, 0, 0, 0])


def test_knn_banded_radius_exact():
    """Banded (bbox-culled) k-NN == brute force for every neighbor within
    the radius, on clustered AND uniform tables, unaligned NS, masks."""
    import jax.numpy as jnp

    from dynam3d_tpu.ops.knn import knn_banded, knn_brute

    rng = np.random.default_rng(3)
    R, NS, K, radius = 9, 37, 4, 1.0
    # ray-structured queries marching outward from the origin
    dirs = rng.normal(size=(R, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    depth = np.linspace(0.0, 8.0, NS)
    q = (dirs[:, None, :] * depth[None, :, None]).astype(np.float32)
    # clustered points near a few of the rays + uniform background
    pts = np.concatenate([
        q.reshape(-1, 3)[::3] + rng.normal(scale=0.3, size=(q.reshape(-1, 3)[::3].shape)),
        rng.uniform(-8, 8, (500, 3)),
    ]).astype(np.float32)
    valid = rng.uniform(size=len(pts)) > 0.15

    bd, bi = knn_banded(
        jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid), K, radius,
        tile=256, band=8,
    )
    rd, ri = knn_brute(
        jnp.asarray(q.reshape(-1, 3)), jnp.asarray(pts), jnp.asarray(valid), K
    )
    bd, rd = np.asarray(bd), np.asarray(rd)
    bi, ri = np.asarray(bi), np.asarray(ri)
    in_r = rd < radius * radius
    np.testing.assert_allclose(bd[in_r], rd[in_r], rtol=1e-3, atol=1e-5)
    # indices agree up to distance ties / summation-order noise: the
    # distance AT the returned index must match the reported distance
    d_at = ((q.reshape(-1, 3)[:, None, :] - pts[bi]) ** 2).sum(-1)
    np.testing.assert_allclose(
        d_at[in_r], bd[in_r], rtol=1e-3, atol=1e-4
    )
    # beyond the radius the banded result never reports a smaller distance
    assert (bd[~in_r] >= rd[~in_r] * (1 - 1e-4) - 1e-4).all()

    # all-invalid table: everything surfaces as dead
    bd2, _ = knn_banded(
        jnp.asarray(q), jnp.asarray(pts), jnp.zeros(len(pts), bool), K, radius,
        tile=256, band=8,
    )
    assert (np.asarray(bd2) >= 1e9).all()

    # values-only mode (render stage 1): identical distances (argmin
    # extraction vs top_k sort), indices all -1
    vd, vi = knn_banded(
        jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid), K, radius,
        tile=256, band=8, with_indices=False,
    )
    np.testing.assert_allclose(np.asarray(vd), bd, rtol=1e-6, atol=1e-6)
    assert (np.asarray(vi) == -1).all()
    vd2, _ = knn_banded(
        jnp.asarray(q), jnp.asarray(pts), jnp.zeros(len(pts), bool), K, radius,
        tile=256, band=8, with_indices=False,
    )
    assert (np.asarray(vd2) >= 1e9).all()


def test_morton_perm_orders_spatially():
    """Morton codes: valid permutation, invalids pushed last, and tile
    bboxes over the sorted table are tighter than insertion order (the
    property knn_banded's culling depends on)."""
    import jax.numpy as jnp

    from dynam3d_tpu.ops.knn import morton_codes, morton_perm

    rng = np.random.default_rng(0)
    # walk-style insertion: 8 revisited clusters interleaved over time
    centers = rng.uniform(-5, 5, (8, 3))
    pts = np.concatenate([
        centers[i % 8] + rng.normal(scale=0.3, size=(64, 3))
        for i in range(32)
    ]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    valid[100:120] = False

    perm = np.asarray(morton_perm(jnp.asarray(pts), jnp.asarray(valid)))
    assert sorted(perm.tolist()) == list(range(len(pts)))  # a permutation
    # invalid slots sort to the end
    assert not valid[perm][: valid.sum()].sum() < valid.sum()
    assert not valid[perm][valid.sum():].any()

    def tile_bbox_volume(order):
        p = pts[order]
        v = valid[order]
        vol = 0.0
        for s in range(0, len(p), 256):
            q = p[s : s + 256][v[s : s + 256]]
            if len(q):
                vol += np.prod(q.max(0) - q.min(0))
        return vol

    v_sorted = tile_bbox_volume(perm)
    v_insert = tile_bbox_volume(np.arange(len(pts)))
    assert v_sorted < v_insert * 0.5, (v_sorted, v_insert)

    # all-invalid table: codes are all sentinels, no NaN poisoning
    codes = np.asarray(
        morton_codes(jnp.asarray(pts), jnp.zeros(len(pts), bool))
    )
    assert (codes == 0x7FFFFFFF).all()


def test_render_identical_with_morton_sort():
    """Permuting the stage-1 table must not change the rendered output
    (stage 1 only consumes distances)."""
    import jax.numpy as jnp

    from dynam3d_tpu.ops.knn import knn_banded, morton_perm

    rng = np.random.default_rng(5)
    R, NS, K, radius = 6, 21, 4, 1.0
    dirs = rng.normal(size=(R, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    q = (dirs[:, None, :] * np.linspace(0, 6, NS)[None, :, None]).astype(
        np.float32
    )
    pts = rng.uniform(-6, 6, (700, 3)).astype(np.float32)
    valid = rng.uniform(size=700) > 0.2

    d0, _ = knn_banded(
        jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid), K, radius,
        tile=128, band=8,
    )
    perm = morton_perm(jnp.asarray(pts), jnp.asarray(valid))
    d1, _ = knn_banded(
        jnp.asarray(q), jnp.asarray(pts)[perm], jnp.asarray(valid)[perm],
        K, radius, tile=128, band=8,
    )
    in_r = np.asarray(d0) < radius * radius
    np.testing.assert_allclose(
        np.asarray(d1)[in_r], np.asarray(d0)[in_r], rtol=1e-4, atol=1e-5
    )
