"""Tests for the FastSAM/YOLOv8-seg port (tiny width, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynam3d_tpu.models.encoders.yolov8_seg import (
    SegOutput,
    forward,
    init_yolov8_params,
    nms_select,
    segment_id_map,
)


def test_forward_shapes():
    p = init_yolov8_params(jax.random.PRNGKey(0), width=0.125, depth_n=(1, 1, 1, 1))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    )
    out = forward(p, x, depth_n=(1, 1, 1, 1))
    A = (8 * 8 + 4 * 4 + 2 * 2)  # strides 8/16/32 over 64px
    assert out.boxes.shape == (1, A, 4)
    assert out.scores.shape == (1, A)
    assert out.coeffs.shape == (1, A, 32)
    assert out.protos.shape == (1, 16, 16, 32)
    assert np.isfinite(np.asarray(out.boxes)).all()
    s = np.asarray(out.scores)
    assert ((s >= 0) & (s <= 1)).all()


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],     # heavy overlap with 0
            [50, 50, 60, 60],   # separate
            [0, 0, 10, 10],     # duplicate of 0
        ],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    idx, valid = nms_select(boxes, scores, conf=0.5, iou_thr=0.5, max_masks=4, pre_topk=4)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_nms_conf_filter():
    boxes = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.1])
    idx, valid = nms_select(boxes, scores, conf=0.4, iou_thr=0.8, max_masks=4, pre_topk=2)
    assert int(valid.sum()) == 1
    assert int(idx[0]) == 0


def test_segment_id_map_contract():
    """Hand-crafted output: two boxes -> consecutive ids on the patch grid."""
    Hp = Wp = 16  # proto res for a 64px image
    protos = np.zeros((1, Hp, Wp, 2), np.float32)
    protos[0, :, :8, 0] = 8.0    # proto 0 lights left half
    protos[0, :, 8:, 1] = 8.0    # proto 1 lights right half
    boxes = np.zeros((1, 4, 4), np.float32)
    boxes[0, 0] = [0, 0, 32, 64]    # left half of 64px img
    boxes[0, 1] = [32, 0, 64, 64]   # right half
    scores = np.zeros((1, 4), np.float32)
    scores[0, :2] = [0.9, 0.8]
    coeffs = np.zeros((1, 4, 2), np.float32)
    coeffs[0, 0, 0] = 1.0
    coeffs[0, 1, 1] = 1.0
    out = SegOutput(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray(scores),
        coeffs=jnp.asarray(coeffs),
        protos=jnp.asarray(protos),
    )
    ids = np.asarray(
        segment_id_map(out, (64, 64), (4, 4), conf=0.4, iou_thr=0.8, max_masks=4)
    ).reshape(4, 4)
    # left two columns one id, right two another; consecutive from 0
    assert ids.min() == 0
    assert len(np.unique(ids)) == 2
    assert (ids[:, :2] == ids[0, 0]).all()
    assert (ids[:, 2:] == ids[0, 3]).all()
    assert ids[0, 0] != ids[0, 3]


def test_segment_id_map_on_random_forward():
    p = init_yolov8_params(jax.random.PRNGKey(1), width=0.125, depth_n=(1, 1, 1, 1))
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    out = forward(p, x, depth_n=(1, 1, 1, 1))
    ids = np.asarray(segment_id_map(out, (64, 64), (4, 4), conf=0.0, max_masks=8))
    assert ids.shape == (2, 16)
    assert (ids >= 0).all() and (ids < 8 + 1).all()
