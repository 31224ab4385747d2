"""Tests for CLIP, depth-resnet encoders and the waypoint predictor (tiny cfgs)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynam3d_tpu.config import CLIPConfig, DepthEncoderConfig, WaypointConfig
from dynam3d_tpu.models.encoders import clip as clip_mod
from dynam3d_tpu.models.encoders.depth_resnet import (
    encode_depth,
    init_depth_params,
    preprocess_depth,
)
from dynam3d_tpu.models.waypoint.trm import (
    extract_candidates,
    init_waypoint_params,
    neighbor_attention_mask,
    predict_heatmap,
)

TINY_CLIP = CLIPConfig(
    image_size=56, patch_size=14, vision_width=64, vision_layers=3,
    vision_heads=4, embed_dim=32, text_context=16, text_width=48,
    text_layers=2, text_heads=4, vocab_size=100,
)


def test_clip_image_shapes_and_hidden_layer():
    p = clip_mod.init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 56, 56, 3)).astype(np.float32))
    cls, patches = clip_mod.encode_image(p, TINY_CLIP, img)
    assert cls.shape == (2, 32)
    assert patches.shape == (2, 16, 32)  # 4x4 grid
    hidden = clip_mod.encode_image(p, TINY_CLIP, img, hidden_layer=-1)
    assert hidden.shape == (2, 17, 64)
    # hidden_layer=-1 must equal running one block fewer
    h_manual = clip_mod.encode_image(p, TINY_CLIP, img, hidden_layer=-2)
    assert not np.allclose(np.asarray(hidden), np.asarray(h_manual))


def test_clip_preprocess_resize_and_normalize():
    rgb = jnp.full((1, 20, 20, 3), 128, jnp.uint8)
    x = clip_mod.preprocess_rgb(rgb, size=56)
    assert x.shape == (1, 56, 56, 3)
    want = (128 / 255.0 - np.array(clip_mod.CLIP_MEAN)) / np.array(clip_mod.CLIP_STD)
    np.testing.assert_allclose(np.asarray(x[0, 28, 28]), want, rtol=1e-4)


def test_clip_text_eot_zeroing():
    p = clip_mod.init_clip_params(jax.random.PRNGKey(1), TINY_CLIP)
    tokens = jnp.zeros((2, 16), jnp.int32)
    # EOT = highest id; put it at position 5 (row 0) and 9 (row 1)
    tokens = tokens.at[0, 5].set(99).at[1, 9].set(99)
    tokens = tokens.at[0, 1:5].set(7).at[1, 1:9].set(7)
    all_feats, sep = clip_mod.encode_all_text(p, TINY_CLIP, tokens)
    assert all_feats.shape == (2, 16, 32) and sep.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(all_feats[0, 6:]), 0.0)
    np.testing.assert_allclose(np.asarray(all_feats[1, 10:]), 0.0)
    assert np.abs(np.asarray(all_feats[0, 5])).sum() > 0
    np.testing.assert_allclose(np.asarray(all_feats[0, 5]), np.asarray(sep[0]), rtol=1e-5)
    # encode_text agrees with sep
    et = clip_mod.encode_text(p, TINY_CLIP, tokens)
    np.testing.assert_allclose(np.asarray(et), np.asarray(sep), rtol=1e-4, atol=1e-5)


def test_depth_encoder_output_size():
    cfg = DepthEncoderConfig(input_size=64)  # small input for CPU speed
    p = init_depth_params(jax.random.PRNGKey(0), cfg)
    d = jnp.ones((1, 64, 64, 1), jnp.float32) * 0.5
    out = encode_depth(p, cfg, d)
    # 64 -> /32 = 2x2 spatial, 32 channels -> 128 flat
    assert out.shape == (1, 32 * 2 * 2)
    assert np.isfinite(np.asarray(out)).all()


def test_preprocess_depth_zero_fill():
    d = jnp.asarray([[[[0.0], [0.5]], [[0.25], [0.0]]]])  # [1,2,2,1]
    out = np.asarray(preprocess_depth(d, (0.0, 10.0)))
    # column 0 max = 0.25 -> zero at (0,0) becomes 2.5; column 1 max 0.5 -> (1,1) -> 5.0
    np.testing.assert_allclose(out[0, :, :, 0], [[2.5, 5.0], [2.5, 5.0]])


def test_neighbor_mask_matches_reference():
    m = neighbor_attention_mask(12, 1)
    # circulant: row i attends {i-1, i, i+1} mod 12... as built by np.roll of
    # the template [1,1,0,...,0,1]
    want_row0 = np.zeros(12, bool)
    want_row0[[0, 1, 11]] = True
    np.testing.assert_array_equal(m[0], want_row0)
    np.testing.assert_array_equal(m[3], np.roll(want_row0, 3))


def test_waypoint_heatmap_and_candidates():
    cfg = WaypointConfig()
    p = init_waypoint_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(24, 128, 4, 4)).astype(np.float32))  # B=2
    hm = predict_heatmap(p, cfg, feats)
    assert hm.shape == (2, 120, 12)
    cands = extract_candidates(cfg, hm)
    assert cands.angles_ccw.shape == (2, 5)
    assert int(cands.mask.sum()) >= 2  # at least one peak per row
    a = np.asarray(cands.angles_ccw)
    d = np.asarray(cands.distances)
    m = np.asarray(cands.mask)
    assert ((a[m] >= 0) & (a[m] <= 2 * np.pi)).all()
    assert ((d[m] >= 0.25) & (d[m] <= 3.0)).all()
    img = np.asarray(cands.img_idxes)
    assert ((img[m] >= 0) & (img[m] < 12)).all()
