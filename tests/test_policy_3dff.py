"""Tests for the pretrain policy net (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynam3d_tpu.config import (
    CLIPConfig,
    DepthEncoderConfig,
    Dynam3DConfig,
    FieldsConfig,
)
from dynam3d_tpu.models import policy_3dff
from dynam3d_tpu.models.encoders.depth_resnet import init_depth_params
from dynam3d_tpu.models.encoders.clip import init_clip_params
from dynam3d_tpu.models.memory3d import init_field_params, init_state
from dynam3d_tpu.models.waypoint.trm import init_waypoint_params

CFG = Dynam3DConfig(
    fields=FieldsConfig(
        input_height=4, input_width=4, fts_dim=32,
        patch_capacity=512, instance_capacity=64, zone_capacity=32,
        max_segments=8, max_members=32, max_zone_members=8,
    ),
    clip=CLIPConfig(
        image_size=56, patch_size=14, vision_width=32, vision_layers=1,
        vision_heads=2, embed_dim=32, text_context=8, text_width=16,
        text_layers=1, text_heads=2, vocab_size=32,
    ),
    depth=DepthEncoderConfig(input_size=64),
)


def test_clockwise_reorder_roundtrip():
    x = jnp.arange(24).reshape(1, 12, 2)
    cw = policy_3dff.clockwise_reorder(x)
    # slot 0 keeps sensor 0; slot 1 holds sensor 11
    np.testing.assert_array_equal(np.asarray(cw[0, 0]), [0, 1])
    np.testing.assert_array_equal(np.asarray(cw[0, 1]), [22, 23])
    back = policy_3dff.counter_clockwise_restore(cw)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_perceive_panorama_shapes():
    key = jax.random.PRNGKey(0)
    params = {
        "fields": init_field_params(key, CFG.fields),
        "clip": init_clip_params(jax.random.fold_in(key, 1), CFG.clip),
        "depth_enc": init_depth_params(jax.random.fold_in(key, 2), CFG.depth),
        "waypoint": init_waypoint_params(
            jax.random.fold_in(key, 3), CFG.waypoint, depth_feat_dim=128
        ),
    }
    B = 1
    rng = np.random.default_rng(0)
    rgb12 = jnp.asarray(rng.integers(0, 255, (B, 12, 56, 56, 3), dtype=np.uint8))
    depth12 = jnp.asarray(rng.uniform(0.1, 0.9, (B, 12, 64, 64)).astype(np.float32))
    pos = jnp.asarray([[1.0, 1.25, 2.0]], jnp.float32)
    hd = jnp.zeros((B,), jnp.float32)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_state(CFG.fields)
    )
    out = policy_3dff.perceive_panorama(params, CFG, state, rgb12, depth12, pos, hd)
    assert out.heatmap_logits.shape == (B, 120, 12)
    assert out.depth_feats.shape == (B, 12, 128)
    # 4 views folded into the memory
    assert int(out.state.patch_valid.sum()) == 4 * 16
    assert int(out.state.inst_valid.sum()) >= 4
    cands = policy_3dff.candidates_from_heatmap(CFG, out.heatmap_logits)
    assert int(cands.mask.sum()) >= 1


def test_sample_waypoints_train_bins():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(1, 120, 12)).astype(np.float32)
    sa, sd = policy_3dff.sample_waypoints_train(logits, [[17, 55]], rng)
    assert len(sa[0]) == 2 and len(sd[0]) == 2
    for a, d in zip(sa[0], sd[0]):
        assert 0 <= a < 120 and 0 <= d < 12
    # sampled angle stays within the candidate's 12-view sector region
    img = (17 + 5) // 10  # sector 2
    lo = (img - 1) * 10 + 5
    assert lo <= sa[0][0] < lo + 10
