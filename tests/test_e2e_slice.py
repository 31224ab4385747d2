"""Minimum end-to-end slice (BASELINE config 4): posed RGB-D -> CLIP grid ->
segments -> 3D memory -> instance/zone tokens -> VLM prefill/decode -> action
text -> feed step.  Tiny configs, CPU, random weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynam3d_tpu.config import (
    CLIPConfig,
    DepthEncoderConfig,
    Dynam3DConfig,
    FieldsConfig,
    LLaVAConfig,
    Phi3Config,
    SegmenterConfig,
    WaypointConfig,
)
from dynam3d_tpu.models import policy as policy_mod
from dynam3d_tpu.runtime.episode import EpisodeRunner
from dynam3d_tpu.runtime.feed import STOP, SyntheticRoomFeed


def tiny_config() -> Dynam3DConfig:
    return Dynam3DConfig(
        fields=FieldsConfig(
            input_height=4, input_width=4, fts_dim=64,
            patch_capacity=256, instance_capacity=64, zone_capacity=32,
            max_segments=8, max_members=32, max_zone_members=16,
        ),
        clip=CLIPConfig(
            image_size=56, patch_size=14, vision_width=64, vision_layers=2,
            vision_heads=2, embed_dim=64, text_context=16, text_width=32,
            text_layers=1, text_heads=2, vocab_size=64,
        ),
        llava=LLaVAConfig(
            phi3=Phi3Config(
                vocab_size=512, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=2, num_kv_heads=2, head_dim=32,
                pad_token_id=260, end_token_id=257,
            ),
            projector_hidden=64,
            prefill_bucket=64,
            max_new_tokens=8,
        ),
        # tiny learned segmenter: the e2e slice drives the SAME provider the
        # reference always runs (FastSAM, feature_fields.py:750-780)
        segmenter=SegmenterConfig(
            provider="yolov8", imgsz=32, width_mult=0.125, depth_mult=0.34,
            num_protos=8, max_masks=8,
        ),
        # tiny frozen waypoint pipeline so the trainer's default-on
        # candidate path (VLNTrainer.__init__) stays cheap on CPU
        depth=DepthEncoderConfig(
            input_size=64, output_size=32, base_planes=8, ngroups=4
        ),
        waypoint=WaypointConfig(
            hidden_dim=64, trm_layers=1, num_attention_heads=4
        ),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = policy_mod.init_policy_params(
        jax.random.PRNGKey(0), cfg, llm_dtype=jnp.float32
    )
    return cfg, params


def test_perceive_builds_memory_and_tokens(setup):
    cfg, params = setup
    B, V = 2, 1
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (B, V, 56, 56, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.uniform(0.05, 0.9, (B, V, 32, 32)).astype(np.float32))
    pos = jnp.asarray(np.tile(np.float32([1.0, 1.25, 2.0]), (B, 1)))
    hd = jnp.zeros((B,), jnp.float32)
    state = policy_mod.batched_init_state(cfg, B)
    out = policy_mod.perceive(params, cfg, state, rgb, depth, pos, hd)
    n_mm = V * 16 + policy_mod.I_ENV + policy_mod.Z_ENV
    assert out.mm_tokens.shape == (B, n_mm, cfg.llava.phi3.hidden_size)
    assert out.mm_valid.shape == (B, n_mm)
    # patch slots always valid; some instances within 5m
    assert bool(out.mm_valid[:, :16].all())
    assert int(out.n_inst.min()) >= 1
    assert int(out.state.inst_valid.sum()) >= 2
    assert np.isfinite(np.asarray(out.mm_tokens, np.float32)).all()

    # second step from a displaced pose keeps the tables bounded & consistent
    out2 = policy_mod.perceive(
        params, cfg, out.state, rgb, depth,
        pos + jnp.asarray([0.2, 0.0, 0.0]), hd + 0.1,
    )
    assert int(out2.state.patch_valid.sum()) <= cfg.fields.patch_capacity * B
    # every owned patch points at a valid instance
    owner = np.asarray(out2.state.patch_owner)
    valid = np.asarray(out2.state.patch_valid)
    inst_valid = np.asarray(out2.state.inst_valid)
    for b in range(B):
        owned = owner[b][valid[b]]
        assert (owned >= 0).all()
        assert inst_valid[b][owned].all()


def test_uint16_depth_wire_matches_f32(setup):
    """The uint16 depth wire format (EpisodeRunner.pack_depth, dequantized at
    the top of policy.perceive) must produce the same memory tables and
    multimodal tokens as the f32 path within quantization tolerance
    (1/65535 of the normalized range = 0.15 mm at the 10 m sensor scale)."""
    cfg, params = setup
    B, V = 1, 1
    rng = np.random.default_rng(7)
    rgb = jnp.asarray(rng.integers(0, 255, (B, V, 56, 56, 3), dtype=np.uint8))
    depth_f32 = rng.uniform(0.05, 0.9, (B, V, 32, 32)).astype(np.float32)
    packed = EpisodeRunner.pack_depth(depth_f32)
    assert packed.dtype == np.uint16
    # round-trip quantization bound
    assert np.abs(packed.astype(np.float32) / 65535.0 - depth_f32).max() <= (
        0.5 / 65535.0 + 1e-7
    )
    pos = jnp.asarray(np.tile(np.float32([1.0, 1.25, 2.0]), (B, 1)))
    hd = jnp.zeros((B,), jnp.float32)
    state = policy_mod.batched_init_state(cfg, B)
    out_f = policy_mod.perceive(params, cfg, state, jnp.asarray(rgb),
                                jnp.asarray(depth_f32), pos, hd)
    out_u = policy_mod.perceive(params, cfg, state, jnp.asarray(rgb),
                                jnp.asarray(packed), pos, hd)
    np.testing.assert_array_equal(
        np.asarray(out_f.mm_valid), np.asarray(out_u.mm_valid)
    )
    # the <=1/65535 depth shift moves patch positions by <=0.15 mm, which
    # the position-MLP + aggregator stack amplifies to ~1e-2 in token
    # space (0.75% of elements at tiny dims); membership (mm_valid) must
    # not flip, token values get the amplified bound
    np.testing.assert_allclose(
        np.asarray(out_f.mm_tokens, np.float32),
        np.asarray(out_u.mm_tokens, np.float32),
        rtol=0, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_f.state.patch_pos), np.asarray(out_u.state.patch_pos),
        rtol=0, atol=1e-3,
    )


def test_closed_loop_episode_runs(setup):
    cfg, params = setup
    feeds = [
        SyntheticRoomFeed(rgb_size=56, depth_size=32, views=1, seed=i)
        for i in range(2)
    ]
    runner = EpisodeRunner(params, cfg)
    results = runner.run(feeds, max_steps=3)
    assert len(results) == 2
    for r in results:
        assert r is not None and r["steps"] >= 1
        assert np.isfinite(r["distance_to_goal"])


def test_train_loss_path(setup):
    cfg, params = setup
    from dynam3d_tpu.models.vlm.tokenizer import ByteTokenizer, build_prompt

    tok = ByteTokenizer(512)
    B, V = 1, 1
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.integers(0, 255, (B, V, 56, 56, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.uniform(0.05, 0.9, (B, V, 32, 32)).astype(np.float32))
    pos = jnp.asarray([[1.0, 1.25, 2.0]], jnp.float32)
    hd = jnp.zeros((B,), jnp.float32)
    state = policy_mod.batched_init_state(cfg, B)
    out = policy_mod.perceive(params, cfg, state, rgb, depth, pos, hd)

    n_mm = out.mm_tokens.shape[1]
    gt = "turn left 2 steps, move 4 steps.<|end|>"
    full = build_prompt("go", ["none\n"] * 4, n_mm, gt)
    ids = tok.encode(full)
    label_ids = tok.encode(gt, add_bos=False)
    T = 512
    ids_a = np.full((B, T), tok.pad_id, np.int32)
    val_a = np.zeros((B, T), bool)
    ids_a[0, : len(ids)] = ids
    val_a[0, : len(ids)] = True
    Tg = len(label_ids)
    splice = ids.index(tok.image_id)
    out_t = policy_mod.train_loss(
        params, cfg, jnp.asarray(ids_a), jnp.asarray(val_a),
        out.mm_tokens, out.mm_valid,
        jnp.asarray([label_ids]), jnp.ones((B, Tg), bool),
        jnp.ones((B,), jnp.float32), splice,
    )
    assert np.isfinite(float(out_t.loss))
    assert out_t.logits_at_labels.shape == (B, Tg, 512)
