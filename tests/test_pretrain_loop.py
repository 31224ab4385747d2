"""End-to-end 3DFF pretraining loop over the synthetic frames dataset."""

import numpy as np
import jax
import pytest

from dynam3d_tpu.config import CLIPConfig, Dynam3DConfig, FieldsConfig
from dynam3d_tpu.models.encoders.clip import init_clip_params
from dynam3d_tpu.models.memory3d import init_field_params
from dynam3d_tpu.models.render.nerf import init_render_params
from dynam3d_tpu.runtime.logging import MetricsLogger
from dynam3d_tpu.runtime.pretrain_loop import PretrainRunner, SyntheticFramesDataset

CFG = Dynam3DConfig(
    fields=FieldsConfig(
        input_height=4, input_width=4, fts_dim=32,
        patch_capacity=256, instance_capacity=64, zone_capacity=32,
        max_segments=8, max_members=32, max_zone_members=8,
        view_height=4, view_width=4, n_samples=17, n_importance=4,
        search_num=2, mlp_net_width=32,
    ),
    clip=CLIPConfig(
        image_size=56, patch_size=14, vision_width=32, vision_layers=1,
        vision_heads=2, embed_dim=32, text_context=8, text_width=16,
        text_layers=1, text_heads=2, vocab_size=32,
    ),
)


def test_pretrain_loop_runs_and_logs(tmp_path):
    key = jax.random.PRNGKey(0)
    params = {
        "fields": init_field_params(key, CFG.fields),
        "render": init_render_params(jax.random.fold_in(key, 1), CFG.fields),
        "clip": init_clip_params(jax.random.fold_in(key, 2), CFG.clip),
    }
    runner = PretrainRunner(params, CFG)
    datasets = [
        SyntheticFramesDataset(frames=2, seed=0),
        SyntheticFramesDataset(frames=2, seed=1, use_labels=False),
    ]
    logger = MetricsLogger(str(tmp_path))
    hist = runner.run(datasets, iters=2, logger=logger,
                      ckpt_dir=str(tmp_path / "ck"), log_every=2)
    logger.close()
    assert len(hist) == 2
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert not any(h["skipped"] for h in hist)
    # scalars written
    lines = open(tmp_path / "scalars.jsonl").read().strip().splitlines()
    assert len(lines) >= 10
    # checkpoint written after iter 2
    import os
    assert any(d.startswith("ckpt.iter") for d in os.listdir(tmp_path / "ck"))


def test_pretrain_loop_posed_frames(tmp_path):
    """FramesDriver shape with real (K, R, T): the posed render path
    (reference generic-intrinsics branch, feature_fields.py:505-537) is the
    one compiled and run, and losses stay finite."""
    key = jax.random.PRNGKey(1)
    params = {
        "fields": init_field_params(key, CFG.fields),
        "render": init_render_params(jax.random.fold_in(key, 1), CFG.fields),
        "clip": init_clip_params(jax.random.fold_in(key, 2), CFG.clip),
    }
    runner = PretrainRunner(params, CFG)
    datasets = [SyntheticFramesDataset(frames=2, seed=3, posed=True)]
    hist = runner.run(datasets, iters=2)
    assert len(hist) == 2
    assert all(np.isfinite(h["loss"]) for h in hist)
    # the posed step program (not the habitat one) was compiled and used
    assert set(runner._steps) == {True}


def test_posed_batch_carries_cameras():
    key = jax.random.PRNGKey(2)
    params = {
        "fields": init_field_params(key, CFG.fields),
        "render": init_render_params(jax.random.fold_in(key, 1), CFG.fields),
        "clip": init_clip_params(jax.random.fold_in(key, 2), CFG.clip),
    }
    runner = PretrainRunner(params, CFG)
    ds = SyntheticFramesDataset(frames=3, seed=5, posed=True)
    scene = ds.sample_scene()
    batch = runner.build_batch(scene, params["clip"])
    # novel views for posed scenes are ALL input frames with their R,T
    # (ss_trainer_3DFF.py:1271-1273) and the frame-0 view-scaled K
    assert batch.novel_rot.shape == (3, 3, 3)
    assert batch.novel_trans.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(batch.novel_trans), scene["trans"], atol=1e-6)
    # view_k pins the principal point to the view center
    vk = np.asarray(batch.novel_k)
    assert vk[0, 2] == CFG.fields.view_width / 2.0
    assert vk[1, 2] == CFG.fields.view_height / 2.0
    # gt render targets are the input frames' pooled grids
    assert batch.novel_gt_fts.shape[0] == 3


def test_walk_driver_episode(tmp_path):
    """hm3d WalkDriver (run_on_hm3d shape): teacher/random walk over a
    12-view feed, candidate-waypoint novel-view sampling via the
    get_cand_real_pos/get_observation RPCs, per-step grad accumulation, one
    optimizer update per episode (VERDICT r1 item 4)."""
    from dynam3d_tpu.config import DepthEncoderConfig
    from dynam3d_tpu.models.encoders.depth_resnet import init_depth_params
    from dynam3d_tpu.models.waypoint.trm import init_waypoint_params
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed
    from dynam3d_tpu.runtime.pretrain_loop import (
        WalkDriver,
        synthetic_supervision,
    )

    cfg = CFG.replace(depth=DepthEncoderConfig(input_size=64)) if hasattr(
        CFG, "replace"
    ) else CFG
    import dataclasses

    cfg = dataclasses.replace(CFG, depth=DepthEncoderConfig(input_size=64))
    key = jax.random.PRNGKey(4)
    params = {
        "fields": init_field_params(key, cfg.fields),
        "render": init_render_params(jax.random.fold_in(key, 1), cfg.fields),
        "clip": init_clip_params(jax.random.fold_in(key, 2), cfg.clip),
        "depth_enc": init_depth_params(jax.random.fold_in(key, 3), cfg.depth),
        "waypoint": init_waypoint_params(
            jax.random.fold_in(key, 4), cfg.waypoint, depth_feat_dim=128
        ),
    }
    fields_before = jax.tree_util.tree_leaves(params["fields"])[0].copy()

    runner = PretrainRunner(params, cfg)
    feed = SyntheticRoomFeed(rgb_size=56, depth_size=64, views=12, seed=7)
    walk = WalkDriver(
        feed, synthetic_supervision(0, cfg.fields.fts_dim),
        nv=2, max_len=3, seed=5,
    )
    hist = runner.run([walk], iters=2)
    assert len(hist) == 2
    for m in hist:
        assert np.isfinite(m["loss"])
        assert 1 <= m["walk_steps"] <= 3
    # the episode update actually trained the fields
    fields_after = jax.tree_util.tree_leaves(runner.params["fields"])[0]
    assert not np.allclose(np.asarray(fields_before), np.asarray(fields_after))


def test_runner_mixes_walk_and_frames():
    """The per-iteration host-agreed draw dispatches BOTH driver shapes (the
    reference's 5-dataset dispatcher, ss_trainer_3DFF.py:2237-2258)."""
    import dataclasses

    from dynam3d_tpu.config import DepthEncoderConfig
    from dynam3d_tpu.models.encoders.depth_resnet import init_depth_params
    from dynam3d_tpu.models.waypoint.trm import init_waypoint_params
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed
    from dynam3d_tpu.runtime.pretrain_loop import (
        WalkDriver,
        synthetic_supervision,
    )

    cfg = dataclasses.replace(CFG, depth=DepthEncoderConfig(input_size=64))
    key = jax.random.PRNGKey(6)
    params = {
        "fields": init_field_params(key, cfg.fields),
        "render": init_render_params(jax.random.fold_in(key, 1), cfg.fields),
        "clip": init_clip_params(jax.random.fold_in(key, 2), cfg.clip),
        "depth_enc": init_depth_params(jax.random.fold_in(key, 3), cfg.depth),
        "waypoint": init_waypoint_params(
            jax.random.fold_in(key, 4), cfg.waypoint, depth_feat_dim=128
        ),
    }
    runner = PretrainRunner(params, cfg)
    walk = WalkDriver(
        SyntheticRoomFeed(rgb_size=56, depth_size=64, views=12, seed=1),
        synthetic_supervision(1, cfg.fields.fts_dim), nv=2, max_len=2, seed=2,
    )
    frames = SyntheticFramesDataset(frames=2, seed=3)
    hist = runner.run([walk, frames], iters=3)
    assert len(hist) == 3
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_run_cli_ss_etp(tmp_path, monkeypatch):
    """CLI-level SS-ETP entry (run.py): builds the pretrain param set, mixes
    the hm3d WalkDriver with frames corpora, trains, logs, checkpoints —
    the reference's 3dff.bash launch path end-to-end."""
    import dataclasses
    import json
    import os

    from dynam3d_tpu import run as run_mod

    from dynam3d_tpu.config import DepthEncoderConfig, WaypointConfig

    cfg = dataclasses.replace(
        CFG,
        train=dataclasses.replace(
            CFG.train, iters=2, log_every=2, pretrain_traj_len=2
        ),
        depth=DepthEncoderConfig(
            input_size=64, output_size=32, base_planes=8, ngroups=4
        ),
        waypoint=WaypointConfig(
            hidden_dim=64, trm_layers=1, num_attention_heads=4
        ),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(dataclasses.asdict(cfg)))
    monkeypatch.chdir(tmp_path)
    run_mod.main([
        "--run-type", "train", "--trainer", "SS-ETP", "--exp_name", "ssetp",
        "--exp-config", str(cfg_path), "--ckpt-dir", str(tmp_path / "ck"),
    ])
    scalars = tmp_path / "data" / "logs" / "ssetp" / "scalars.jsonl"
    assert scalars.exists()
    rows = [json.loads(l) for l in scalars.read_text().splitlines()]
    assert len(rows) >= 2
    assert any(d.startswith("ckpt.iter") for d in os.listdir(tmp_path / "ck"))
