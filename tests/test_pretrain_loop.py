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
