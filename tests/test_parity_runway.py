"""The real-weights parity runway (tools/parity_run.py + runtime/synth_sd.py).

Proves the torch->JAX conversion path end-to-end with synthesized
reference-format state dicts: every converter's key naming, shapes and
transposes round-trip exactly (synth is the converter inverse by
construction), the trainer-checkpoint (--vln) route loads projectors +
llava + fields, and the CLI produces the stats/parity artifacts.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_reference_ckpt import convert
from parity_run import _config, _tree_max_diff, main as parity_main
from dynam3d_tpu.models import policy as policy_mod
from dynam3d_tpu.models.render.nerf import init_render_params
from dynam3d_tpu.runtime import checkpoint as ck
from dynam3d_tpu.runtime import synth_sd


@pytest.fixture(scope="module")
def tiny():
    cfg = _config("tiny", 2)
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _identity_tail(truth_llava, converted_llava):
    tv = dict(truth_llava["clip"]["visual"])
    tv["ln_post"] = converted_llava["clip"]["visual"]["ln_post"]
    tv["proj"] = converted_llava["clip"]["visual"]["proj"]
    return {
        **truth_llava,
        "clip": {"visual": tv, "text": truth_llava["clip"]["text"]},
    }


def test_asset_roundtrip_exact(tiny):
    cfg, params = tiny
    sds = synth_sd.synth_all(params, cfg)
    out, extras, report = convert(cfg, {
        "dynam3d": sds["dynam3d"], "clip": sds["clip"],
        "llava": sds["llava"], "fastsam": sds["fastsam"],
    })
    assert report == {
        "fields": "dynam3d", "clip": "clip", "llava": "llava",
        "yolo": "fastsam",
    }
    assert _tree_max_diff(params["fields"], out["fields"]) == 0.0
    assert _tree_max_diff(params["clip"], out["clip"]) == 0.0
    assert _tree_max_diff(params["yolo"], out["yolo"]) == 0.0
    assert _tree_max_diff(
        _identity_tail(params["llava"], out["llava"]), out["llava"]
    ) == 0.0


def test_vln_trainer_ckpt_route(tiny):
    """ckpt.iterN.pth (net.-prefixed whole policy) loads projectors, llava
    and fields in one shot — including the DDP net.module. variant."""
    cfg, params = tiny
    sd = synth_sd.vln_ckpt_sd(params, cfg.clip.vision_layers)
    out, _, report = convert(cfg, {"vln": sd})
    for k in ("patch_pos_emb", "inst_pos_emb", "zone_pos_emb",
              "inst_proj", "zone_proj"):
        assert report[k] == "vln"
        assert _tree_max_diff(params[k], out[k]) == 0.0
    assert _tree_max_diff(params["fields"], out["fields"]) == 0.0
    assert _tree_max_diff(
        _identity_tail(params["llava"], out["llava"]), out["llava"]
    ) == 0.0

    ddp = {f"net.module.{k[len('net.'):]}" : v for k, v in sd.items()}
    out2, _, _ = convert(cfg, {"vln": ddp})
    assert _tree_max_diff(params["fields"], out2["fields"]) == 0.0


def test_pretrain_ckpt_route(tiny):
    """Pretrain checkpoint -> fields + render heads (tcnn flat layout)."""
    from dynam3d_tpu.config import apply_opts

    cfg, params = tiny
    # the tcnn layout param must match the renderer width (768==768 at full
    # scale; the tiny config shrinks fts_dim so mirror it here)
    cfg = apply_opts(cfg, [f"fields.mlp_net_width={cfg.fields.fts_dim}"])
    render = init_render_params(jax.random.PRNGKey(1), cfg.fields)
    sds = synth_sd.synth_all(params, cfg, render_params=render)
    out, extras, report = convert(cfg, {"pretrain": sds["pretrain"]})
    assert report["render"] == "pretrain"
    assert _tree_max_diff(params["fields"], out["fields"]) == 0.0
    assert _tree_max_diff(render, extras["render"]) == 0.0


def test_waypoint_ddppo_routes(tiny):
    cfg, _ = tiny
    from dynam3d_tpu.config import DepthEncoderConfig, WaypointConfig
    from dynam3d_tpu.models.encoders.depth_resnet import init_depth_params
    from dynam3d_tpu.models.waypoint.trm import init_waypoint_params

    wp = init_waypoint_params(jax.random.PRNGKey(2), WaypointConfig())
    dp = init_depth_params(jax.random.PRNGKey(3), DepthEncoderConfig())
    _, extras, report = convert(cfg, {
        "waypoint": synth_sd.waypoint_sd(wp),
        "ddppo": synth_sd.ddppo_sd(dp),
    })
    assert report["waypoint"] == "waypoint" and report["depth_enc"] == "ddppo"
    assert _tree_max_diff(wp, extras["waypoint"]) == 0.0
    assert _tree_max_diff(dp, extras["depth_enc"]) == 0.0


def test_tcnn_flat_roundtrip():
    """The assumed tinycudann flat layout is at least self-consistent:
    flatten -> unflatten is the identity for padded in/out widths."""
    rng = np.random.default_rng(0)
    mats = [rng.normal(size=s).astype(np.float32)
            for s in [(7, 32), (32, 32), (32, 9)]]
    flat = synth_sd._tcnn_flat(mats, 7, 9)
    back = ck.tcnn_mlp_from_flat(flat, 7, 9, 32, 2)
    for m, b in zip(mats, back):
        np.testing.assert_allclose(m, np.asarray(b), rtol=0, atol=0)


@pytest.mark.slow
def test_cli_episode_artifacts(tiny, tmp_path):
    """Full CLI: synth -> convert -> 2-step episode -> artifacts on disk."""
    out = tmp_path / "parity"
    parity_main([
        "--out", str(out), "--synth", "--scale", "tiny", "--steps", "2",
        "--quant-bits", "0",
    ])
    report = json.load(open(out / "parity_report.json"))
    assert report["roundtrip_max_abs_diff"] == {
        "fields": 0.0, "clip": 0.0, "llava": 0.0, "yolo": 0.0
    }
    steps = [json.loads(l) for l in open(out / "steps_parity.jsonl")]
    assert len(steps) >= 1 and "action_ids" in steps[0]
    agg = json.load(open(out / "stats_parity.json"))
    assert "spl" in agg and "ndtw" in agg
