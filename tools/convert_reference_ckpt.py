"""One-command reference-checkpoint conversion.

Maps the reference's torch assets into a saved parameter tree that
``dynam3d_tpu`` loads directly — the first thing a migrating user runs
(docs/MIGRATING.md §1).  Each asset is optional; whatever is provided is
converted, everything else stays randomly initialized so the result is
always a complete, loadable tree.

Usage:
    python tools/convert_reference_ckpt.py \
        --out data/converted \
        [--dynam3d dynam3d.pth]                # Feature_Fields (VLN)
        [--pretrain ckpt.iter80000.pth]        # 3DFF pretrain (fields+render)
        [--llava path/to/llava-phi-3-mini.sd]  # torch.load'able state dict
        [--clip ViT-L-14-336px.sd]             # OpenAI CLIP state dict
        [--fastsam FastSAM.sd]                 # FastSAM.pt["model"].state_dict()
        [--waypoint check_cwp_bestdist_hfov90] [--ddppo gibson-2plus-resnet50.pth]

Assets given as ``.pth``/``.pt`` are loaded with ``torch.load(...,
map_location="cpu")``; raw-object checkpoints (ultralytics FastSAM.pt)
should be pre-exported to plain state dicts on a torch host first.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _load_sd(path):
    if isinstance(path, dict):  # in-memory state dict (tools/parity_run.py)
        return path
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        obj = obj["model"].state_dict()
    return obj


def convert(cfg, paths: dict):
    """Build the full policy param tree, overlaying converted assets."""
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.render.nerf import init_render_params
    from dynam3d_tpu.runtime import checkpoint as ck

    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    render = init_render_params(jax.random.PRNGKey(1), cfg.fields)
    report = {}

    if paths.get("dynam3d"):
        sd = _load_sd(paths["dynam3d"])
        params["fields"] = ck.field_params_from_torch(sd)
        report["fields"] = "dynam3d"
    if paths.get("pretrain"):
        sd = ck.strip_prefix(_load_sd(paths["pretrain"]), "net.feature_fields.")
        params["fields"] = ck.field_params_from_torch(sd)
        render = ck.render_params_from_torch(sd, cfg.fields)
        report["fields"] = report["render"] = "pretrain"
    if paths.get("clip"):
        sd = _load_sd(paths["clip"])
        params["clip"] = ck.clip_params_from_torch(
            sd, cfg.clip.vision_layers, cfg.clip.text_layers
        )
        report["clip"] = "clip"
    if paths.get("llava"):
        sd = _load_sd(paths["llava"])
        params["llava"] = {
            # encode_image reads the tower under "visual"; the HF ckpt has
            # no text tower, so the init one is kept (LLaVA never uses it)
            "clip": {
                "visual": ck.clip_vision_from_hf(sd, cfg.clip.vision_layers),
                "text": params["llava"]["clip"]["text"],
            },
            "projector": ck.llava_projector_from_torch(sd),
            "phi3": ck.phi3_params_from_torch(sd, cfg.llava.phi3.num_layers),
        }
        report["llava"] = "llava"
    if paths.get("vln"):
        # trainer checkpoint ckpt.iterN.pth: the whole policy under "net."
        # (ss_trainer_Dynam3D.py:75-84); DDP runs leave "net.module.".
        sd = ck.strip_prefix(_load_sd(paths["vln"]), "net.")
        sd = {
            (k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()
        }

        def sub(prefix):
            return {k[len(prefix):]: v for k, v in sd.items()
                    if k.startswith(prefix)}

        fields_part = sub("feature_fields.")
        if fields_part:
            params["fields"] = ck.field_params_from_torch(fields_part)
            report["fields"] = "vln"
        llava_part = sub("llava.")
        if llava_part:
            params["llava"] = {
                "clip": {
                    "visual": ck.clip_vision_from_hf(
                        llava_part, cfg.clip.vision_layers
                    ),
                    "text": params["llava"]["clip"]["text"],
                },
                "projector": ck.llava_projector_from_torch(llava_part),
                "phi3": ck.phi3_params_from_torch(
                    llava_part, cfg.llava.phi3.num_layers
                ),
            }
            report["llava"] = "vln"
        for ours, theirs in (
            ("patch_pos_emb", "patch_position_embedding"),
            ("inst_pos_emb", "instance_position_embedding"),
            ("zone_pos_emb", "zone_position_embedding"),
            ("inst_proj", "instance_projector"),
            ("zone_proj", "zone_projector"),
        ):
            if f"{theirs}.0.weight" in sd:
                params[ours] = ck.mlp2_from_torch(sd, theirs)
                report[ours] = "vln"
    if paths.get("fastsam"):
        sd = _load_sd(paths["fastsam"])
        params["yolo"] = ck.yolov8_params_from_torch(
            sd, depth_n=cfg.segmenter.depth_layers()
        )
        report["yolo"] = "fastsam"
    extras = {"render": render}
    if paths.get("waypoint"):
        sd = _load_sd(paths["waypoint"])
        extras["waypoint"] = ck.waypoint_params_from_torch(sd)
        report["waypoint"] = "waypoint"
    if paths.get("ddppo"):
        sd = ck.strip_prefix(
            _load_sd(paths["ddppo"]), "actor_critic.net.visual_encoder."
        )
        extras["depth_enc"] = ck.depth_resnet_from_torch(sd)
        report["depth_enc"] = "ddppo"
    return params, extras, report


def main(argv=None):
    from dynam3d_tpu.config import Dynam3DConfig, load
    from dynam3d_tpu.runtime.checkpoint import save_checkpoint

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--exp-config", default=None)
    for name in ("dynam3d", "pretrain", "vln", "llava", "clip", "fastsam",
                 "waypoint", "ddppo"):
        p.add_argument(f"--{name}", default=None)
    args = p.parse_args(argv)

    cfg = load(args.exp_config) if args.exp_config else Dynam3DConfig()
    paths = {k: getattr(args, k) for k in
             ("dynam3d", "pretrain", "vln", "llava", "clip", "fastsam",
              "waypoint", "ddppo")}
    params, extras, report = convert(cfg, paths)
    path = save_checkpoint(args.out, 0, {"params": params, **extras})
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"converted {report or '(no assets: random init)'} -> {path} "
          f"({n/1e6:.1f}M policy params)")


if __name__ == "__main__":
    main()
