"""CLI entry: train / eval / inference dispatch.

Equivalent of the reference's ``run.py`` (Dynam3D_VLN/run.py:20-113):
``python -m dynam3d_tpu.run --exp-config cfg.json --run-type train
--exp_name exp1 [dotted.key=value ...]``.  Replaces
``torch.distributed.launch`` with JAX process env (JAX_PROCESS_INDEX /
jax.distributed for multi-host); trainer selection by registry name mirrors
``baseline_registry.get_trainer`` (run.py:100-106).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import random
from typing import Dict

import numpy as np

TRAINER_REGISTRY: Dict[str, str] = {
    # registry-name -> module path (reference names preserved)
    "Dynam3D": "dynam3d_tpu.runtime.vln_loop",      # ss_trainer_Dynam3D.py:62
    "SS-ETP": "dynam3d_tpu.runtime.trainer_3dff",   # ss_trainer_3DFF.py:63
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="dynam3d_tpu launcher")
    p.add_argument("--exp_name", type=str, default="test", help="experiment id")
    p.add_argument("--run-type", choices=["train", "eval", "inference"], required=True)
    p.add_argument("--exp-config", type=str, default=None,
                   help="config file (json/yaml); defaults apply if omitted")
    p.add_argument("--trainer", type=str, default="Dynam3D",
                   choices=sorted(TRAINER_REGISTRY))
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="dotted.key=value config overrides")
    return p


def setup_logging(exp_name: str, log_dir: str = "data/logs/running_log") -> logging.Logger:
    """Per-experiment file logger (reference run.py:78-82)."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger("dynam3d_tpu")
    logger.setLevel(logging.INFO)
    fh = logging.FileHandler(os.path.join(log_dir, f"{exp_name}.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(fh)
    logger.addHandler(logging.StreamHandler())
    return logger


def seed_everything(seed: int, rank: int = 0) -> None:
    """Per-rank seed offset (ss_trainer_Dynam3D.py:140-142)."""
    random.seed(seed + rank)
    np.random.seed(seed + rank)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from dynam3d_tpu.config import Dynam3DConfig, apply_opts, load

    cfg = load(args.exp_config) if args.exp_config else Dynam3DConfig()
    if args.opts:
        cfg = apply_opts(cfg, [o for o in args.opts if "=" in o])

    rank = int(os.environ.get("JAX_PROCESS_INDEX", "0"))
    world = int(os.environ.get("JAX_PROCESS_COUNT", "1"))
    if world > 1:
        import jax

        jax.distributed.initialize()

    logger = setup_logging(args.exp_name)
    seed_everything(args.seed or cfg.train.seed, rank)
    logger.info("exp=%s type=%s trainer=%s rank=%d/%d",
                args.exp_name, args.run_type, args.trainer, rank, world)

    import jax
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

    ckpt_dir = args.ckpt_dir or cfg.train.ckpt_dir

    def feed_factory():
        return SyntheticRoomFeed(seed=random.randint(0, 1 << 30))

    def train_feed_factory():
        # 12-view depth panorama at the depth-encoder input size for the
        # frozen waypoint predictor (the reference's pano candidates,
        # ss_trainer_Dynam3D.py:636-640); the policy consumes view 0 only
        return SyntheticRoomFeed(
            views=12, depth_size=cfg.depth.input_size,
            seed=random.randint(0, 1 << 30),
        )

    if args.trainer == "Dynam3D":
        from dynam3d_tpu.runtime.vln_loop import VLNTrainer, evaluate, inference

        params = policy_mod.init_policy_params(
            jax.random.PRNGKey(cfg.train.seed), cfg
        )
        if args.run_type == "train":
            trainer = VLNTrainer(
                params, cfg, train_feed_factory, rank=rank, world=world
            )
            start = trainer.resume(ckpt_dir) if cfg.train.is_requeue else 0
            trainer.train(cfg.train.iters - start, ckpt_dir=ckpt_dir)
        elif args.run_type == "eval":
            from dynam3d_tpu.runtime.feed import FloorplanFeed

            # demo eval mixes convex rooms with non-convex floorplans so the
            # geodesic metrics exercise both geometries
            feeds = [feed_factory() for _ in range(6)] + [
                FloorplanFeed(seed=s) for s in (1, 2)
            ]
            gt = [np.zeros((2, 3), np.float32) for _ in feeds]
            agg = evaluate(params, cfg, feeds, gt, rank=rank, world=world,
                           out_dir=f"data/eval/{args.exp_name}")
            logger.info("eval: %s", json.dumps(agg))
        else:
            feeds = [feed_factory() for _ in range(4)]
            inference(params, cfg, feeds, [str(i) for i in range(len(feeds))],
                      out_path=f"data/eval/{args.exp_name}_preds.json",
                      rank=rank, world=world)
    else:  # SS-ETP pretraining (run_on_hm3d + posed-frames dispatch,
        # ss_trainer_3DFF.py:733-1115, :2237-2258)
        from dynam3d_tpu.models.encoders.clip import init_clip_params
        from dynam3d_tpu.models.encoders.depth_resnet import (
            encode_depth, init_depth_params,
        )
        from dynam3d_tpu.models.memory3d import init_field_params
        from dynam3d_tpu.models.render.nerf import init_render_params
        from dynam3d_tpu.models.waypoint.trm import init_waypoint_params
        from dynam3d_tpu.runtime.logging import MetricsLogger
        from dynam3d_tpu.runtime.pretrain_loop import (
            PretrainRunner,
            SyntheticFramesDataset,
            WalkDriver,
            synthetic_supervision,
        )

        key = jax.random.PRNGKey(cfg.train.seed)
        depth_enc = init_depth_params(jax.random.fold_in(key, 3), cfg.depth)
        feat = jax.eval_shape(
            lambda p, d: encode_depth(p, cfg.depth, d), depth_enc,
            jax.ShapeDtypeStruct(
                (1, cfg.depth.input_size, cfg.depth.input_size, 1), np.float32
            ),
        )
        pre_params = {
            "fields": init_field_params(key, cfg.fields),
            "render": init_render_params(jax.random.fold_in(key, 1), cfg.fields),
            "clip": init_clip_params(jax.random.fold_in(key, 2), cfg.clip),
            "depth_enc": depth_enc,
            "waypoint": init_waypoint_params(
                jax.random.fold_in(key, 4), cfg.waypoint,
                depth_feat_dim=feat.shape[-1],
            ),
        }
        runner = PretrainRunner(pre_params, cfg, seed=cfg.train.seed + rank)
        walk_feed = SyntheticRoomFeed(
            views=12, depth_size=cfg.depth.input_size,
            seed=random.randint(0, 1 << 30),
        )
        # dataset mix mirrors the reference's 5-way dispatcher: one hm3d
        # walk corpus + posed-frame corpora (real loaders in
        # runtime/scene_datasets.py plug into the same protocol)
        datasets = [
            WalkDriver(
                walk_feed,
                synthetic_supervision(cfg.train.seed, cfg.fields.fts_dim),
                max_len=cfg.train.pretrain_traj_len,
                seed=cfg.train.seed + rank,
                waypoint_aug=cfg.train.waypoint_aug,
                teacher_prob=cfg.train.sample_ratio * 0.5,
            ),
            SyntheticFramesDataset(seed=cfg.train.seed),
            SyntheticFramesDataset(seed=cfg.train.seed + 1, posed=True),
        ]
        mlogger = MetricsLogger(f"data/logs/{args.exp_name}")
        runner.run(
            datasets, iters=cfg.train.iters, logger=mlogger,
            ckpt_dir=ckpt_dir, log_every=cfg.train.log_every,
        )
        mlogger.close()


if __name__ == "__main__":
    main()
