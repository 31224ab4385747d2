"""Round-5 on-chip training soak (VERDICT r4 item 3): full-dims multi-
iteration training that actually LEARNS on the chip, with a mid-run
checkpoint save + bit-compatible resume, per-step loss/NaN/recompile
accounting, and a jsonl artifact.

Two phases, mirroring the reference's two training stages:
  * IL: teacher-forced VLN imitation over the FloorplanFeed oracle
    (ss_trainer_Dynam3D.py:265-302,786-798) — N optimizer steps at full
    dims, checkpoint at the midpoint, resume proven bit-compatible (the
    same probe batch yields the identical loss after reload).
  * pretrain: 3DFF iterations over posed synthetic frames
    (ss_trainer_3DFF.py:504-519), ditto.

The default soak lr is 1e-4 (recorded in the artifact): the reference's
1e-6 fine-tunes PRETRAINED weights over 100k iterations; demonstrating a
falling loss from random init in ~60 steps needs a demonstrative rate.
The optimizer family/clip/NaN handling are the production ones either way.

Run (on the chip):
    python tools/train_soak.py --out runs/train_soak_r05.jsonl \
        [--il-steps 60] [--pretrain-iters 20] [--scale full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _emit(f, row):
    f.write(json.dumps(row) + "\n")
    f.flush()
    print(json.dumps(row))


def il_soak(args, cfg, out):
    import jax
    import jax.numpy as jnp

    from dynam3d_tpu.config import apply_opts
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime import checkpoint as ckpt_mod
    from dynam3d_tpu.runtime.feed import FloorplanFeed
    from dynam3d_tpu.runtime.vln_loop import VLNTrainer

    cfg = apply_opts(cfg, [
        f"train.lr={args.lr}",
        "train.use_waypoint_predictor=false",  # 1-view feed: geometric fan
    ])
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)

    def feed():
        return FloorplanFeed(
            rgb_size=cfg.clip.image_size,
            depth_size=256 if args.scale == "full" else 32,
            seed=args.seed,
        )

    trainer = VLNTrainer(params, cfg, feed)

    rows = []
    shapes = set()
    orig_step = trainer._step_fn

    def timed_step(tr, fr, opt, fs, batch):
        key = (int(batch.input_ids.shape[1]), int(batch.label_ids.shape[1]))
        new = key not in shapes
        shapes.add(key)
        t0 = time.time()
        o = orig_step(tr, fr, opt, fs, batch)
        m = o[3]
        host = np.asarray(jnp.stack([
            m["loss"].astype(jnp.float32),
            m["grad_norm"].astype(jnp.float32),
            m["skipped"].astype(jnp.float32),
        ]))
        dt = time.time() - t0
        rows.append({
            "phase": "il", "it": len(rows), "loss": round(float(host[0]), 4),
            "grad_norm": round(float(host[1]), 3),
            "nan_skipped": bool(host[2] > 0), "step_s": round(dt, 3),
            "prompt_T": key[0], "label_T": key[1], "compile": new,
        })
        _emit(out, rows[-1])
        return o

    trainer._step_fn = timed_step

    ckpt_dir = os.path.join(args.workdir, "il_ckpt")
    mid = max(args.il_steps // 2, 1)
    probe = {}

    # loss-only probe (no optimizer step: the production step donates its
    # trainable/opt buffers, so "run a step and discard it" would consume
    # the live training state)
    from dynam3d_tpu.runtime import trainer_vln

    splice = trainer.splice_start  # plain int: the closure must NOT hold
    # the trainer object alive (its 9.7 GB params would pin HBM after del)

    @jax.jit
    def probe_loss(trainable, frozen, field_state, batch):
        p = trainer_vln.merge_params(trainable, frozen)
        out = policy_mod.perceive(
            p, cfg, field_state, batch.rgb, batch.depth,
            batch.position, batch.heading,
        )
        tl = policy_mod.train_loss(
            p, cfg, batch.input_ids, batch.text_valid,
            out.mm_tokens, out.mm_valid,
            batch.label_ids, batch.label_mask, batch.turn_weight,
            splice,
        )
        return tl.loss

    # drive episodes until the step budget is spent; save + probe at midpoint
    while len(rows) < args.il_steps:
        if len(rows) >= mid and "loss_before" not in probe:
            ckpt_mod.save_checkpoint(
                ckpt_dir, len(rows),
                {"trainable": trainer.trainable, "opt_state": trainer.opt_state},
            )
            probe["saved_at"] = len(rows)
            probe["batch"] = _probe_batch(trainer, cfg)
            probe["loss_before"] = float(np.asarray(probe_loss(
                trainer.trainable, trainer.frozen,
                policy_mod.batched_init_state(cfg, 1), probe["batch"],
            ), np.float32))
            # persist the probe inputs: the resume check runs in a FRESH
            # process (building a second trainer next to this one OOMed
            # 16 GB HBM even after del+gc — observed r5)
            np.savez(
                os.path.join(args.workdir, "il_probe.npz"),
                **{k: np.asarray(v)
                   for k, v in probe["batch"]._asdict().items()},
            )
            with open(os.path.join(args.workdir, "il_probe.json"), "w") as f:
                json.dump({"loss_before": probe["loss_before"],
                           "saved_at": probe["saved_at"]}, f)
        if "loss_before" not in probe:
            # land an episode boundary exactly on the midpoint so the
            # save+probe above always triggers
            budget = min(mid - len(rows), cfg.train.max_traj_len)
        else:
            budget = min(args.il_steps - len(rows), cfg.train.max_traj_len)
        trainer.train_episode(max_steps=budget)

    # bit-compat resume check in a fresh process (fresh HBM): this
    # process's trainer + compiled workspaces and the resumed tree do
    # not coexist on a 16 GB chip — free ours first, then hand off
    import gc
    import subprocess

    trainer._step_fn = None
    del trainer, orig_step, timed_step
    probe.pop("batch", None)
    gc.collect()
    rc = subprocess.call([
        sys.executable, os.path.abspath(__file__), "--out", args.out,
        "--scale", args.scale, "--lr", str(args.lr),
        "--seed", str(args.seed), "--workdir", args.workdir,
        "--il-resume-check",
    ])
    if rc:
        _emit(out, {"phase": "il_resume_check", "error": f"child rc={rc}"})

    losses = [r["loss"] for r in rows if np.isfinite(r["loss"])]
    k = max(len(losses) // 4, 1)
    _emit(out, {
        "phase": "il_summary", "steps": len(rows),
        "loss_first_quartile_mean": round(float(np.mean(losses[:k])), 4),
        "loss_last_quartile_mean": round(float(np.mean(losses[-k:])), 4),
        "nan_skips": sum(r["nan_skipped"] for r in rows),
        "distinct_shapes": len(shapes),
        "compile_steps": sum(r["compile"] for r in rows),
        "steady_step_s_p50": round(float(np.median(
            [r["step_s"] for r in rows if not r["compile"]] or [0.0])), 3),
        "lr": args.lr,
    })


def _probe_batch(trainer, cfg):
    """A fixed full-dims TrainBatch for the resume bit-compat check."""
    import jax.numpy as jnp

    from dynam3d_tpu.runtime import trainer_vln

    feed = trainer.feed_factory()
    obs = feed.reset()
    ids, tvalid, labels, lmask = trainer._tokenize_full(
        obs.instruction, ["none\n"] * 4, "turn left 2 steps, move 4 steps."
    )
    return trainer_vln.TrainBatch(
        rgb=jnp.asarray(obs.rgb[None, :1]),
        depth=jnp.asarray(np.asarray(obs.depth[None, :1], np.float32)),
        position=jnp.asarray(np.asarray(obs.position[None], np.float32)),
        heading=jnp.asarray(np.float32([obs.heading])),
        input_ids=ids, text_valid=tvalid,
        label_ids=labels, label_mask=lmask,
        turn_weight=jnp.asarray([1.0], jnp.float32),
    )


def il_resume_check(args, cfg):
    """Child-process half of the IL bit-compat check: restore the midpoint
    checkpoint into a fresh process and reproduce the probe loss.

    Memory-lean by construction: the policy tree is initialized once
    (identical frozen subtree — same seed), the trainable leaves are then
    deleted from HBM, and the checkpoint restores into an ABSTRACT
    template so old+new trainable (2 x 7.4 GB bf16 Phi-3) never coexist.
    """
    import gc

    import jax
    import jax.numpy as jnp

    from dynam3d_tpu.config import apply_opts
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.vlm.tokenizer import ByteTokenizer, build_prompt
    from dynam3d_tpu.runtime import checkpoint as ckpt_mod
    from dynam3d_tpu.runtime import trainer_vln

    cfg = apply_opts(cfg, [
        f"train.lr={args.lr}",
        "train.use_waypoint_predictor=false",
    ])
    with open(os.path.join(args.workdir, "il_probe.json")) as f:
        meta = json.load(f)
    d = np.load(os.path.join(args.workdir, "il_probe.npz"))
    batch = trainer_vln.TrainBatch(
        **{k: jnp.asarray(d[k]) for k in trainer_vln.TrainBatch._fields}
    )

    tok = ByteTokenizer(cfg.llava.phi3.vocab_size)
    splice = tok.encode(build_prompt("x", ["none\n"] * 4, 1)).index(tok.image_id)

    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = trainer_vln.split_params(params)
    del params
    tr_template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), trainable
    )
    opt_template = jax.eval_shape(
        trainer_vln.make_optimizer(cfg).init, tr_template
    )
    for leaf in jax.tree_util.tree_leaves(trainable):
        leaf.delete()
    del trainable
    gc.collect()

    path = ckpt_mod.newest_checkpoint(os.path.join(args.workdir, "il_ckpt"))
    restored = ckpt_mod.load_checkpoint(
        path, {"trainable": tr_template, "opt_state": opt_template}
    )

    @jax.jit
    def probe_loss(trainable, frozen, field_state, batch):
        p = trainer_vln.merge_params(trainable, frozen)
        pout = policy_mod.perceive(
            p, cfg, field_state, batch.rgb, batch.depth,
            batch.position, batch.heading,
        )
        tl = policy_mod.train_loss(
            p, cfg, batch.input_ids, batch.text_valid,
            pout.mm_tokens, pout.mm_valid,
            batch.label_ids, batch.label_mask, batch.turn_weight,
            splice,
        )
        return tl.loss

    loss_after = float(np.asarray(probe_loss(
        restored["trainable"], frozen,
        policy_mod.batched_init_state(cfg, 1), batch,
    ), np.float32))
    with open(args.out, "a") as out:
        _emit(out, {
            "phase": "il_resume_check",
            "resumed_iter": ckpt_mod.checkpoint_step(path),
            "loss_before": meta["loss_before"], "loss_after": loss_after,
            "bit_compatible": loss_after == meta["loss_before"],
        })


def pretrain_soak(args, cfg, out):
    import jax

    from dynam3d_tpu.config import apply_opts
    from dynam3d_tpu.models.encoders import clip as clip_mod
    from dynam3d_tpu.models.memory3d import init_field_params, init_state
    from dynam3d_tpu.models.render.nerf import init_render_params
    from dynam3d_tpu.runtime import checkpoint as ckpt_mod
    from dynam3d_tpu.runtime import trainer_3dff
    from dynam3d_tpu.runtime.pretrain_loop import (
        PretrainRunner, SyntheticFramesDataset,
    )

    if args.scale == "tiny":
        cfg = apply_opts(cfg, ["fields.view_height=2", "fields.view_width=2"])
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pr_params = {
        "fields": init_field_params(k1, cfg.fields),
        "render": init_render_params(k2, cfg.fields),
        "clip": clip_mod.init_clip_params(k3, cfg.clip),
    }
    runner = PretrainRunner(pr_params, cfg, seed=args.seed)
    ds = SyntheticFramesDataset(
        rgb_size=cfg.clip.image_size,
        depth_size=256 if args.scale == "full" else 32,
        frames=args.frames, seed=args.seed,
    )
    ckpt_dir = os.path.join(args.workdir, "pretrain_ckpt")
    mid = max(args.pretrain_iters // 2, 1)

    # fixed probe batch for the resume check
    probe_scene = SyntheticFramesDataset(
        rgb_size=cfg.clip.image_size,
        depth_size=256 if args.scale == "full" else 32,
        frames=args.frames, seed=1234,
    ).sample_scene()

    def probe_loss(r):
        # build_batch folds r.it into its synthetic-supervision rng — pin it
        # so both sides of the resume check see the IDENTICAL probe batch
        old_it = r.it
        r.it = 10 ** 6
        try:
            batch = r.build_batch(probe_scene, r.params["clip"])
        finally:
            r.it = old_it
        trainable = {"fields": r.params["fields"], "render": r.params["render"]}
        r._ensure_opt(trainable)
        step = r._get_step(posed="intrinsics" in probe_scene)
        m = step(trainable, r._tr_opt, init_state(cfg.fields), batch)[3]
        return float(np.asarray(m["loss"], np.float32))

    t_hist = []
    loss_before = None
    for it in range(args.pretrain_iters):
        t0 = time.time()
        hist = runner.run([ds], iters=1)
        dt = time.time() - t0
        t_hist.append(dt)
        m = hist[-1] if hist else {}
        _emit(out, {
            "phase": "pretrain", "it": it,
            **{k: round(float(v), 4) for k, v in m.items()},
            "iter_s": round(dt, 3),
        })
        if it + 1 == mid:
            ckpt_mod.save_checkpoint(
                ckpt_dir, it + 1,
                {"fields": runner.params["fields"],
                 "render": runner.params["render"]},
            )
            loss_before = probe_loss(runner)

    # resume into a fresh runner
    runner2 = PretrainRunner(
        {**pr_params,
         **ckpt_mod.load_checkpoint(
             ckpt_mod.newest_checkpoint(ckpt_dir),
             {"fields": pr_params["fields"], "render": pr_params["render"]},
         )},
        cfg, seed=args.seed,
    )
    loss_after = probe_loss(runner2)
    _emit(out, {
        "phase": "pretrain_resume_check",
        "loss_before": loss_before, "loss_after": loss_after,
        "bit_compatible": loss_after == loss_before,
    })
    _emit(out, {
        "phase": "pretrain_summary", "iters": args.pretrain_iters,
        "iter_s_p50": round(float(np.median(t_hist[1:] or t_hist)), 3),
    })


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--il-steps", type=int, default=60)
    p.add_argument("--pretrain-iters", type=int, default=20)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--scale", default="full", choices=("full", "tiny"))
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default="/tmp/train_soak_r05")
    p.add_argument("--skip-il", action="store_true")
    p.add_argument("--skip-pretrain", action="store_true")
    p.add_argument("--il-resume-check", action="store_true",
                   help="child mode: run only the IL bit-compat check")
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench

    cfg = bench._config(args.scale)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    os.makedirs(args.workdir, exist_ok=True)

    if args.il_resume_check:
        il_resume_check(args, cfg)
        return

    if not args.skip_il and not args.skip_pretrain:
        # one phase per PROCESS: the pretrain runner's live buffers +
        # compiled workspaces and the 9.7 GB IL policy tree do not coexist
        # in 16 GB HBM (observed RESOURCE_EXHAUSTED when run in-process)
        import subprocess

        base = [
            sys.executable, os.path.abspath(__file__), "--out", args.out,
            "--il-steps", str(args.il_steps),
            "--pretrain-iters", str(args.pretrain_iters),
            "--frames", str(args.frames), "--scale", args.scale,
            "--lr", str(args.lr), "--seed", str(args.seed),
            "--workdir", args.workdir,
        ]
        rc1 = subprocess.call(base + ["--skip-il"])
        rc2 = subprocess.call(base + ["--skip-pretrain"])
        raise SystemExit(rc1 or rc2)

    with open(args.out, "a") as out:
        _emit(out, {
            "phase": "meta", "backend": jax.default_backend(),
            "scale": args.scale, "il_steps": args.il_steps,
            "pretrain_iters": args.pretrain_iters, "lr": args.lr,
            "running": "pretrain" if args.skip_il else "il",
        })
        if not args.skip_pretrain:
            pretrain_soak(args, cfg, out)
        if not args.skip_il:
            il_soak(args, cfg, out)


if __name__ == "__main__":
    main()
