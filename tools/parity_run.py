"""Real-weights parity runway: torch state dicts -> converters -> recorded
episode -> per-step token/logit dumps + episode metrics.

The one-command path from the reference's checkpoint assets to an evaluated
episode in this build (matching Policy_Dynam3D_VLN.py:80 strict load +
ss_trainer_Dynam3D.py:725-749 eval metrics).  The real assets are absent
from this image, so ``--synth`` exercises the IDENTICAL runway with
full-size random state dicts saved in the reference torch naming
(runtime/synth_sd.py) — proving key naming, shapes, dtypes, conversion
round-trip, and full-dims HBM fit on the chip today.  The moment real
assets exist:

    python tools/parity_run.py --out runs/parity \
        --dynam3d dynam3d.pth --llava llava-phi-3-mini.sd \
        --fastsam FastSAM.sd [--vln ckpt.iter100000.pth] \
        [--episode data/episodes/r2r_ep0.npz]

Artifacts written to --out:
  parity_report.json   conversion report: per-asset source, round-trip max
                       abs diff (synth mode), param count, backend
  steps_parity.jsonl   per-step dump: action token ids, decoded text,
                       agent position (+ first-step logits when
                       --dump-logits)
  stats_ep_parity.json / stats_parity.json
                       per-episode + aggregate SR/SPL/nDTW metrics in the
                       reference's stats_ckpt json shape
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from convert_reference_ckpt import convert  # noqa: E402


def _tree_max_diff(a, b) -> float:
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return float("inf")
    worst = 0.0
    for x, y in zip(la, lb):
        if x.shape != y.shape:
            return float("inf")
        d = float(
            np.max(np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32)))
        )
        worst = max(worst, d)
    return worst


def _config(scale: str, llm_layers: int):
    from dynam3d_tpu.config import (
        CLIPConfig, Dynam3DConfig, FieldsConfig, LLaVAConfig, Phi3Config,
        SegmenterConfig,
    )

    if scale == "tiny":
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
                projector_hidden=64, prefill_bucket=64, max_new_tokens=8,
            ),
            segmenter=SegmenterConfig(
                provider="yolov8", imgsz=32, width_mult=0.125,
                depth_mult=0.34, num_protos=8, max_masks=8,
            ),
        )
    return Dynam3DConfig(
        fields=FieldsConfig(
            patch_capacity=32768, instance_capacity=2048, zone_capacity=1024,
            max_segments=64, max_members=512, max_zone_members=128,
        ),
        llava=LLaVAConfig(phi3=Phi3Config(num_layers=llm_layers)),
    )


def build_params(args, cfg, report):
    """state dicts (files or synthesized) -> converted policy param tree."""
    import jax

    paths = {k: getattr(args, k) for k in
             ("dynam3d", "pretrain", "vln", "llava", "clip", "fastsam",
              "waypoint", "ddppo")}

    if args.synth:
        from dynam3d_tpu.models import policy as policy_mod
        from dynam3d_tpu.runtime import synth_sd

        t0 = time.time()
        truth = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
        sds = synth_sd.synth_all(truth, cfg)
        report["synth_assets"] = {
            k: len(v) for k, v in sds.items()
        }
        if args.synth_dir:
            # prove torch serialization: save each asset as .pth, reload
            # through the same torch.load path real assets take
            import torch

            os.makedirs(args.synth_dir, exist_ok=True)
            for name in ("dynam3d", "llava", "clip", "fastsam"):
                if name not in sds:
                    continue
                p = os.path.join(args.synth_dir, f"{name}.pth")
                torch.save(
                    {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sds[name].items()}, p,
                )
                paths[name] = p
            report["synth_dir"] = args.synth_dir
        else:
            paths.update({
                "dynam3d": sds["dynam3d"], "llava": sds["llava"],
                "clip": sds["clip"], "fastsam": sds.get("fastsam"),
            })
        report["synth_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    params, extras, conv_report = convert(cfg, paths)
    report["converted"] = conv_report
    report["convert_s"] = round(time.time() - t0, 1)

    if args.synth:
        # conversion round-trip: synth(params) -> convert == params, proving
        # naming/shape/transpose agreement converter-by-converter
        # the HF tower ends at vision_feature_layer=-2, so the converter
        # fills ln_post/proj with identity — exclude those (never-executed)
        # leaves from the round-trip comparison
        tv = dict(truth["llava"]["clip"]["visual"])
        pv = params["llava"]["clip"]["visual"]
        tv["ln_post"], tv["proj"] = pv["ln_post"], pv["proj"]
        truth_llava = {
            **truth["llava"],
            "clip": {"visual": tv, "text": truth["llava"]["clip"]["text"]},
        }
        diffs = {
            "fields": _tree_max_diff(truth["fields"], params["fields"]),
            "clip": _tree_max_diff(truth["clip"], params["clip"]),
            "llava": _tree_max_diff(truth_llava, params["llava"]),
        }
        if "yolo" in truth:
            diffs["yolo"] = _tree_max_diff(truth["yolo"], params["yolo"])
        report["roundtrip_max_abs_diff"] = {
            k: (round(v, 6) if np.isfinite(v) else "shape-mismatch")
            for k, v in diffs.items()
        }
        # every leg is exact: f32 tensors round-trip bit-identically, the
        # synth BN stats are chosen so folding is the identity, and bf16
        # phi3 weights pass through a lossless bf16->f32->bf16 cast
        bad = {k: v for k, v in diffs.items() if not (v <= 1e-4)}
        if bad:
            raise SystemExit(f"conversion round-trip FAILED: {bad}")
    return params


def run_episode(params, cfg, feed, out_dir, max_steps, dump_logits=False):
    """Closed-loop recorded-episode eval with per-step dumps."""
    import jax
    import jax.numpy as jnp

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime import metrics as metrics_mod
    from dynam3d_tpu.runtime.episode import EpisodeRunner
    from dynam3d_tpu.runtime.feed import STOP
    from dynam3d_tpu.utils.actions import EpisodeActionState, parse_action

    runner = EpisodeRunner(params, cfg)
    state = policy_mod.batched_init_state(cfg, 1)
    obs = feed.reset()
    act = EpisodeActionState()
    steps_path = os.path.join(out_dir, "steps_parity.jsonl")
    positions = [np.asarray(obs.position, np.float32)]
    # shape-aware steadiness: the prompt is padded to a prefill bucket, and a
    # NEW padded length means XLA compiles a new program mid-episode (the
    # history buffer grows over the first ~4 steps, then saturates at the
    # reference's 4-action window, feature_fields.py[VLN]:183,206).  A step's
    # time is a STEADY sample only when its padded shape was already seen;
    # otherwise it is a warmup/compile sample and is reported separately —
    # round 4 published the last of 6 steps as "steady" while it was really a
    # bucket recompile (92.9 s vs the 0.15 s bench headline).
    seen_shapes: set = set()
    warmup = []  # (step, padded_len, seconds)
    steady = []  # seconds
    n_steps = 0
    prev_gen = None  # last step's ids prime the spec drafts (EpisodeRunner.run)
    with open(steps_path, "w") as sf:
        for stepk in range(max_steps):
            rgb = jnp.asarray(obs.rgb)[None]
            # uint16 wire format, matching EpisodeRunner._upload — shares
            # the production-compiled programs instead of an f32 twin
            depth = jnp.asarray(EpisodeRunner.pack_depth(obs.depth))[None]
            pos = jnp.asarray(np.asarray(obs.position, np.float32))[None]
            hd = jnp.asarray(np.asarray([obs.heading], np.float32))
            ids, tvalid, _ = runner._prompt_ids(
                [obs.instruction], [act.history_actions]
            )
            t0 = time.time()
            state, gen_dev = runner._full_step(
                params, state, rgb, depth, pos, hd, ids, tvalid, prev_gen
            )
            gen = np.asarray(gen_dev)
            prev_gen = gen_dev
            dt = time.time() - t0
            shape_key = int(ids.shape[1])
            is_steady = shape_key in seen_shapes
            if is_steady:
                steady.append(dt)
            else:
                seen_shapes.add(shape_key)
                warmup.append((stepk, shape_key, round(dt, 3)))
            text = runner.tok.decode(gen[0])
            cut = text.find("<|end|>")
            if cut != -1:
                text = text[:cut]
            rec = {
                "step": stepk,
                "action_ids": [int(x) for x in gen[0]],
                "action_text": text,
                "position": [float(x) for x in obs.position],
                "heading": float(obs.heading),
                "step_s": round(dt, 3),
                "prompt_padded_len": shape_key,
                "steady": is_steady,
            }
            if dump_logits and stepk == 0:
                # first-position logits of the prefill — the direct
                # comparison point against a reference-run capture
                from dynam3d_tpu.models.vlm import llava as llava_mod

                out = runner._perceive(params, state, rgb, depth, pos, hd)
                emb = llava_mod.splice_embeds(
                    params["llava"], cfg.llava, ids, out.mm_tokens,
                    runner.splice_start,
                )
                av = jax.lax.dynamic_update_slice(
                    tvalid, out.mm_valid, (0, runner.splice_start)
                )
                from dynam3d_tpu.models.vlm import phi3 as phi3_mod

                p3 = cfg.llava.phi3
                cache = phi3_mod.init_cache(
                    p3, 1, emb.shape[1] + cfg.llava.max_new_tokens, emb.dtype
                )
                posn = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
                mask = phi3_mod.prefill_mask(
                    av, emb.shape[1] + cfg.llava.max_new_tokens
                )
                last = jnp.sum(av.astype(jnp.int32), 1) - 1
                logits, _ = phi3_mod.forward(
                    params["llava"]["phi3"], p3, emb, posn, cache, 0, mask,
                    lm_at=last,
                )
                lg = np.asarray(logits[0, 0], np.float32)
                top = np.argsort(-lg)[:10]
                rec["logits_top10"] = {
                    int(t): round(float(lg[t]), 4) for t in top
                }
            sf.write(json.dumps(rec) + "\n")
            act.push_history(text + "\n")
            action = parse_action(text, cfg.action)
            if action == STOP or stepk == max_steps - 1:
                feed.step(STOP)
                n_steps = stepk + 1
                break
            obs, done, _ = feed.step(action)
            positions.append(np.asarray(obs.position, np.float32))
            n_steps = stepk + 1
            if done:
                break

    pred_path = np.stack(positions)
    dists = np.asarray(
        [feed.oracle_distance(p) for p in pred_path], np.float32
    )
    gt = getattr(feed, "gt_locations", None)
    gt = pred_path if gt is None else np.asarray(gt, np.float32)
    ep = metrics_mod.episode_metrics(
        pred_path, dists, gt, n_steps,
        success_distance=cfg.eval.success_distance,
    )
    agg = metrics_mod.aggregate([ep])
    with open(os.path.join(out_dir, "stats_ep_parity.json"), "w") as f:
        json.dump({"0": ep}, f, indent=2)
    with open(os.path.join(out_dir, "stats_parity.json"), "w") as f:
        json.dump(agg, f, indent=2)
    return {
        "steps": n_steps,
        # each first-sight of a padded prompt shape costs one XLA compile;
        # these are one-time (persistent-cache-able), not per-step cost
        "warmup_steps": [
            {"step": s, "prompt_padded_len": k, "step_s": t}
            for s, k, t in warmup
        ],
        "first_step_s": warmup[0][2] if warmup else 0.0,
        "steady_step_ms": (
            round(1e3 * float(np.median(steady)), 1) if steady else None
        ),
        "steady_samples": len(steady),
        "metrics": agg,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    for name in ("dynam3d", "pretrain", "vln", "llava", "clip", "fastsam",
                 "waypoint", "ddppo"):
        p.add_argument(f"--{name}", default=None)
    p.add_argument("--synth", action="store_true",
                   help="synthesize full-size random reference state dicts")
    p.add_argument("--synth-dir", default=None,
                   help="with --synth: torch.save assets here and reload them")
    p.add_argument("--episode", default=None,
                   help="recorded episode .npz (RecordedEpisodeFeed)")
    p.add_argument("--save-converted", default=None,
                   help="save the converted param tree as an orbax ckpt here")
    p.add_argument("--converted", default=None,
                   help="load a previously saved converted ckpt instead of "
                        "converting (the TPU phase of a CPU-convert / "
                        "TPU-run split — the dev tunnel makes direct "
                        "host->device conversion upload-bound)")
    p.add_argument("--no-episode", action="store_true",
                   help="stop after conversion/saving (CPU phase)")
    p.add_argument("--scale", default="full", choices=("full", "tiny"))
    p.add_argument("--llm-layers", type=int, default=32)
    # default runs past bucket-ladder saturation: the 4-action history window
    # fills by step ~5, so steps 6+ reuse compiled shapes and yield true
    # steady samples (see run_episode's shape-aware steadiness)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--quant-bits", type=int, default=4)
    p.add_argument("--dump-logits", action="store_true")
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize pre-registers the tunneled TPU backend, so the env
        # var alone does not switch platforms — force it through jax.config
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    os.makedirs(args.out, exist_ok=True)
    cfg = _config(args.scale, args.llm_layers)
    report = {"backend": jax.default_backend(), "scale": args.scale}

    if args.converted:
        from dynam3d_tpu.runtime.checkpoint import load_checkpoint

        payload = load_checkpoint(args.converted)
        params = payload["params"] if "params" in payload else payload
        report["converted"] = args.converted
    else:
        params = build_params(args, cfg, report)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    report["policy_params_m"] = round(n / 1e6, 1)

    if args.save_converted:
        from dynam3d_tpu.runtime.checkpoint import save_checkpoint

        path = save_checkpoint(args.save_converted, 0, {"params": params})
        report["saved_converted"] = path

    if args.no_episode:
        with open(os.path.join(args.out, "parity_report.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report))
        return

    if args.quant_bits:
        from dynam3d_tpu.models.vlm.phi3 import quantize_phi3

        params["llava"]["phi3"] = quantize_phi3(
            params["llava"]["phi3"], bits=args.quant_bits, consume=True
        )
        report["quant_bits"] = args.quant_bits

    if args.episode:
        from dynam3d_tpu.runtime.feed import RecordedEpisodeFeed

        feed = RecordedEpisodeFeed(args.episode)
        report["feed"] = args.episode
    else:
        from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

        feed = SyntheticRoomFeed(
            rgb_size=cfg.clip.image_size,
            depth_size=256 if args.scale == "full" else 32, views=1,
        )
        report["feed"] = "synthetic"

    res = run_episode(params, cfg, feed, args.out, args.steps,
                      dump_logits=args.dump_logits)
    report.update(res)
    with open(os.path.join(args.out, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
