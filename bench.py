"""Benchmark: p50 per-step RGB-D -> action latency of the Dynam3D VLN stack.

Measures the BASELINE.json north stars on the real chip:
  - p50 per-step RGB-D -> action latency (perceive + prompt + greedy decode)
  - RGB-D frames/sec -> 3D tokens (perceive only), reported in "extra"

The reference publishes no latency numbers (BASELINE.md) and this host has
no CUDA GPU to measure one, so ``vs_baseline`` is the ratio of the
``bench_baseline.json`` denominator to ours.  The shipped file is an
explicitly-flagged ANALYTIC roofline estimate of the reference stack on a
3090-class 24 GiB card (derivation: docs/BENCH_NOTES.md "Analytic GPU
baseline"); its provenance is echoed as ``baseline`` in ``extra``.  With no
file present, ``vs_baseline`` is null and ``baseline`` is "unmeasured" —
never a placeholder 1.0.  Modes with no comparable denominator (render,
serve) always report null/unmeasured.

Scale: DYNAM3D_BENCH_SCALE=full (default) runs CLIP-L/14-336 towers at full
dims with a reduced-depth LLM; =tiny runs the CI config.  Weights are random
(timing is weight-independent); the memory tables run at full capacity.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _sync(y):
    """Force completion: jax.block_until_ready is a NO-OP on the axon tunnel
    backend, so completion is observed via a tiny device->host transfer."""
    leaf = None
    import jax

    for l in jax.tree_util.tree_leaves(y):
        leaf = l
        break
    return np.asarray(leaf.ravel()[0:1])


def _resolved_flags():
    from dynam3d_tpu import flags

    return flags


def _config(scale: str):
    from dynam3d_tpu.config import (
        CLIPConfig,
        Dynam3DConfig,
        FieldsConfig,
        LLaVAConfig,
        Phi3Config,
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
    # full dims; LLM depth via env — default is the FULL 32-layer Phi-3-mini
    # (segmenter defaults to the full FastSAM-x port at 576^2)
    n_layers = int(os.environ.get("DYNAM3D_BENCH_LLM_LAYERS", "32"))
    bucket = int(os.environ.get("DYNAM3D_PREFILL_BUCKET", "128"))
    return Dynam3DConfig(
        fields=FieldsConfig(
            patch_capacity=32768, instance_capacity=2048, zone_capacity=1024,
            max_segments=64, max_members=512, max_zone_members=128,
        ),
        llava=LLaVAConfig(
            phi3=Phi3Config(num_layers=n_layers), max_new_tokens=20,
            prefill_bucket=bucket,
        ),
    )


def render_bench():
    """DYNAM3D_BENCH_MODE=render: novel-view feature-field rendering fps at
    full dims (the pretrain hot path; exercises the Pallas kNN + fused MLP).
    Prints the same one-line JSON contract."""
    import jax
    import jax.numpy as jnp

    from dynam3d_tpu.config import FieldsConfig
    from dynam3d_tpu.models.memory3d import init_state
    from dynam3d_tpu.models.render.nerf import init_render_params, render_view

    steps = int(os.environ.get("DYNAM3D_BENCH_STEPS", "8"))
    cfg = FieldsConfig(
        knn_tile=int(os.environ.get("DYNAM3D_KNN_TILE", "2048")),
        knn_band=int(os.environ.get("DYNAM3D_KNN_BAND", "32")),
    )
    params = init_render_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # patch table from a synthetic WALK (576 frustum-clustered patches per
    # frame), the layout real episodes produce — uniform scatter would both
    # misrepresent usage and defeat the banded k-NN's bbox culling
    frames = int(os.environ.get("DYNAM3D_BENCH_FRAMES", "35"))
    pts = []
    pos = np.array([0.0, 0.0, 1.3])
    for _ in range(frames):
        heading = rng.uniform(0, 2 * np.pi)
        depth = rng.uniform(0.5, 6.0, 576)
        ang = rng.uniform(-0.7, 0.7, 576)
        pts.append(np.stack([
            pos[0] + depth * np.cos(heading + ang),
            pos[1] + depth * np.sin(heading + ang),
            rng.uniform(0, 2.5, 576),
        ], 1))
        pos[:2] += rng.uniform(-0.5, 0.5, 2)
    walk = np.concatenate(pts).astype(np.float32)
    n = walk.shape[0]
    state = init_state(cfg)
    state = state._replace(
        patch_pos=state.patch_pos.at[:n].set(jnp.asarray(walk)),
        patch_fts=state.patch_fts.at[:n].set(
            jnp.asarray(rng.normal(size=(n, cfg.fts_dim)), state.patch_fts.dtype)
        ),
        patch_valid=state.patch_valid.at[:n].set(True),
    )
    fn_jit = jax.jit(lambda pr, st, p, h: render_view(pr, cfg, st, p, h))
    fn = lambda st, p, h: fn_jit(params, st, p, h)
    t0 = time.time()
    out = fn(state, jnp.zeros(3), jnp.asarray(0.0))
    _sync(out.features)
    compile_s = time.time() - t0
    lat = []
    for k in range(steps):
        t0 = time.time()
        out = fn(state, jnp.zeros(3), jnp.asarray(0.1 * k))
        _sync(out.features)
        lat.append(time.time() - t0)
    p50 = float(np.percentile(lat, 50) * 1000)
    print(json.dumps({
        "metric": "render_view_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "baseline": "unmeasured",
            "views_per_sec": round(1000.0 / p50, 2),
            "compile_s": round(compile_s, 1),
            # report the resolved gates, not the environment — they can
            # disagree after import or a flags.* monkeypatch
            "pallas": not _resolved_flags().DISABLE_PALLAS,
            "banded_knn": not _resolved_flags().DISABLE_BANDED_KNN,
            "morton_knn": not _resolved_flags().DISABLE_MORTON_KNN,
            "patches": n,
            "patch_layout": "walk",
            "backend": jax.default_backend(),
        },
    }))


def _llm_flops_bytes(phi3_params, cfg):
    """(params_count, decode_bytes_per_token) of the LLM from actual arrays.

    decode bytes = what one token pass streams from HBM: the quantized (or
    bf16) weights once, plus nothing else material (the KV-cache read is
    added by the caller, it depends on context length)."""
    n_params = 0
    n_bytes = 0

    def add(w):
        nonlocal n_params, n_bytes
        if isinstance(w, dict) and "q" in w:
            if "q4" in w:
                p = w["q4"]
                n_params += int(p.q4.size) * 2
                n_bytes += int(p.q4.size) + 4 * int(p.s_lo.size) * 2
            else:
                n_params += int(w["q"].size)
                n_bytes += int(w["q"].size)
        else:
            n_params += int(w.size)
            n_bytes += int(w.size) * w.dtype.itemsize

    for lp in phi3_params["layers"]:
        for k in ("qkv", "o", "gate_up", "down"):
            add(lp[k])
    add(phi3_params["lm_head"])
    return n_params, n_bytes


def _phase_breakdown(runner, params, cfg, state, obs, hist, rep, B, steps=6,
                     prev_gen=None, feed=None):
    """Time perceive / prefill / decode as separate programs and derive
    MFU + HBM-utilization figures (VERDICT r1 item 5).

    Figures include the per-dispatch tunnel RTT; ``rtt_ms`` (a trivial
    dispatch) is reported alongside so the on-chip share can be read off.

    ``prev_gen`` is the headline loop's LAST generated ids — one state-step
    stale relative to ``state``, which is exactly the regime the closed loop
    runs (step t drafts from step t-1's output).  When provided, the decode
    slope and spec stats are measured primed (the headline configuration)
    with the prompt-only numbers kept alongside.
    """
    import jax
    import jax.numpy as jnp

    from dynam3d_tpu.models.vlm import llava as llava_mod
    from dynam3d_tpu.models.vlm import phi3 as phi3_mod

    splice = runner.splice_start
    p3 = cfg.llava.phi3
    new_tok = cfg.llava.max_new_tokens

    def prefill_only(p, ids, tv, mm, mv):
        emb = llava_mod.splice_embeds(p["llava"], cfg.llava, ids, mm, splice)
        av = jax.lax.dynamic_update_slice(tv, mv, (0, splice))
        T = emb.shape[1]
        cache = phi3_mod.init_cache(p3, emb.shape[0], T + new_tok, emb.dtype)
        pos = jnp.maximum(jnp.cumsum(av.astype(jnp.int32), 1) - 1, 0)
        mask = phi3_mod.prefill_mask(av, T + new_tok)
        last = jnp.sum(av.astype(jnp.int32), 1) - 1
        logits, _ = phi3_mod.forward(
            p["llava"]["phi3"], p3, emb, pos, cache, 0, mask, lm_at=last
        )
        return jnp.argmax(logits[:, 0], -1)

    pf = jax.jit(prefill_only)
    triv = jax.jit(lambda x: x + 1.0)

    # decode cost via the two-length generate slope: (t_long - t_short) /
    # (n_long - n_short) cancels the prefill AND the dispatch RTT exactly,
    # where the old generate-minus-prefill subtraction left tunnel-RTT jitter
    # (two independent p50s) inside the decode number.
    short_tok = max(new_tok // 2 - 2, 1)

    def _gen_n(p, ids, tv, mm, mv, pg, n):
        emb = llava_mod.splice_embeds(p["llava"], cfg.llava, ids, mm, splice)
        av = jax.lax.dynamic_update_slice(tv, mv, (0, splice))
        # same draft source as generate_action_ids: both slope endpoints
        # must run the same speculative regime or the slope mixes
        # acceptance rates; pg rows of -1 never match (unprimed)
        lookup = None
        if ids.shape[0] == 1:
            lookup = jnp.where(
                tv & (ids != p3.image_token_id), ids, -1
            )
            lookup = jnp.concatenate(
                [lookup, jnp.where(pg == p3.pad_token_id, -1, pg)], axis=1
            )
        return llava_mod.generate(
            p["llava"], cfg.llava, emb, av, max_new_tokens=n,
            lookup_ids=lookup,
        )

    import functools

    gs = jax.jit(functools.partial(_gen_n, n=short_tok))
    gl = jax.jit(functools.partial(_gen_n, n=new_tok))
    no_pg = jnp.full((B, new_tok), -1, jnp.int32)
    pg = no_pg if prev_gen is None else jnp.asarray(prev_gen)

    from dynam3d_tpu.runtime.episode import EpisodeRunner as _ER

    # same uint16 wire dtype the headline loop uploads, so this reuses the
    # headline's compiled perceive instead of compiling an f32 twin
    rgb, depth = rep(obs.rgb), rep(_ER.pack_depth(obs.depth))
    pos, hd = rep(obs.position), jnp.asarray(
        np.full((B,), obs.heading, np.float32)
    )
    ids, tvalid, _ = runner._prompt_ids([obs.instruction] * B, [hist] * B)
    out = runner._perceive(params, state, rgb, depth, pos, hd)
    _sync(out.mm_valid)
    # warm compiles
    _sync(pf(params, ids, tvalid, out.mm_tokens, out.mm_valid))
    gen = gl(params, ids, tvalid, out.mm_tokens, out.mm_valid, pg)
    _sync(gen)
    gen_s = gs(params, ids, tvalid, out.mm_tokens, out.mm_valid, pg)
    _sync(gen_s)
    _sync(triv(hd))

    def t(fn):
        ts = []
        for _ in range(steps):
            t0 = time.time()
            _sync(fn())
            ts.append(time.time() - t0)
        return float(np.percentile(ts, 50) * 1000.0)

    rtt = t(lambda: triv(hd))
    perceive_ms = t(
        lambda: runner._perceive(params, state, rgb, depth, pos, hd).mm_valid
    )
    prefill_ms = t(lambda: pf(params, ids, tvalid, out.mm_tokens, out.mm_valid))
    generate_ms = t(
        lambda: gl(params, ids, tvalid, out.mm_tokens, out.mm_valid, pg)
    )
    generate_short_ms = t(
        lambda: gs(params, ids, tvalid, out.mm_tokens, out.mm_valid, pg)
    )

    # tokens actually generated (random weights usually never emit stop)
    gen_np = np.asarray(gen)
    n_tok = int(
        np.max(np.sum(gen_np != p3.pad_token_id, axis=1).clip(min=1))
    )
    gen_s_np = np.asarray(gen_s)
    n_tok_s = int(
        np.max(np.sum(gen_s_np != p3.pad_token_id, axis=1).clip(min=1))
    )
    slope = (generate_ms - generate_short_ms) / max(n_tok - n_tok_s, 1)
    decode_ms = max(slope * n_tok, 0.0)
    n_valid = int(np.asarray(jnp.sum(tvalid)))
    n_params, dec_bytes = _llm_flops_bytes(params["llava"]["phi3"], cfg)
    T_total = int(ids.shape[1]) + new_tok
    kv_bytes = (
        2 * p3.num_layers * T_total * p3.num_kv_heads * p3.head_dim * 2
    )
    prefill_flops = 2 * n_valid * n_params + 4 * p3.num_layers * (
        n_valid * n_valid * p3.hidden_size
    )
    from dynam3d_tpu import flags as _flags

    # MFU denominator follows the prefill matmul dtype: W8A8 (default) runs
    # the prefill dots on the MXU's int8 path, whose peak is 2x bf16
    w8a8 = _flags.W8A8_PREFILL
    peak_flops = 394e12 if w8a8 else 197e12  # v5e int8 / bf16
    peak_bw = 819e9      # v5e HBM
    pf_net = max(prefill_ms - rtt, 1e-3)
    dec_per_tok = decode_ms / max(n_tok, 1)
    out_fields = {
        "rtt_ms": round(rtt, 2),
        "perceive_ms": round(perceive_ms, 2),
        "prefill_ms": round(prefill_ms, 2),
        "decode_ms": round(decode_ms, 2),
        "decode_ms_per_tok": round(dec_per_tok, 3),
        "decode_tokens": n_tok,
        "prompt_tokens": n_valid,
        "llm_params_m": round(n_params / 1e6, 1),
        "prefill_matmul_dtype": "int8" if w8a8 else "bf16",
        "prefill_mfu_pct": round(100 * prefill_flops / (pf_net / 1e3) / peak_flops, 1),
        # llava.generate only takes the speculative path at B == 1
        "decode_mode": "spec" if (_flags.SPEC_DECODE and B == 1) else "greedy",
    }
    if not (_flags.SPEC_DECODE and B == 1):
        # the per-token weight+KV stream identity only holds for plain
        # greedy decode; speculative passes amortize it across accepted
        # tokens, so the "utilization" reading would be meaningless
        out_fields["decode_hbm_pct"] = round(
            100 * (dec_bytes + kv_bytes) / (dec_per_tok / 1e3) / peak_bw, 1
        )
    else:
        # measured speculation stats for THIS bench's decode stream
        # (random weights: the realistic-text acceptance study lives in
        # tools/spec_acceptance.py and docs/BENCH_NOTES.md).  Measured both
        # primed (prev-step generation in the draft source — the headline
        # loop's regime) and prompt-only, so the priming win is explicit.
        def gen_stats(p, ids, tv, mm, mv, pgk):
            emb = llava_mod.splice_embeds(
                p["llava"], cfg.llava, ids, mm, splice
            )
            av = jax.lax.dynamic_update_slice(tv, mv, (0, splice))
            lookup = jnp.where(tv & (ids != p3.image_token_id), ids, -1)
            lookup = jnp.concatenate(
                [lookup, jnp.where(pgk == p3.pad_token_id, -1, pgk)], axis=1
            )
            g, st = phi3_mod.greedy_decode_spec(
                p["llava"]["phi3"], p3, emb, av, new_tok,
                lookup_ids=lookup, return_stats=True,
            )
            return g, st["tokens"], st["passes"]

        stats_fn = jax.jit(gen_stats)
        _, toks, passes = stats_fn(
            params, ids, tvalid, out.mm_tokens, out.mm_valid, pg
        )
        toks, passes = int(np.asarray(toks)), int(np.asarray(passes))
        out_fields["spec_tokens"] = toks
        out_fields["spec_passes"] = passes
        out_fields["spec_tokens_per_pass"] = round(toks / max(passes, 1), 2)
        if prev_gen is not None:
            _, t0u, p0u = stats_fn(
                params, ids, tvalid, out.mm_tokens, out.mm_valid, no_pg
            )
            t0u, p0u = int(np.asarray(t0u)), int(np.asarray(p0u))
            out_fields["spec_tokens_per_pass_unprimed"] = round(
                t0u / max(p0u, 1), 2
            )
        if prev_gen is not None and feed is not None:
            # LOOP-regime stats: evolve state + frame for a few steps, each
            # step primed by the PREVIOUS step's actual generation — the
            # number the headline loop really runs at (the static estimate
            # above holds obs/state fixed, which overstates acceptance when
            # the generation drifts frame-to-frame)
            sim_state, pgk, tp = state, pg, []
            o2 = obs
            for _ in range(4):
                o2, _, _ = feed.step((0.1, 0.25))
                po = runner._perceive(
                    params, sim_state, rep(o2.rgb), rep(o2.depth),
                    rep(o2.position),
                    jnp.asarray(np.full((B,), o2.heading, np.float32)),
                )
                sim_state = po.state
                g, tk, ps = stats_fn(
                    params, ids, tvalid, po.mm_tokens, po.mm_valid, pgk
                )
                tp.append(int(np.asarray(tk)) / max(int(np.asarray(ps)), 1))
                pgk = g
            out_fields["spec_tokens_per_pass_loop"] = round(
                float(np.mean(tp)), 2
            )
    return out_fields


def waypoint_bench():
    """DYNAM3D_BENCH_MODE=waypoint: the 12-view candidate-waypoint program
    at full dims (depth resnet50 on 12x256^2 views -> TRM heatmap -> NMS;
    ss_trainer_Dynam3D.py:636-640) as ONE jitted program."""
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dynam3d_tpu.config import DepthEncoderConfig, WaypointConfig
    from dynam3d_tpu.models import policy_3dff
    from dynam3d_tpu.models.encoders.depth_resnet import (
        encode_depth, init_depth_params, preprocess_depth,
    )
    from dynam3d_tpu.models.waypoint.trm import (
        extract_candidates, init_waypoint_params, predict_heatmap,
    )

    steps = int(os.environ.get("DYNAM3D_BENCH_STEPS", "12"))
    dcfg = DepthEncoderConfig()
    wcfg = WaypointConfig()
    kd, kw = jax.random.split(jax.random.PRNGKey(0))
    dparams = init_depth_params(kd, dcfg)
    feat = jax.eval_shape(
        lambda p, d: encode_depth(p, dcfg, d), dparams,
        jax.ShapeDtypeStruct(
            (1, dcfg.input_size, dcfg.input_size, 1), jnp.float32
        ),
    )
    wparams = init_waypoint_params(kw, wcfg, depth_feat_dim=feat.shape[-1])

    # params as jit ARGUMENTS (not closure constants): embedding ~25M resnet
    # weights as HLO constants forces a device->host download at lowering
    # time and keys the persistent compile cache on the weight VALUES — the
    # 28-minute cold compile seen in round 4 (VERDICT r4 weak #5)
    def wp(dp, wp_, dep12):  # [1,12,Hd,Wd] raw depth (vln_loop._wp)
        d = policy_3dff.clockwise_reorder(dep12)
        d = preprocess_depth(
            d.reshape(12, *d.shape[2:])[..., None], (0.0, 10.0)
        ) / 10.0
        feats = encode_depth(dp, dcfg, d)
        hm = predict_heatmap(wp_, wcfg, feats)
        return extract_candidates(wcfg, hm)

    fn_jit = jax.jit(wp)
    fn = lambda dep12: fn_jit(dparams, wparams, dep12)
    rng = np.random.default_rng(0)
    dep = jnp.asarray(
        rng.uniform(0.05, 0.95, (1, 12, dcfg.input_size, dcfg.input_size))
        .astype(np.float32)
    )
    t0 = time.time()
    out = fn(dep)
    _sync(out.mask)
    compile_s = time.time() - t0
    lat = []
    for _ in range(steps):
        t0 = time.time()
        out = fn(dep)
        _sync(out.mask)
        lat.append(time.time() - t0)
    p50 = float(np.percentile(lat, 50) * 1000.0)
    print(json.dumps({
        "metric": "waypoint_12view_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "baseline": "unmeasured",
            "compile_s": round(compile_s, 1),
            "depth_size": dcfg.input_size,
            "candidates": int(np.asarray(jnp.sum(out.mask))),
            "backend": jax.default_backend(),
        },
    }))


def train_bench():
    """DYNAM3D_BENCH_MODE=train: the jitted IL training step on the chip at
    full dims (the reference spends 2/3 of its life here:
    ss_trainer_Dynam3D.py:786-798 — perceive + teacher-forced prefill +
    backward + Adafactor).  Reports step p50 and achieved model FLOPs
    utilization (fwd+bwd ~= 3x forward FLOPs over the trained LLM)."""
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.vlm.tokenizer import ByteTokenizer, build_prompt
    from dynam3d_tpu.runtime import trainer_vln
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

    scale = os.environ.get("DYNAM3D_BENCH_SCALE", "full")
    steps = int(os.environ.get("DYNAM3D_BENCH_STEPS", "8"))
    # B>1: batched teacher-forced IL (the reference's only batching story is
    # 4-way DP at batch 1/GPU, ss_trainer_Dynam3D.py:186-190; one chip
    # batching B episodes' steps amortizes the weight pass B-fold)
    B = int(os.environ.get("DYNAM3D_BENCH_BATCH", "1"))
    cfg = _config(scale)
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = trainer_vln.split_params(params)
    optimizer = trainer_vln.make_optimizer(cfg)
    opt_state = optimizer.init(trainable)

    from dynam3d_tpu.models.policy import I_ENV, Z_ENV

    tok = ByteTokenizer(cfg.llava.phi3.vocab_size)
    n_mm = cfg.fields.input_height * cfg.fields.input_width + I_ENV + Z_ENV
    probe = tok.encode(build_prompt("x", ["none\n"] * 4, 1))
    splice = probe.index(tok.image_id)
    step = jax.jit(
        trainer_vln.make_train_step(cfg, optimizer, splice),
        donate_argnums=(0, 2, 3),
    )

    feed = SyntheticRoomFeed(
        rgb_size=cfg.clip.image_size,
        depth_size=256 if scale == "full" else 32, views=1,
    )
    obs = feed.reset()
    gt = "turn left 2 steps, move forward 4 steps."
    instruction = "walk past the sofa and stop at the door"
    ids_l = tok.encode(build_prompt(instruction, ["none\n"] * 4, n_mm, gt))
    label_ids = tok.encode(gt, add_bos=False)
    bucket = cfg.llava.prefill_bucket
    T = (len(ids_l) + bucket - 1) // bucket * bucket
    ids = np.full((1, T), tok.pad_id, np.int32)
    valid = np.zeros((1, T), bool)
    ids[0, : len(ids_l)] = ids_l
    valid[0, : len(ids_l)] = True
    Tg = len(label_ids)

    def tile(x):
        return np.broadcast_to(x, (B,) + x.shape[1:]).copy()

    batch = trainer_vln.TrainBatch(
        rgb=jnp.asarray(tile(obs.rgb[None, :1])),
        depth=jnp.asarray(tile(np.asarray(obs.depth[None, :1], np.float32))),
        position=jnp.asarray(tile(np.asarray(obs.position[None], np.float32))),
        heading=jnp.asarray(tile(np.float32([obs.heading]))),
        input_ids=jnp.asarray(tile(ids)),
        text_valid=jnp.asarray(tile(valid)),
        label_ids=jnp.asarray(tile(np.asarray([label_ids], np.int32))),
        label_mask=jnp.ones((B, Tg), bool),
        turn_weight=jnp.asarray(np.ones((B,), np.float32)),
    )
    field_state = policy_mod.batched_init_state(cfg, B)

    t0 = time.time()
    trainable, opt_state, field_state, m = step(
        trainable, frozen, opt_state, field_state, batch
    )
    _sync(m["loss"])
    compile_s = time.time() - t0
    lat = []
    loss = grad_norm = 0.0
    for _ in range(steps):
        t0 = time.time()
        trainable, opt_state, field_state, m = step(
            trainable, frozen, opt_state, field_state, batch
        )
        host = np.asarray(
            jnp.stack([m["loss"].astype(jnp.float32),
                       m["grad_norm"].astype(jnp.float32)])
        )
        lat.append(time.time() - t0)
        loss, grad_norm = float(host[0]), float(host[1])
    p50 = float(np.percentile(lat, 50) * 1000.0)

    # achieved MFU: fwd+bwd over the trained LLM dominates (3x forward);
    # count the full prompt length (every token is teacher-forced)
    p3 = cfg.llava.phi3
    n_params, _ = _llm_flops_bytes(params["llava"]["phi3"], cfg)
    n_tok = int(valid.sum())  # per sample
    flops = 3 * B * (2 * n_tok * n_params
                     + 4 * p3.num_layers * n_tok * n_tok * p3.hidden_size)
    mfu = 100 * flops / (p50 / 1e3) / 197e12  # bf16 training matmuls
    print(json.dumps({
        "metric": "train_step_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "baseline": "unmeasured",
            "compile_s": round(compile_s, 1),
            "scale": scale,
            "batch": B,
            "llm_layers": p3.num_layers,
            "prompt_tokens": n_tok,
            "train_mfu_pct": round(mfu, 1),
            "steps_per_sec": round(1000.0 / p50, 2),
            "env_steps_per_sec": round(B * 1000.0 / p50, 2),
            "loss": round(loss, 4),
            "grad_norm": round(grad_norm, 3),
            "backend": jax.default_backend(),
        },
    }))


def pretrain_bench():
    """DYNAM3D_BENCH_MODE=pretrain: one full 3DFF pretrain iteration on the
    chip (ss_trainer_3DFF.py:504-519 / :1263-1296): 16 posed frames CLIP-
    encoded and folded into the memory, all 16 views rendered back through
    the nerf heads, the full loss family, AdamW update.  Reports iteration
    p50 + the build_batch (CLIP encode) / step (fold+render+losses) split."""
    import jax

    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.memory3d import init_state
    from dynam3d_tpu.runtime.pretrain_loop import (
        PretrainRunner, SyntheticFramesDataset,
    )

    scale = os.environ.get("DYNAM3D_BENCH_SCALE", "full")
    iters = int(os.environ.get("DYNAM3D_BENCH_STEPS", "4"))
    frames = int(os.environ.get("DYNAM3D_BENCH_FRAMES", "16"))
    cfg = _config(scale)
    if scale == "tiny":  # novel-view ray grid must divide the 4x4 patch grid
        from dynam3d_tpu.config import apply_opts

        cfg = apply_opts(cfg, ["fields.view_height=2", "fields.view_width=2"])
    # init ONLY what pretraining uses: the full policy tree would park the
    # 7.4 GB bf16 LLaVA in HBM for nothing (observed v5e OOM)
    from dynam3d_tpu.models.encoders import clip as clip_mod
    from dynam3d_tpu.models.memory3d import init_field_params
    from dynam3d_tpu.models.render.nerf import init_render_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pr_params = {
        "fields": init_field_params(k1, cfg.fields),
        "render": init_render_params(k2, cfg.fields),
        "clip": clip_mod.init_clip_params(k3, cfg.clip),
    }
    runner = PretrainRunner(pr_params, cfg)
    ds = SyntheticFramesDataset(
        rgb_size=cfg.clip.image_size,
        depth_size=256 if scale == "full" else 32,
        frames=frames,
    )

    # warm compile (scene shapes are static across iterations)
    t0 = time.time()
    runner.run([ds], iters=1)
    compile_s = time.time() - t0

    # phase split: CLIP encode+batch build vs the jitted fold/render/loss step
    scene = ds.sample_scene()
    t0 = time.time()
    batch = runner.build_batch(scene, pr_params["clip"])
    _sync(batch.grid_fts)
    build_ms = (time.time() - t0) * 1000.0

    trainable = {"fields": runner.params["fields"],
                 "render": runner.params["render"]}
    runner._ensure_opt(trainable)
    step = runner._get_step(posed="intrinsics" in scene)
    fs = init_state(cfg.fields)
    t0 = time.time()
    _, _, _, metrics = step(trainable, runner._tr_opt, fs, batch)
    _sync(metrics["loss"])
    step_ms = (time.time() - t0) * 1000.0

    # roofline denominators from the compiled programs themselves (XLA cost
    # analysis: exact flop/byte counts of what actually runs) — VERDICT r4
    # item 5: is 1.86 s/iter good?  mfu/hbm percentages answer it.
    def _cost(jitted, *args):
        try:
            c = jitted.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get("flops", 0.0)), float(
                c.get("bytes accessed", 0.0)
            )
        except Exception:
            return 0.0, 0.0

    step_fl, step_by = _cost(step, trainable, runner._tr_opt, fs, batch)
    peak_flops, peak_bw = 197e12, 819e9  # v5e bf16 / HBM
    step_mfu = 100 * step_fl / (step_ms / 1e3) / peak_flops
    step_hbm = 100 * step_by / (step_ms / 1e3) / peak_bw

    # steady-state: ONE multi-iteration run — the runner's metrics pipeline
    # overlaps iteration t+1's scene staging + fused batch build under t's
    # in-flight grad step; a per-call (iters=1) loop would re-serialize at
    # every call-boundary flush
    t0 = time.time()
    hist = runner.run([ds], iters=iters)
    p50 = (time.time() - t0) * 1000.0 / iters
    last = hist[-1]
    print(json.dumps({
        "metric": "pretrain_iter_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "baseline": "unmeasured",
            "compile_s": round(compile_s, 1),
            "scale": scale,
            "frames": frames,
            "build_batch_ms": round(build_ms, 1),
            "grad_step_ms": round(step_ms, 1),
            "grad_step_mfu_pct": round(step_mfu, 1),
            "grad_step_hbm_pct": round(step_hbm, 1),
            "grad_step_tflops": round(step_fl / 1e12, 2),
            "iters_per_sec": round(1000.0 / p50, 3),
            "pipelined": True,
            "loss": round(float(last.get("loss", float("nan"))), 4),
            "backend": jax.default_backend(),
        },
    }))


def serve_bench():
    """DYNAM3D_BENCH_MODE=serve: closed-loop multi-episode serving
    (BASELINE config 5): EpisodeRunner.run over B synthetic episodes with
    run_interleaved host/device overlap; reports steps/sec and per-step p50
    vs the single-episode path.  Batch via DYNAM3D_BENCH_BATCH (default 4),
    groups via DYNAM3D_BENCH_GROUPS (default 2)."""
    import jax

    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.vlm.phi3 import quantize_phi3
    from dynam3d_tpu.runtime.episode import EpisodeRunner
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

    scale = os.environ.get("DYNAM3D_BENCH_SCALE", "full")
    B = int(os.environ.get("DYNAM3D_BENCH_BATCH", "4"))
    groups = int(os.environ.get("DYNAM3D_BENCH_GROUPS", "2"))
    max_steps = int(os.environ.get("DYNAM3D_BENCH_STEPS", "6"))
    cfg = _config(scale)
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    bits = int(os.environ.get("DYNAM3D_QUANT_BITS", "4"))
    if bits:
        params["llava"]["phi3"] = quantize_phi3(
            params["llava"]["phi3"], bits=bits, consume=True
        )
    runner = EpisodeRunner(params, cfg)
    rgb_size = cfg.clip.image_size
    depth_size = 256 if scale == "full" else 32

    def feeds(n):
        return [
            SyntheticRoomFeed(
                rgb_size=rgb_size, depth_size=depth_size, views=1, seed=i
            )
            for i in range(n)
        ]

    # warmup/compile the B-episode shape and every per-group shape the
    # interleaved split will use
    runner.run(feeds(B), max_steps=2, ignore_stop=True)
    runner.run_interleaved(
        feeds(B), groups=groups, max_steps=2, ignore_stop=True
    )
    t0 = time.time()
    res = runner.run(feeds(B), max_steps=max_steps, ignore_stop=True)
    batch_s = time.time() - t0
    n_steps = sum(r["steps"] for r in res)

    t0 = time.time()
    res_i = runner.run_interleaved(
        feeds(B), groups=groups, max_steps=max_steps, ignore_stop=True
    )
    inter_s = time.time() - t0
    n_steps_i = sum(r["steps"] for r in res_i)

    runner.run(feeds(1), max_steps=2, ignore_stop=True)
    t0 = time.time()
    res1 = runner.run(feeds(1), max_steps=max_steps, ignore_stop=True)
    single_s = time.time() - t0

    # A/B the async double-buffered upload (EpisodeRunner._upload streams
    # each episode's frame while the other feeds render) against a forced
    # SYNCHRONOUS upload, so the overlap is demonstrated rather than
    # asserted: sync blocks on every copy before the next feed renders.
    import dynam3d_tpu.runtime.episode as ep_mod

    orig_upload = ep_mod.EpisodeRunner._upload

    def sync_upload(o):
        arrs = orig_upload(o)
        for a in arrs:
            np.asarray(a.ravel()[:1])  # force the copy to finish
        return arrs

    ep_mod.EpisodeRunner._upload = staticmethod(sync_upload)
    try:
        t0 = time.time()
        res_s = runner.run(feeds(B), max_steps=max_steps, ignore_stop=True)
        sync_s = time.time() - t0
        n_steps_s = sum(r["steps"] for r in res_s)
    finally:
        # restore as a staticmethod: class-level access above returned the
        # bare function, and assigning that back would bind `self` as the
        # observation on the next instance call
        ep_mod.EpisodeRunner._upload = staticmethod(orig_upload)

    print(json.dumps({
        "metric": "serve_steps_per_sec",
        "value": round(n_steps / batch_s, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "extra": {
            "baseline": "unmeasured",
            "batch": B,
            "groups": groups,
            "batched_step_ms": round(batch_s / max(n_steps / B, 1) * 1000, 1),
            "interleaved_steps_per_sec": round(n_steps_i / inter_s, 3),
            "single_steps_per_sec": round(res1[0]["steps"] / single_s, 3),
            "sync_upload_steps_per_sec": round(n_steps_s / sync_s, 3),
            "scale": scale,
            "quant_bits": bits,
            "max_steps": max_steps,
        },
    }))


def main():
    import jax

    if os.environ.get("DYNAM3D_BENCH_MODE") == "render":
        return render_bench()
    if os.environ.get("DYNAM3D_BENCH_MODE") == "serve":
        return serve_bench()
    if os.environ.get("DYNAM3D_BENCH_MODE") == "train":
        return train_bench()
    if os.environ.get("DYNAM3D_BENCH_MODE") == "pretrain":
        return pretrain_bench()
    if os.environ.get("DYNAM3D_BENCH_MODE") == "waypoint":
        return waypoint_bench()

    # persistent compile cache: the tunnel makes cold compiles ~10min at full
    # scale; warm runs start in seconds.
    cache_dir = os.environ.get("DYNAM3D_XLA_CACHE", "/tmp/dynam3d_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.runtime.episode import EpisodeRunner
    from dynam3d_tpu.runtime.feed import SyntheticRoomFeed

    scale = os.environ.get("DYNAM3D_BENCH_SCALE", "full")
    # Round-5 fixed protocol (docs/BENCH_NOTES.md "Measurement protocol"):
    # >=50 overlapped steps, p10/p50/p90, tunnel RTT measured by interleaved
    # trivial dispatches and reported as device_step_ms = p50 - rtt_p50.
    steps = int(os.environ.get("DYNAM3D_BENCH_STEPS", "50"))
    B = int(os.environ.get("DYNAM3D_BENCH_BATCH", "1"))
    cfg = _config(scale)
    if os.environ.get("DYNAM3D_SEGMENTER"):  # A/B: yolov8 | depth_plane
        from dynam3d_tpu.config import apply_opts

        cfg = apply_opts(
            cfg, [f"segmenter.provider={os.environ['DYNAM3D_SEGMENTER']}"]
        )

    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    # Weight-only quantized decode is the default serving configuration
    # (docs/BENCH_NOTES.md).  DYNAM3D_QUANT_BITS: 4 = packed-int4 decode via
    # the Pallas unpack-in-VMEM matvec (+ int8 prefill), 8 = int8 everywhere,
    # 0 = bf16.  DYNAM3D_INT8_DECODE=0 kept as a bf16 alias.
    bits = int(os.environ.get("DYNAM3D_QUANT_BITS", "4"))
    if os.environ.get("DYNAM3D_INT8_DECODE", "1") in ("0", "false"):
        bits = 0
    if bits:
        from dynam3d_tpu.models.vlm.phi3 import quantize_phi3

        params["llava"]["phi3"] = quantize_phi3(
            params["llava"]["phi3"], bits=bits, consume=True
        )
    runner = EpisodeRunner(params, cfg)
    rgb_size = cfg.clip.image_size
    depth_size = 256 if scale == "full" else 32
    feed = SyntheticRoomFeed(rgb_size=rgb_size, depth_size=depth_size, views=1)

    obs = feed.reset()
    state = policy_mod.batched_init_state(cfg, B)

    def rep(x):
        return jnp.asarray(np.broadcast_to(x[None], (B,) + x.shape))

    pack_depth = EpisodeRunner.pack_depth  # uint16 wire, dequant on-device

    def one_step(state, obs, hist):
        rgb = rep(obs.rgb)
        depth = rep(pack_depth(obs.depth))
        pos = rep(obs.position)
        hd = jnp.asarray(np.full((B,), obs.heading, np.float32))
        ids, tvalid, _ = runner._prompt_ids([obs.instruction] * B, [hist] * B)
        st, gen = runner._full_step(params, state, rgb, depth, pos, hd, ids, tvalid)
        _sync(gen)
        # perceive compiled separately for the fps metric
        out = runner._perceive(params, st, rgb, depth, pos, hd)
        _sync(out.mm_valid)
        return out, gen

    hist = ["none\n"] * 4
    # warmup / compile
    t0 = time.time()
    out, gen = one_step(state, obs, hist)
    compile_s = time.time() - t0

    # Headline: OVERLAPPED steady-state step latency — frame t+1's host
    # render + host->device copy + tokenization run UNDER frame t's fused
    # device step (jax async dispatch), the pipeline the reference builds
    # with VectorEnv worker processes (env_utils.py:119-126).  A forced-
    # SYNCHRONOUS A/B (upload blocks, then step blocks) is reported as
    # sync_step_ms; upload_ms times the bare copy (a tunnel artifact at
    # ~Mbps — real PCIe hides it entirely).
    lat, lat_sync, perc, uplds, rtts = [], [], [], [], []
    st = out.state
    rgb = rep(obs.rgb)
    depth = rep(pack_depth(obs.depth))
    pos = rep(obs.position)
    hd = jnp.asarray(np.full((B,), obs.heading, np.float32))
    _sync(rgb)
    triv = jax.jit(lambda x: x + 1.0)
    _sync(triv(hd))
    ids, tvalid, _ = runner._prompt_ids([obs.instruction] * B, [hist] * B)
    n_perc = min(steps, 12)  # fps metric needs far fewer samples
    prev_g = gen  # warmup step's output primes step 0's drafts
    for k in range(steps):
        # interleaved tunnel-RTT samples (a trivial dispatch+readback):
        # the RTT level drifts over minutes, so sampling it INSIDE the
        # measurement window is the only way device_step_ms is meaningful
        if k % 4 == 0:
            t0 = time.time()
            _sync(triv(hd))
            rtts.append(time.time() - t0)
        # fps metric: perceive-only (device-resident inputs)
        if k < n_perc:
            t0 = time.time()
            o = runner._perceive(params, st, rgb, depth, pos, hd)
            _sync(o.mm_valid)
            perc.append(time.time() - t0)
        # headline: dispatch the fused step, then overlap the next frame's
        # render/upload/tokenize with the device compute; the previous step's
        # generated ids (device-resident) prime the spec-decode drafts, the
        # production EpisodeRunner.run wiring
        t0 = time.time()
        st, g = runner._full_step(
            params, st, rgb, depth, pos, hd, ids, tvalid, prev_g
        )
        prev_g = g
        obs, _, _ = feed.step((0.1, 0.25))
        rgb = rep(obs.rgb)
        depth = rep(pack_depth(obs.depth))
        pos = rep(obs.position)
        hd = jnp.asarray(np.full((B,), obs.heading, np.float32))
        ids, tvalid, _ = runner._prompt_ids([obs.instruction] * B, [hist] * B)
        _sync(g)
        lat.append(time.time() - t0)
    # sync A/B: block on the fresh upload BEFORE dispatching the step, and
    # on the step before rendering the next frame — no overlap anywhere
    for k in range(max(steps // 2, 3)):
        obs, _, _ = feed.step((0.1, 0.25))
        t0 = time.time()
        rgb = rep(obs.rgb)
        depth = rep(pack_depth(obs.depth))
        pos = rep(obs.position)
        hd = jnp.asarray(np.full((B,), obs.heading, np.float32))
        _sync(rgb), _sync(depth), _sync(pos)
        t_up = time.time()
        uplds.append(t_up - t0)
        ids, tvalid, _ = runner._prompt_ids([obs.instruction] * B, [hist] * B)
        st, g = runner._full_step(
            params, st, rgb, depth, pos, hd, ids, tvalid, prev_g
        )
        _sync(g)
        prev_g = g
        lat_sync.append(time.time() - t0)

    p50_ms = float(np.percentile(lat, 50) * 1000.0)
    p10_ms = float(np.percentile(lat, 10) * 1000.0)
    p90_ms = float(np.percentile(lat, 90) * 1000.0)
    rtt_p50 = float(np.percentile(rtts, 50) * 1000.0)
    # the overlapped closed loop pays exactly ONE dispatch+readback
    # round-trip per step; on a host-attached TPU (PCIe) that term is ~us,
    # on this dev tunnel it is tens of ms and drifts — device_step_ms is
    # the transport-independent number
    device_step_ms = max(p50_ms - rtt_p50, 0.0)
    sync_p50 = float(np.percentile(lat_sync, 50) * 1000.0)
    perc_p50 = float(np.percentile(perc, 50) * 1000.0)
    upload_p50 = float(np.percentile(uplds, 50) * 1000.0)
    fps = 1000.0 / perc_p50 * B

    # vs_baseline: denominator from bench_baseline.json (shipped as an
    # explicitly-flagged analytic estimate — see module docstring); null +
    # "unmeasured" when absent, never a placeholder 1.0.
    vs, vs_range, vs_device, baseline_kind = None, None, None, "unmeasured"
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    full_stack = scale == "full" and cfg.llava.phi3.num_layers == 32
    if not full_stack:
        baseline_kind = "not-comparable (reduced config)"
    elif os.path.exists(base_path):
        base = json.load(open(base_path))
        if base.get("p50_step_latency_ms"):
            vs = round(float(base["p50_step_latency_ms"]) / p50_ms, 3)
            vs_device = round(
                float(base["p50_step_latency_ms"]) / max(device_step_ms, 1e-3),
                3,
            )
            baseline_kind = base.get("provenance", "measured")
            if base.get("p50_range_ms"):
                # the analytic denominator carries a sensitivity band
                # (bench_baseline.json range_note) — report the claim as a
                # range, not a point
                lo, hi = base["p50_range_ms"]
                vs_range = [round(lo / p50_ms, 2), round(hi / p50_ms, 2)]

    breakdown = {}
    if os.environ.get("DYNAM3D_BENCH_BREAKDOWN", "1") not in ("0", "false"):
        try:
            breakdown = _phase_breakdown(
                runner, params, cfg, st, obs, hist, rep, B, prev_gen=prev_g,
                feed=feed,
            )
        except Exception as e:  # pragma: no cover - diagnostics only
            breakdown = {"breakdown_error": str(e)[:200]}

    # attach the most recent train/pretrain/waypoint sweep results
    # (scripts/bench_round4.sh writes them) so one bench line carries the
    # training-side numbers next to the serving ones
    _runs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "runs")
    sweep_path = os.path.join(_runs, "bench_round5.jsonl")
    if not os.path.exists(sweep_path):
        sweep_path = os.path.join(_runs, "bench_round4.jsonl")
    if os.path.exists(sweep_path):
        for line in open(sweep_path):
            try:
                row = json.loads(line)
            except ValueError:
                continue
            r = row.get("line", {})
            if row.get("mode") in ("train", "train_b8", "pretrain",
                                   "waypoint", "full_step_chain") and \
                    isinstance(r, dict) and "value" in r:
                key = r.get("metric", row["mode"])
                if row["mode"] == "train_b8":
                    key = "train_step_b8_p50_ms"
                breakdown[key] = r["value"]
                if row["mode"] == "train":
                    breakdown["train_mfu_pct"] = r.get("extra", {}).get(
                        "train_mfu_pct"
                    )
                if row["mode"] == "train_b8":
                    breakdown["train_b8_mfu_pct"] = r.get("extra", {}).get(
                        "train_mfu_pct"
                    )

    print(
        json.dumps(
            {
                "metric": "p50_step_latency_ms",
                "value": round(p50_ms, 2),
                "unit": "ms",
                "vs_baseline": vs,
                "extra": {
                    "baseline": baseline_kind,
                    "vs_baseline_range": vs_range,
                    "p10_ms": round(p10_ms, 2),
                    "p90_ms": round(p90_ms, 2),
                    "tunnel_rtt_p50_ms": round(rtt_p50, 2),
                    "device_step_ms": round(device_step_ms, 2),
                    "vs_baseline_device": vs_device,
                    "rgbd_to_3d_tokens_fps": round(fps, 2),
                    "perceive_p50_ms": round(perc_p50, 2),
                    "sync_step_ms": round(sync_p50, 2),
                    "upload_ms": round(upload_p50, 2),
                    "overlap": "async",
                    "compile_s": round(compile_s, 1),
                    "scale": scale,
                    "llm_layers": cfg.llava.phi3.num_layers,
                    "backend": jax.default_backend(),
                    "steps": steps,
                    "batch": B,
                    "quant_bits": bits,
                    "segmenter": cfg.segmenter.provider,
                    **breakdown,
                },
            }
        )
    )


def _apply_platform_env():
    """sitecustomize pre-registers the tunneled TPU backend, so the
    JAX_PLATFORMS env var alone cannot switch platforms — route it through
    jax.config (tests/conftest.py does the same)."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass


def _watchdog_main():
    """Bound the whole run: if the tunnel/device stalls (observed failure
    mode: a killed transfer wedges the remote session and every dispatch
    hangs), still emit ONE JSON line so the driver records something."""
    import signal
    import sys

    budget = int(os.environ.get("DYNAM3D_BENCH_BUDGET_S", "2700"))

    def on_alarm(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "p50_step_latency_ms",
                    "value": -1.0,
                    "unit": "ms",
                    "vs_baseline": None,
                    "extra": {"error": f"device stalled; aborted after {budget}s"},
                }
            ),
            flush=True,
        )
        sys.exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(budget)
    _apply_platform_env()
    main()
    signal.alarm(0)


if __name__ == "__main__":
    _watchdog_main()
