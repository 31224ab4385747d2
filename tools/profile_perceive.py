"""Stage-level timing of the perceive path on the real chip.

Times each stage of ``policy.perceive`` as a separately-jitted program at
full dims (CLIP-L towers, FastSAM-x, full-capacity tables) so the ~80 ms
perceive p50 can be attributed: tunnel RTT vs CLIP vs segmentation vs the
3D-memory update scan vs environment-token extraction (VERDICT r1 weak 4).

Usage: python tools/profile_perceive.py  (needs the TPU; ~5 min warm cache)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dynam3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynam3d_tpu.config import Dynam3DConfig, FieldsConfig, LLaVAConfig, Phi3Config
    from dynam3d_tpu.models import policy as policy_mod
    from dynam3d_tpu.models.encoders import clip as clip_mod
    from dynam3d_tpu.models.encoders import yolov8_seg
    from dynam3d_tpu.models.vlm import llava as llava_mod

    def sync(y):
        leaf = jax.tree_util.tree_leaves(y)[0]
        return np.asarray(leaf.ravel()[0:1])

    cfg = Dynam3DConfig(
        fields=FieldsConfig(
            patch_capacity=32768, instance_capacity=2048, zone_capacity=1024,
            max_segments=64, max_members=512, max_zone_members=128,
        ),
        llava=LLaVAConfig(phi3=Phi3Config(num_layers=2)),  # LLM unused here
    )
    f = cfg.fields
    params = policy_mod.init_policy_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, V = 1, 1
    rgb = jnp.asarray(rng.integers(0, 255, (B, V, 336, 336, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.uniform(0.05, 0.95, (B, V, 256, 256)).astype(np.float32))
    pos = jnp.asarray([[1.0, 1.25, 2.0]], jnp.float32)
    hd = jnp.zeros((B,), jnp.float32)
    state = policy_mod.batched_init_state(cfg, B)
    H, W = f.input_height, f.input_width

    # --- stage programs ---------------------------------------------------
    def clip_grid(p, rgb):
        pixels = clip_mod.preprocess_rgb(
            rgb.reshape(B * V, 336, 336, 3), cfg.clip.image_size
        )
        _, grid = clip_mod.encode_image(p["clip"], cfg.clip, pixels)
        return grid

    def tower(p, rgb):
        pixels = clip_mod.preprocess_rgb(
            rgb.reshape(B * V, 336, 336, 3), cfg.clip.image_size
        )
        return llava_mod.image_features(
            p["llava"], cfg.llava, cfg.clip, pixels.astype(jnp.float32)
        )

    def seg(p, rgb):
        return yolov8_seg.segment_views(
            p["yolo"], cfg.segmenter, rgb.reshape(B * V, 336, 336, 3),
            (H, W), f.max_segments,
        )

    def full(p, st, rgb, depth, pos, hd):
        # return the WHOLE struct: selecting one field inside jit lets XLA
        # dead-code-eliminate most of the program (the round-2/3
        # "perceive net ~11 ms" figure was exactly that artifact — the
        # bench's phase breakdown, which syncs on the full output, read
        # ~50 ms net for the same program)
        return policy_mod.perceive(p, cfg, st, rgb, depth, pos, hd)

    def no_seg_update(p, st, rgb, depth, pos, hd):
        return policy_mod.perceive(
            p, cfg, st, rgb, depth, pos, hd, delete_old=False
        )

    # --- isolated update + env-token stages (full values) ---
    from dynam3d_tpu.models.memory3d.query import environment_features
    from dynam3d_tpu.models.memory3d.update import (
        delete_from_frustum, update_views,
    )
    from dynam3d_tpu.geom.projection import habitat_to_world
    from dynam3d_tpu.models.encoders.depth_resnet import preprocess_depth
    from dynam3d_tpu.models.policy import nearest_resize_hw

    HW = H * W
    grid_in = jnp.asarray(
        rng.normal(size=(B, V, HW, f.fts_dim)), jnp.float32
    )
    segm_in = jnp.asarray(
        rng.integers(0, f.max_segments, (B, V, HW)), jnp.int32
    )

    def upd(p, st, depth, pos, hd):
        d24 = nearest_resize_hw(depth, H, W)
        d24 = preprocess_depth(
            d24.reshape(B * V, H, W)[..., None], (0.0, 10.0)
        )[..., 0].reshape(B, V, HW)
        dfull = preprocess_depth(
            depth.reshape(B * V, *depth.shape[2:])[..., None], (0.0, 10.0)
        )[..., 0].reshape(B, V, *depth.shape[2:])
        pw = habitat_to_world(pos)
        hv = hd[:, None] + jnp.arange(V, dtype=jnp.float32)[None] * (
            -jnp.pi / 6.0
        )

        def per_el(st, df, d24_b, g, s, pwb, hvb):
            def del_view(s2, xs):
                dmap, h = xs
                return delete_from_frustum(s2, f, dmap, pwb, h), None
            st, _ = jax.lax.scan(
                del_view, st, (df, jnp.broadcast_to(hvb[0], (V,)))
            )
            st, _ = update_views(p["fields"], st, f, d24_b, g, s, pwb, hvb)
            return st
        return jax.vmap(per_el)(st, dfull, d24, grid_in, segm_in, pw, hv)

    def env(st, pos, hd):
        pw = habitat_to_world(pos)
        return jax.vmap(
            lambda s, p2, h2: environment_features(s, p2, h2, 5.0, 100.0)
        )(st, pw, hd)

    progs = {
        "clip_grid(x1 tower)": (jax.jit(clip_grid), (params, rgb)),
        "llava_tower+proj": (jax.jit(tower), (params, rgb)),
        "fastsam_x_576": (jax.jit(seg), (params, rgb)),
        "update+frustum_del": (
            jax.jit(upd), (params, state, depth, pos, hd)
        ),
        "env_features": (jax.jit(env), (state, pos, hd)),
        "perceive_full": (jax.jit(full), (params, state, rgb, depth, pos, hd)),
        "perceive_no_frustum_del": (
            jax.jit(no_seg_update), (params, state, rgb, depth, pos, hd)
        ),
    }
    triv = jax.jit(lambda x: x + 1.0)
    sync(triv(hd))
    t0 = time.time(); sync(triv(hd)); rtt = (time.time() - t0) * 1e3

    print(f"rtt_ms={rtt:.1f}")
    for name, (fn, args) in progs.items():
        t0 = time.time()
        sync(fn(*args))
        compile_s = time.time() - t0
        ts = []
        for _ in range(6):
            t0 = time.time()
            sync(fn(*args))
            ts.append(time.time() - t0)
        p50 = float(np.percentile(ts, 50) * 1e3)
        print(f"{name}: p50={p50:.1f} ms (net {p50 - rtt:.1f}), compile={compile_s:.0f}s")


if __name__ == "__main__":
    main()
