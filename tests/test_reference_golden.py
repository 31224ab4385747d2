"""Golden parity against REAL oracles — the actual HF modules the reference
loads (Phi3ForCausalLM / LlavaForConditionalGeneration, transformers 4.57) and
the actual reference code at /root/reference loaded by file path — retiring
tests/reference_emulator.py as the sole update-semantics oracle.

All comparisons run in float32 on CPU.
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

REF = "/root/reference"


# ===========================================================================
# Part A — HF Phi-3: logits + greedy-token parity through the converter
# ===========================================================================
def _tiny_hf_phi3():
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM

    hf_cfg = HFPhi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        pad_token_id=0, eos_token_id=2, bos_token_id=1, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Phi3ForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def _my_phi3_from(hf_cfg, model):
    from dynam3d_tpu.config import Phi3Config
    from dynam3d_tpu.runtime.checkpoint import phi3_params_from_torch

    cfg = Phi3Config(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=hf_cfg.num_key_value_heads,
        head_dim=hf_cfg.hidden_size // hf_cfg.num_attention_heads,
        rope_theta=hf_cfg.rope_theta,
        rms_eps=hf_cfg.rms_norm_eps,
        pad_token_id=0, end_token_id=2,
    )
    params = phi3_params_from_torch(model.state_dict(), cfg.num_layers,
                                    dtype=jnp.float32)
    return cfg, params


def test_phi3_logits_match_hf():
    """A RoPE/ordering/fusion convention bug in phi3.py fails here against
    the real transformers implementation (VERDICT r1 item 3a)."""
    from dynam3d_tpu.models.vlm import phi3 as my_phi3

    hf_cfg, model = _tiny_hf_phi3()
    cfg, params = _my_phi3_from(hf_cfg, model)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 128, (2, 11)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    B, T = ids.shape
    emb = my_phi3.embed(params, jnp.asarray(ids))
    cache = my_phi3.init_cache(cfg, B, T, dtype=jnp.float32)
    valid = jnp.ones((B, T), bool)
    positions = jnp.tile(jnp.arange(T)[None], (B, 1))
    mask = my_phi3.prefill_mask(valid, T)
    logits, _ = my_phi3.forward(params, cfg, emb, positions, cache, 0, mask)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-4, atol=2e-4)


def test_phi3_greedy_tokens_match_hf():
    from dynam3d_tpu.models.vlm import phi3 as my_phi3

    hf_cfg, model = _tiny_hf_phi3()
    cfg, params = _my_phi3_from(hf_cfg, model)

    rng = np.random.default_rng(1)
    ids = rng.integers(3, 128, (1, 7)).astype(np.int64)
    n_new = 8
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(ids), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        ).numpy()[:, ids.shape[1]:]

    emb = my_phi3.embed(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones(ids.shape, bool)
    mine = np.asarray(
        my_phi3.greedy_decode(params, cfg, emb, valid, n_new, stop_token=-1)
    )
    np.testing.assert_array_equal(mine[0], hf_out[0])


# ===========================================================================
# Part B — HF LLaVA: processor <image> expansion + splice + tower + LM
# ===========================================================================
def _tiny_tokenizer():
    """A from-scratch fast tokenizer with an <image> token (no assets)."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = ["<unk>", "<pad>", "<s>", "</s>", "<image>", "go", "to", "the",
             "kitchen", "turn", "left", "move", "steps", ".", "next",
             "action", ":"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>",
        bos_token="<s>", eos_token="</s>",
    )
    fast.add_tokens(["<image>"], special_tokens=True)
    return fast, vocab["<image>"]


def _tiny_hf_llava(image_token_index):
    from transformers import CLIPVisionConfig, LlavaConfig
    from transformers import LlavaForConditionalGeneration
    from transformers import Phi3Config as HFPhi3Config

    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=56, patch_size=14,
        projection_dim=32,
    )
    text = HFPhi3Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        pad_token_id=1, eos_token_id=3, bos_token_id=2,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text,
        image_token_index=image_token_index,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(1)
    model = LlavaForConditionalGeneration(cfg).eval().float()
    return cfg, model


def test_llava_processor_splice_and_logits_match_hf():
    """End-to-end LLaVA parity: the real LlavaProcessor expands <image> into
    per-patch tokens, the real model scatters vision features over them; our
    splice_embeds + hidden-layer CLIP tower + projector + Phi-3 must produce
    the same logits (VERDICT r1 item 3a; Policy_Dynam3D_VLN.py:371-410)."""
    from transformers import CLIPImageProcessor, LlavaProcessor

    from dynam3d_tpu.config import CLIPConfig, LLaVAConfig, Phi3Config
    from dynam3d_tpu.models.vlm import llava as my_llava
    from dynam3d_tpu.models.vlm import phi3 as my_phi3
    from dynam3d_tpu.runtime.checkpoint import (
        clip_vision_from_hf,
        llava_projector_from_torch,
        phi3_params_from_torch,
    )

    tok, image_token = _tiny_tokenizer()
    hf_cfg, model = _tiny_hf_llava(image_token)
    sd = model.state_dict()

    image_processor = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 56}, do_center_crop=True,
        crop_size={"height": 56, "width": 56},
    )
    processor = LlavaProcessor(
        image_processor=image_processor, tokenizer=tok,
        patch_size=14, vision_feature_select_strategy="default",
        image_token="<image>", num_additional_image_tokens=1,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    text = "<image> go to the kitchen next action :"
    inputs = processor(text=text, images=img, return_tensors="pt")
    ids = inputs["input_ids"].numpy()

    # the processor expanded <image> into one token per vision patch
    n_img = int((ids == image_token).sum())
    assert n_img == (56 // 14) ** 2, ids
    # ... as one contiguous run
    span = np.where(ids[0] == image_token)[0]
    assert (np.diff(span) == 1).all()
    splice_start = int(span[0])

    with torch.no_grad():
        hf_logits = model(**inputs).logits.numpy()

    # ---- ours, from the converted weights and the SAME pixel_values ----
    t = hf_cfg.text_config
    my_phi3_cfg = Phi3Config(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size, num_layers=t.num_hidden_layers,
        num_heads=t.num_attention_heads, num_kv_heads=t.num_key_value_heads,
        head_dim=t.hidden_size // t.num_attention_heads,
        rope_theta=t.rope_theta, rms_eps=t.rms_norm_eps,
        pad_token_id=1, end_token_id=3,
    )
    v = hf_cfg.vision_config
    my_clip_cfg = CLIPConfig(
        image_size=56, patch_size=14, vision_width=v.hidden_size,
        vision_layers=v.num_hidden_layers, vision_heads=v.num_attention_heads,
        embed_dim=v.projection_dim, text_context=8, text_width=16,
        text_layers=1, text_heads=2, vocab_size=16,
    )
    my_llava_cfg = LLaVAConfig(phi3=my_phi3_cfg, vision_feature_layer=-2)

    params = {
        "clip": {"visual": clip_vision_from_hf(sd, v.num_hidden_layers)},
        "projector": llava_projector_from_torch(
            {k.replace("model.multi_modal_projector", "multi_modal_projector"): val
             for k, val in sd.items()}
        ),
        "phi3": phi3_params_from_torch(sd, t.num_hidden_layers, dtype=jnp.float32),
    }

    pixels = jnp.asarray(
        inputs["pixel_values"].numpy().transpose(0, 2, 3, 1)
    )  # [1,56,56,3] — HF-normalized, bypassing our preprocess on purpose
    mm = my_llava.image_features(params, my_llava_cfg, my_clip_cfg, pixels)
    emb = my_llava.splice_embeds(
        params, my_llava_cfg, jnp.asarray(ids), mm, splice_start
    )

    B, T = ids.shape
    cache = my_phi3.init_cache(my_phi3_cfg, B, T, dtype=jnp.float32)
    valid = jnp.ones((B, T), bool)
    positions = jnp.tile(jnp.arange(T)[None], (B, 1))
    mask = my_phi3.prefill_mask(valid, T)
    logits, _ = my_phi3.forward(
        params["phi3"], my_phi3_cfg, emb.astype(jnp.float32), positions,
        cache, 0, mask,
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=1e-3, atol=1e-3
    )


# ===========================================================================
# Part C — the ACTUAL reference Feature_Fields (VLN variant) by file path
# ===========================================================================
class _NumpyKDTree:
    """torch_kdtree.build_kd_tree stand-in: brute-force SQUARED distances,
    torch outputs, sorted ascending (the cupy_kdtree contract the reference
    relies on — 'distances are squared', feature_fields.py:606)."""

    def __init__(self, points):
        self.pts = points.detach().cpu().numpy().astype(np.float64)

    def query(self, q, nr_nns_searches=1):
        qn = q.detach().cpu().numpy().astype(np.float64)
        d2 = ((qn[:, None, :] - self.pts[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, :nr_nns_searches]
        dd = np.take_along_axis(d2, idx, axis=1)
        return (
            torch.tensor(dd, dtype=torch.float32),
            torch.tensor(idx, dtype=torch.int64),
        )


def _load_reference_feature_fields(monkeypatch, tiny_args):
    """Import /root/reference/.../feature_fields.py (VLN) with CUDA-free
    stubs for torch_kdtree / open3d / configargparse / FastSAM."""
    import argparse

    kd = types.ModuleType("torch_kdtree")
    kd.build_kd_tree = lambda pts: _NumpyKDTree(pts)
    monkeypatch.setitem(sys.modules, "torch_kdtree", kd)

    monkeypatch.setitem(sys.modules, "open3d", types.ModuleType("open3d"))

    cap = types.ModuleType("configargparse")

    class _Parser(argparse.ArgumentParser):
        # the reference declares --fts_dim as type=float (":37"); torch 2.13
        # rejects float layer sizes, so coerce the integral value — the
        # reference environment's older torch accepted 768.0 silently
        def parse_known_args(self, *a, **k):
            args, unknown = super().parse_known_args(*a, **k)
            if hasattr(args, "fts_dim"):
                args.fts_dim = int(args.fts_dim)
            return args, unknown

    cap.ArgumentParser = _Parser
    monkeypatch.setitem(sys.modules, "configargparse", cap)

    fastsam = types.ModuleType("vlnce_baselines.models.fastsam")
    fastsam.FastSAM = lambda *a, **k: None
    fastsam.FastSAMPrompt = lambda *a, **k: None
    pkg = types.ModuleType("vlnce_baselines")
    models_pkg = types.ModuleType("vlnce_baselines.models")
    monkeypatch.setitem(sys.modules, "vlnce_baselines", pkg)
    monkeypatch.setitem(sys.modules, "vlnce_baselines.models", models_pkg)
    monkeypatch.setitem(sys.modules, "vlnce_baselines.models.fastsam", fastsam)

    # module-import-time arg parse reads sys.argv (feature_fields.py:160-162)
    monkeypatch.setattr(sys, "argv", ["golden"] + tiny_args)

    spec = importlib.util.spec_from_file_location(
        "ref_feature_fields",
        f"{REF}/Dynam3D_VLN/vlnce_baselines/models/feature_fields.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_update_matches_actual_reference_code(monkeypatch):
    """3 seeded habitat-mode update steps through the REAL reference
    Feature_Fields (weights shared via field_params_from_torch) must produce
    the same instance/zone tables as our batched update (VERDICT r1 item 3b;
    feature_fields.py:493-816)."""
    from dynam3d_tpu.config import FieldsConfig
    from dynam3d_tpu.models.memory3d import init_state, update_view
    from dynam3d_tpu.models.memory3d.state import cell_center
    from dynam3d_tpu.runtime.checkpoint import field_params_from_torch

    H = W = 4
    HW = H * W
    D = 64
    mod = _load_reference_feature_fields(
        monkeypatch,
        ["--fts_dim", str(D), "--input_height", str(H), "--input_width", str(W)],
    )
    torch.manual_seed(3)
    ff = mod.Feature_Fields(batch_size=1, device="cpu").eval()

    # the merge branch polls CUDA memory unconditionally (":678-686") — fake
    # a large-memory device so the reference takes its normal grad path
    monkeypatch.setattr(
        torch.cuda, "get_device_properties",
        lambda dev: types.SimpleNamespace(total_memory=32 * 1024**3),
    )
    monkeypatch.setattr(torch.cuda, "memory_allocated", lambda dev: 0)

    cfg = FieldsConfig(
        input_height=H, input_width=W, fts_dim=D,
        patch_capacity=256, instance_capacity=64, zone_capacity=32,
        max_segments=8, max_members=64, max_zone_members=16,
        encoder_dtype="f32",   # bit-close comparison vs the fp32 reference
    )
    params = field_params_from_torch(ff.state_dict())

    rng = np.random.default_rng(42)
    state = init_state(cfg)

    class _LegacyEqArray(np.ndarray):
        # the reference tests table emptiness with ``array == []``
        # (feature_fields.py:557,568) — older numpy returned False there,
        # numpy 2.x raises on the broadcast; restore the legacy semantics
        def __eq__(self, other):
            if isinstance(other, list) and not other:
                return False
            return np.ndarray.__eq__(self, other)

    def _rewrap():
        for attr in ("global_patch_position", "global_patch_fts",
                     "global_patch_scales", "global_patch_directions"):
            cur = getattr(ff, attr)[0]
            if isinstance(cur, np.ndarray):
                getattr(ff, attr)[0] = cur.view(_LegacyEqArray)

    for t in range(3):
        depth = rng.uniform(1.0, 6.0, (1, HW)).astype(np.float32)
        grid = rng.normal(size=(HW, D)).astype(np.float32)
        segm = np.repeat(rng.permutation(4), 4).astype(np.int32)
        pos_hab = np.float32([0.3 * t, 1.25, 2.0 - 0.2 * t])
        heading = np.float32(0.2 * t)

        seg_t = torch.tensor(segm.reshape(1, 1, H, W), dtype=torch.int64)
        monkeypatch.setattr(ff, "get_patch_segm", lambda imgs, **kw: seg_t)
        _rewrap()
        with torch.no_grad():
            ff.update_feature_fields(
                batch_depth=[depth], batch_grid_ft=[grid[None]],
                batch_image=np.zeros((1, 1, 8, 8, 3), np.uint8),
                batch_position=[pos_hab], batch_heading=[heading],
                num_of_views=1,
            )

        pos_world = jnp.asarray([pos_hab[0], -pos_hab[2], pos_hab[1]])
        # mirror the reference's fp16 quantization of grid features (":499")
        grid16 = grid.astype(np.float16).astype(np.float32)
        state, _ = update_view(
            params, state, cfg, jnp.asarray(depth[0]), jnp.asarray(grid16),
            jnp.asarray(segm), pos_world, jnp.asarray(heading),
        )

    # ---- instances ----
    ref_fts = ff.global_instance_fts[0].detach().numpy()
    ref_pos = ff.global_instance_position[0].detach().numpy()
    n_ref = ref_fts.shape[0]
    inst_valid = np.asarray(state.inst_valid)
    assert int(inst_valid.sum()) == n_ref
    assert inst_valid[:n_ref].all()
    np.testing.assert_allclose(
        np.asarray(state.inst_pos)[:n_ref], ref_pos, rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(state.inst_fts)[:n_ref], ref_fts, rtol=3e-2, atol=3e-2
    )

    # ---- patch ownership ----
    owners = np.asarray(state.patch_owner)
    for pid, iid in ff.global_patch_to_instance_dict[0].items():
        assert owners[pid] == iid, (pid, owners[pid], iid)

    # ---- zones ----
    # INTENTIONAL DIVERGENCE (documented in memory3d/update.py): the
    # reference never removes a zone row once its last member instance moves
    # away — the stale row (with features frozen at the last refresh) stays
    # addressable by get_environment_features.  This build invalidates
    # emptied zones.  Parity therefore holds on the LIVE set: every zone the
    # reference refreshed with members must exist here with matching
    # features, and this build must hold no zone key the reference lacks.
    ref_zfts = ff.global_zone_fts[0].detach().numpy()
    zvalid = np.asarray(state.zone_valid)
    zkeys = np.asarray(state.zone_key)
    zfts = np.asarray(state.zone_fts)
    assert int(zvalid.sum()) <= ref_zfts.shape[0]

    ref_keys = {k: z for k, z in ff.global_zone_key_to_id[0].items()}
    live_checked = 0
    for key, zid in ref_keys.items():
        members = ff.global_zone_to_instance_dict[0][zid]
        if len(members) == 0:
            continue  # stale row the reference keeps; this build invalidates
        mine = np.where(
            zvalid & (np.abs(zkeys - np.asarray(key)).sum(-1) < 1e-4)
        )[0]
        # two-sided: every LIVE reference zone must exist in the build
        assert len(mine), f"live reference zone {key} missing from the build"
        np.testing.assert_allclose(
            zfts[mine[0]], ref_zfts[zid], rtol=3e-2, atol=3e-2,
            err_msg=f"zone {key}",
        )
        live_checked += 1
    assert live_checked >= 4  # the run produces >=5 live shared zones
    # no zone here that the reference never allocated
    for slot in np.where(zvalid)[0]:
        assert tuple(np.round(zkeys[slot], 4)) in ref_keys


def test_delete_reinsert_cycle_matches_actual_reference(monkeypatch):
    """Frustum delete + re-insert through the REAL reference code: tombstone
    masks must match after ``delete_old_features_from_camera_frustum``
    (feature_fields.py:329-396), and after the next update step the reused
    instance ids / patch ownership must agree — pinning the slot-reuse path
    (assign_new_*_ids, ":433-475") against the actual reference, including
    the documented id-row aliasing divergence for patches/zones (state.py)."""
    from dynam3d_tpu.config import FieldsConfig
    from dynam3d_tpu.models.memory3d import (
        delete_from_frustum,
        init_state,
        update_view,
    )
    from dynam3d_tpu.runtime.checkpoint import field_params_from_torch

    H = W = 4
    HW = H * W
    D = 64
    mod = _load_reference_feature_fields(
        monkeypatch,
        ["--fts_dim", str(D), "--input_height", str(H), "--input_width", str(W)],
    )
    torch.manual_seed(3)
    ff = mod.Feature_Fields(batch_size=1, device="cpu").eval()
    monkeypatch.setattr(
        torch.cuda, "get_device_properties",
        lambda dev: types.SimpleNamespace(total_memory=32 * 1024**3),
    )
    monkeypatch.setattr(torch.cuda, "memory_allocated", lambda dev: 0)

    cfg = FieldsConfig(
        input_height=H, input_width=W, fts_dim=D,
        patch_capacity=256, instance_capacity=64, zone_capacity=32,
        max_segments=8, max_members=64, max_zone_members=16,
        encoder_dtype="f32",   # bit-close comparison vs the fp32 reference
    )
    params = field_params_from_torch(ff.state_dict())
    rng = np.random.default_rng(7)
    state = init_state(cfg)

    class _LegacyEqArray(np.ndarray):
        # see test_update_matches_actual_reference_code: restore old-numpy
        # ``array == []`` -> False semantics the reference relies on
        def __eq__(self, other):
            if isinstance(other, list) and not other:
                return False
            return np.ndarray.__eq__(self, other)

    def _rewrap():
        for attr in ("global_patch_position", "global_patch_fts",
                     "global_patch_scales", "global_patch_directions"):
            cur = getattr(ff, attr)[0]
            if isinstance(cur, np.ndarray):
                getattr(ff, attr)[0] = cur.view(_LegacyEqArray)

    def both_update(state, t, depth=None, segm=None):
        if depth is None:
            depth = rng.uniform(1.0, 6.0, (1, HW)).astype(np.float32)
        if segm is None:
            segm = np.repeat(rng.permutation(4), 4).astype(np.int32)
        grid = rng.normal(size=(HW, D)).astype(np.float32)
        pos_hab = np.float32([0.3 * t, 1.25, 2.0 - 0.2 * t])
        heading = np.float32(0.2 * t)
        seg_t = torch.tensor(segm.reshape(1, 1, H, W), dtype=torch.int64)
        monkeypatch.setattr(ff, "get_patch_segm", lambda imgs, **kw: seg_t)
        _rewrap()
        with torch.no_grad():
            ff.update_feature_fields(
                batch_depth=[depth], batch_grid_ft=[grid[None]],
                batch_image=np.zeros((1, 1, 8, 8, 3), np.uint8),
                batch_position=[pos_hab], batch_heading=[heading],
                num_of_views=1,
            )
        pos_world = jnp.asarray([pos_hab[0], -pos_hab[2], pos_hab[1]])
        grid16 = grid.astype(np.float16).astype(np.float32)
        state, _ = update_view(
            params, state, cfg, jnp.asarray(depth[0]), jnp.asarray(grid16),
            jnp.asarray(segm), pos_world, jnp.asarray(heading),
        )
        return state

    # step 0: segment 0's patches all sit at depth 1.5 (inside the delete
    # far plane of 3.0), the rest at 5.5 (outside) — so exactly one
    # instance is fully consumed by the frustum delete below
    d0 = np.full((1, HW), 5.5, np.float32)
    d0[0, :4] = 1.5
    s0 = np.repeat(np.arange(4), 4).astype(np.int32)
    state = both_update(state, 0, depth=d0, segm=s0)
    n_rows = ff.global_patch_position[0].shape[0]
    n_inst_rows = ff.global_instance_position[0].shape[0]
    pre_patch_valid = np.asarray(state.patch_valid).copy()

    # ---- frustum delete at the step-0 camera pose, generous camera depth
    # so the visibility test (ref ":353" camera_depth + 0.1) passes ----
    del_depth = np.full((H, W), 8.0, np.float32)
    pos_hab = np.float32([0.0, 1.25, 2.0])
    heading = np.float32(0.0)
    with torch.no_grad():
        ff.delete_old_features_from_camera_frustum(
            batch_depth=[torch.tensor(del_depth)[None]],
            batch_position=[pos_hab],
            batch_heading=[heading], num_of_views=1,
        )
    pos_world = jnp.asarray([pos_hab[0], -pos_hab[2], pos_hab[1]])
    state = delete_from_frustum(
        state, cfg, jnp.asarray(del_depth), pos_world, jnp.asarray(heading)
    )

    # ---- tombstone parity ----
    ref_dead_patch = (
        np.asarray(ff.global_patch_position[0]) <= -9999.0
    ).all(-1)
    my_dead_patch = pre_patch_valid[:n_rows] & ~np.asarray(
        state.patch_valid
    )[:n_rows]
    assert ref_dead_patch.sum() >= 2, "delete frustum missed the cloud"
    np.testing.assert_array_equal(my_dead_patch, ref_dead_patch)

    ref_dead_inst = (
        ff.global_instance_position[0].numpy() <= -9999.0
    ).all(-1)
    assert ref_dead_inst.sum() >= 1, "no instance died — weak fixture"
    inst_valid = np.asarray(state.inst_valid)
    np.testing.assert_array_equal(~inst_valid[:n_inst_rows], ref_dead_inst)

    # zone key sets agree (two-sided) after the delete
    ref_zone_keys = {
        tuple(np.round(np.asarray(k), 4))
        for k in ff.global_zone_key_to_id[0]
    }
    my_zone_keys = {
        tuple(np.round(np.asarray(state.zone_key)[s], 4))
        for s in np.where(np.asarray(state.zone_valid))[0]
    }
    assert my_zone_keys == ref_zone_keys

    # ---- re-insert: one update step drives the slot-reuse path ----
    state = both_update(state, 1)

    # id allocation parity: the reference's lowest-free-id scan must agree
    # with our first-free-slot allocation — same live instance ids, same
    # patch->instance ownership for every dict entry (reused ids included)
    owners = np.asarray(state.patch_owner)
    assert any(
        pid < n_rows for pid in ff.global_patch_to_instance_dict[0]
    ), "no patch id was reused — fixture too weak to pin the reuse path"
    for pid, iid in ff.global_patch_to_instance_dict[0].items():
        assert owners[pid] == iid, (pid, owners[pid], iid)
    inst_valid = np.asarray(state.inst_valid)
    ref_live = sorted(ff.global_instance_to_patch_dict[0])
    assert sorted(np.where(inst_valid)[0].tolist()) == ref_live

    # VALUE parity is only definable against the reference's evident intent:
    # its merge path re-reads member patches BY ID (":662-663") while reused
    # ids alias tombstoned rows (fresh data was appended, ":556-570"), so
    # after a delete the reference's own merged-instance values are corrupted
    # by -10000 reads.  Witness that the bug is real in the loaded reference:
    ref_pos = ff.global_instance_position[0].numpy()
    assert (np.abs(ref_pos[ref_live]) > 1000).any(), (
        "expected the reference's aliasing corruption; did upstream fix it? "
        "If so, drop the divergence note and compare directly."
    )
    # ... then pin OUR values to the un-aliased recompute: reused id p was
    # assigned (lowest-first) to fresh patch k = index_of(p) with its data
    # appended at row n_rows + k, so the intended member positions are
    # row_of(p) = n_rows + assigned.index(p) if reused else p.
    assigned = [0, 1, 2, 3] + list(range(n_rows, n_rows + 12))
    ref_rows = np.asarray(ff.global_patch_position[0])

    def row_of(p):
        return n_rows + assigned.index(p) if p in assigned else p

    my_pos = np.asarray(state.inst_pos)
    for iid in ref_live:
        members = [row_of(int(p)) for p in ff.global_instance_to_patch_dict[0][iid]]
        want = ref_rows[members].mean(0)
        assert (np.abs(want) < 100).all(), "recompute hit a stale row"
        np.testing.assert_allclose(
            my_pos[iid], want, rtol=1e-3, atol=1e-3,
            err_msg=f"instance {iid} diverges from the un-aliased intent",
        )

    # our zone table stays sane after the cycle: live zones exist and no
    # key is tombstone-contaminated.  (Stronger zone parity is pinned by
    # the keyset check right after the delete and by the no-delete golden
    # test above; post-reinsert the reference's zone keys derive from its
    # corrupted instance reads, so value parity is undefined there.  Keys
    # come from OBSERVED cluster-center cells, not final merged positions,
    # so no instance-cell containment holds in either implementation.)
    zvalid = np.asarray(state.zone_valid)
    zkeys = np.asarray(state.zone_key)
    assert zvalid.any()
    for s in np.where(zvalid)[0]:
        assert (np.abs(zkeys[s]) < 100).all()


# ===========================================================================
# Part D — the reference's VENDORED modified CLIP by file path
# ===========================================================================
def _load_reference_clip():
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model",
        f"{REF}/Dynam3D_VLN/vlnce_baselines/models/encoders/clip/model.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clip_towers_match_reference_vendored_model():
    """The reference's modified VisionTransformer.forward returns BOTH
    projected cls and patch tokens (clip/model.py:219-238) and
    encode_all_text zeroes features after EOT (":356-370") — our towers must
    match the actual vendored module, weights shared via
    clip_params_from_torch."""
    from dynam3d_tpu.config import CLIPConfig
    from dynam3d_tpu.models.encoders import clip as my_clip
    from dynam3d_tpu.runtime.checkpoint import clip_params_from_torch

    mod = _load_reference_clip()
    torch.manual_seed(5)
    # vendored CLIP derives heads as width//64 (clip/model.py), so widths
    # must be >=64 in the tiny config
    ref = mod.CLIP(
        embed_dim=32, image_resolution=56, vision_layers=2, vision_width=64,
        vision_patch_size=14, context_length=12, vocab_size=50,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    ).eval().float()

    cfg = CLIPConfig(
        image_size=56, patch_size=14, vision_width=64, vision_layers=2,
        vision_heads=1, embed_dim=32, text_context=12, text_width=64,
        text_layers=2, text_heads=1, vocab_size=50,
    )
    params = clip_params_from_torch(ref.state_dict(), 2, 2)

    rng = np.random.default_rng(6)
    pixels = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref_cls, ref_patch = ref.encode_image(
            torch.tensor(pixels.transpose(0, 3, 1, 2))
        )
    cls, patch = my_clip.encode_image(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(patch), ref_patch.numpy(), rtol=2e-4, atol=2e-4)

    # encode_all_text: argmax-token EOT, zeroing after it
    toks = np.zeros((2, 12), np.int64)
    toks[0, :5] = [49, 7, 8, 9, 47]   # EOT = argmax position 4
    toks[1, :3] = [49, 11, 47]
    with torch.no_grad():
        ref_all, ref_eot = ref.encode_all_text(torch.tensor(toks))
    mine_all, mine_eot = my_clip.encode_all_text(params, cfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(mine_eot), ref_eot.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mine_all), ref_all.numpy(), rtol=2e-4, atol=2e-4)


# ===========================================================================
# Part D — render path vs the ACTUAL src_3dff reference code
# ===========================================================================
class _TcnnStub(torch.nn.Module):
    """tinycudann.Network stand-in: plain bias-free Linears with LeakyReLU,
    matching tcnn's CutlassMLP structure (n_hidden_layers hidden layers of
    n_neurons + an output layer with the configured output activation)."""

    def __init__(self, n_input_dims, n_output_dims, network_config):
        super().__init__()
        neurons = network_config["n_neurons"]
        nh = network_config["n_hidden_layers"]
        dims = [n_input_dims] + [neurons] * nh + [n_output_dims]
        layers = []
        for i in range(len(dims) - 1):
            layers.append(torch.nn.Linear(dims[i], dims[i + 1], bias=False))
            if i < len(dims) - 2 or network_config["output_activation"] == "LeakyReLU":
                layers.append(torch.nn.LeakyReLU(0.01))
        self.net = torch.nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x.float())

    def flat_params(self):
        """Serialize in tinycudann's flat layout (first-layer input and
        last-layer output padded to multiples of 16, row-major)."""
        def ceil16(n):
            return ((n + 15) // 16) * 16

        linears = [m for m in self.net if isinstance(m, torch.nn.Linear)]
        mats = []
        for li, lin in enumerate(linears):
            w = lin.weight.detach().numpy().astype(np.float32)  # [out, in]
            o, i = w.shape
            o_pad = ceil16(o) if li == len(linears) - 1 else o
            i_pad = ceil16(i) if li == 0 else i
            wp = np.zeros((o_pad, i_pad), np.float32)
            wp[:o, :i] = w
            mats.append(wp.reshape(-1))
        return np.concatenate(mats)


def _load_reference_src3dff(monkeypatch, tiny_args):
    """Import /root/reference/Dynam3D_Pretrain/src_3dff/models/feature_fields.py
    with CUDA-free stubs (torch_kdtree / tinycudann / open3d / FastSAM)."""
    import argparse

    kd = types.ModuleType("torch_kdtree")
    kd.build_kd_tree = lambda pts: _NumpyKDTree(pts)
    monkeypatch.setitem(sys.modules, "torch_kdtree", kd)
    monkeypatch.setitem(sys.modules, "open3d", types.ModuleType("open3d"))

    tcnn = types.ModuleType("tinycudann")
    tcnn.Network = lambda n_input_dims, n_output_dims, network_config: _TcnnStub(
        n_input_dims, n_output_dims, network_config
    )
    monkeypatch.setitem(sys.modules, "tinycudann", tcnn)

    cap = types.ModuleType("configargparse")

    class _Parser(argparse.ArgumentParser):
        def parse_known_args(self, *a, **k):
            args, unknown = super().parse_known_args(*a, **k)
            if hasattr(args, "fts_dim"):
                args.fts_dim = int(args.fts_dim)
            return args, unknown

    cap.ArgumentParser = _Parser
    monkeypatch.setitem(sys.modules, "configargparse", cap)

    fastsam = types.ModuleType("src_3dff.models.fastsam")
    fastsam.FastSAM = lambda *a, **k: None
    fastsam.FastSAMPrompt = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "src_3dff", types.ModuleType("src_3dff"))
    monkeypatch.setitem(
        sys.modules, "src_3dff.models", types.ModuleType("src_3dff.models")
    )
    monkeypatch.setitem(sys.modules, "src_3dff.models.fastsam", fastsam)

    monkeypatch.setattr(sys, "argv", ["golden"] + tiny_args)
    spec = importlib.util.spec_from_file_location(
        "ref_feature_fields_3dff",
        f"{REF}/Dynam3D_Pretrain/src_3dff/models/feature_fields.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_render_matches_actual_reference_code(monkeypatch):
    """Novel-view rendering through the REAL reference render_view_3d_patch
    (habitat mode, src_3dff feature_fields.py:494-625) vs our render_view,
    with the renderer weights shared via render_params_from_torch — covers
    the ray grid, importance sampling, neighbor conditioning channel order,
    the fused MLP structure, and raw2feature compositing in one shot."""
    from dynam3d_tpu.config import FieldsConfig
    from dynam3d_tpu.models.memory3d import init_state
    from dynam3d_tpu.models.render.nerf import render_view
    from dynam3d_tpu.runtime.checkpoint import render_params_from_torch

    D = 64
    NS, NI, K = 33, 4, 4
    HV = WV = 8
    mod = _load_reference_src3dff(
        monkeypatch,
        ["--fts_dim", str(D), "--mlp_net_width", str(D),
         "--view_height", str(HV), "--view_width", str(WV),
         "--N_samples", str(NS), "--N_importance", str(NI)],
    )
    torch.manual_seed(7)
    ff = mod.Feature_Fields(batch_size=1, device="cpu").eval()
    # patch_to_nerf_encode feeds fp16 activations into this module (":479-483");
    # the reference trains the renderer in fp16 where that works implicitly —
    # on CPU float32 Linears reject Half inputs, so match the fp16 weights
    ff.aggregate_patch_to_nerf_encoder.half()
    ff.reset(batch_size=1, mode="habitat")
    ff.sampled_rays = ff.get_rays_habitat()
    ff.gt_pcd_tree = None

    # shared 3D memory: N random patches in front of the camera
    rng = np.random.default_rng(11)
    N = 300
    pos = np.stack([
        rng.uniform(-4, 4, N), rng.uniform(0.5, 8, N), rng.uniform(-1, 2, N),
    ], axis=1).astype(np.float32)
    fts = rng.normal(size=(N, D)).astype(np.float32)
    dirs = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    scales = rng.uniform(0.05, 0.4, N).astype(np.float32)

    ff.global_patch_fts[0] = fts.astype(np.float16)
    ff.global_patch_directions[0] = dirs
    ff.global_patch_scales[0] = scales
    ff.global_patch_position[0] = torch.tensor(pos)
    ff.patch_tree[0] = _NumpyKDTree(torch.tensor(pos))

    heading = 0.35
    pos_hab = np.float32([0.0, 1.25, 0.0])   # habitat (x, y-up, z)
    with torch.no_grad():
        ref_fts, ref_pos, _ = ff.render_view_3d_patch(
            batch_position=[pos_hab.copy()], batch_heading=[heading],
        )
    ref_fts = ref_fts[0].float().numpy()     # [HV, WV, D]
    ref_pos = ref_pos[0].float().numpy()

    # our side: same weights through the converter (incl. the tcnn flat
    # params layout), same patches in the world frame
    sd = {k: v for k, v in ff.state_dict().items()}
    sd["nerf_encoder.params"] = ff.nerf_encoder.flat_params()
    sd["nerf_decoder.params"] = ff.nerf_decoder.flat_params()
    cfg = FieldsConfig(
        fts_dim=D, mlp_net_width=D, mlp_net_layers=4,
        view_height=HV, view_width=WV, n_samples=NS, n_importance=NI,
        search_num=K, patch_capacity=512, instance_capacity=32,
        zone_capacity=16, max_segments=8, max_members=32, max_zone_members=8,
    )
    params = render_params_from_torch(sd, cfg)

    state = init_state(cfg)
    state = state._replace(
        patch_pos=state.patch_pos.at[:N].set(jnp.asarray(pos)),
        patch_fts=state.patch_fts.at[:N].set(jnp.asarray(fts, state.patch_fts.dtype)),
        patch_dir=state.patch_dir.at[:N].set(jnp.asarray(dirs)),
        patch_scale=state.patch_scale.at[:N].set(jnp.asarray(scales)),
        patch_valid=state.patch_valid.at[:N].set(True),
    )
    world = jnp.asarray([pos_hab[0], -pos_hab[2], pos_hab[1]])
    out = render_view(params, cfg, state, world, jnp.asarray(heading))
    my_fts = np.asarray(out.features, np.float32)
    my_pos = np.asarray(out.positions, np.float32)

    # positions: the chosen important samples must coincide (modulo rays
    # with tie-broken densities — empty rays where every sample clamps to
    # the search radius)
    pos_match = np.all(np.abs(my_pos - ref_pos) < 1e-3, axis=-1)
    assert pos_match.mean() > 0.9, f"only {pos_match.mean():.2%} rays match"

    # features: cosine similarity per ray on the rays whose sampling agreed
    ref_v = ref_fts[pos_match]
    my_v = my_fts[pos_match]
    denom = (
        np.linalg.norm(ref_v, axis=-1) * np.linalg.norm(my_v, axis=-1) + 1e-9
    )
    cos = (ref_v * my_v).sum(-1) / denom
    live = np.linalg.norm(ref_v, axis=-1) > 1e-3
    assert live.any()
    assert cos[live].min() > 0.995, float(cos[live].min())
