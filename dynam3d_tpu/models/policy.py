"""Dynam3D VLN policy: RGB-D -> layered 3D tokens -> LLaVA action text.

TPU redesign of ``Dynam3D_VLN`` (vlnce_baselines/models/Policy_Dynam3D_VLN.py):
the whole per-step device path — CLIP patch grid, segmentation, frustum
forgetting, 3D memory update, environment-token extraction, projectors, and
the multimodal prompt splice — compiles into two XLA programs per step
(`perceive` and `generate`/`train_loss`), with the host contributing only
tokenization and action-text parsing.

Sequence layout (static shapes; reference builds the same prompt dynamically
at Policy_Dynam3D_VLN.py:371,407,436):

    [BOS <|user|> \\n] [576*V patch tokens][<=I_env instance][<=Z_env zone]
    [\\nInstruction: ...][History ...][<|end|>\\n<|assistant|>\\nNext action:\\n]

Instance/zone slots beyond the live count are attention-masked out; RoPE
positions are computed from the validity cumsum, so the masked slots are
positionally invisible — numerically identical to the reference's shorter
dynamic prompt.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import Dynam3DConfig
from dynam3d_tpu.geom.projection import patch_3d_info, habitat_to_world
from dynam3d_tpu.models.encoders import clip as clip_mod
from dynam3d_tpu.models.encoders.depth_resnet import preprocess_depth
from dynam3d_tpu.models.memory3d import (
    FieldState,
    delete_from_frustum,
    environment_features,
    init_field_params,
    init_state,
    update_views,
)
from dynam3d_tpu.models.segmenter import depth_plane_segments
from dynam3d_tpu.models.vlm import llava as llava_mod
from dynam3d_tpu.ops.segment import first_free_slots
from dynam3d_tpu.ops.transformer import init_mlp2, mlp2

Params = Dict[str, Any]

# environment-token slot capacities in the prompt
I_ENV = 64
Z_ENV = 64


def _first_k_true_idx(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    idx = first_free_slots(~mask, k)
    fill = jnp.arange(k) < jnp.sum(mask.astype(jnp.int32))
    return idx, fill


def nearest_resize_hw(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2 INTER_NEAREST-compatible resize over the trailing two dims."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    ri = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    return x[..., ri, :][..., ci]


class PerceiveOut(NamedTuple):
    state: FieldState
    mm_tokens: jnp.ndarray    # [B, N_mm, D_llm]
    mm_valid: jnp.ndarray     # [B, N_mm] bool
    n_inst: jnp.ndarray       # [B] live instance tokens (diagnostics)
    n_zone: jnp.ndarray       # [B]


def init_policy_params(key: jax.Array, cfg: Dynam3DConfig, llm_dtype=jnp.bfloat16) -> Params:
    """All learned modules of the VLN policy (frozen ones included).

    Mirrors Policy_Dynam3D_VLN.__init__ (":79-157"): frozen Feature_Fields +
    CLIP + llava tower; trained projectors + Phi-3.
    """
    k1, k2, k3, k4, k5, k6, k7, k8, k9 = jax.random.split(key, 9)
    d = cfg.fields.fts_dim
    dl = cfg.llava.phi3.hidden_size
    params = {
        "fields": init_field_params(k1, cfg.fields),
        "clip": clip_mod.init_clip_params(k2, cfg.clip),
        "llava": llava_mod.init_llava_params(k3, cfg.llava, cfg.clip, dtype=llm_dtype),
        "patch_pos_emb": init_mlp2(k4, 6, dl, dl),
        "inst_pos_emb": init_mlp2(k5, 3, d, d),
        "zone_pos_emb": init_mlp2(k6, 3, d, d),
        "inst_proj": init_mlp2(k7, 2 * d, dl, dl),
        "zone_proj": init_mlp2(k8, 2 * d, dl, dl),
    }
    if cfg.segmenter.provider == "yolov8":
        # the frozen FastSAM runtime (feature_fields.py:257; weights come
        # from checkpoint.fastsam_params_from_torch in production)
        from dynam3d_tpu.models.encoders import yolov8_seg

        params["yolo"] = yolov8_seg.init_yolov8_params(
            k9, width=cfg.segmenter.width_mult,
            depth_n=cfg.segmenter.depth_layers(),
            num_protos=cfg.segmenter.num_protos,
        )
    return params


def perceive(
    params: Params,
    cfg: Dynam3DConfig,
    state: FieldState,            # batched [B, ...]
    rgb: jnp.ndarray,             # [B,V,Hc,Wc,3] uint8
    depth_raw: jnp.ndarray,       # [B,V,Hd,Wd] normalized [0,1] depth
    position_hab: jnp.ndarray,    # [B,3] habitat-frame agent position
    heading: jnp.ndarray,         # [B]
    delete_old: bool = True,
) -> PerceiveOut:
    """One device program: encoders -> memory update -> multimodal tokens.

    Port of Dynam3D_VLN.forward's perception half
    (Policy_Dynam3D_VLN.py:331-394).
    """
    if depth_raw.dtype == jnp.uint16:
        # wire format: depth crosses the host->device link packed uint16
        # (1/65535 quantization of the [0,1] normalized range = 0.15 mm at
        # the 10 m sensor scale, far below sensor noise), halving the
        # dominant tunnel upload; dequantized here on-device
        depth_raw = depth_raw.astype(jnp.float32) * (1.0 / 65535.0)
    f = cfg.fields
    B, V = rgb.shape[0], rgb.shape[1]
    H, W = f.input_height, f.input_width
    HW = H * W
    dmin, dmax = 0.0, 10.0  # R2R depth scale (":174-175")

    # --- depth to 24x24 metric (cv2 nearest + column-max fill, ":336-341") ---
    d24 = nearest_resize_hw(depth_raw, H, W)              # [B,V,H,W]
    d24 = preprocess_depth(
        d24.reshape(B * V, H, W)[..., None], (dmin, dmax)
    )[..., 0].reshape(B, V, HW)
    dfull = preprocess_depth(
        depth_raw.reshape(B * V, *depth_raw.shape[2:])[..., None], (dmin, dmax)
    )[..., 0].reshape(B, V, *depth_raw.shape[2:])

    # --- CLIP patch grid (frozen, ":343-346") ---
    pixels = clip_mod.preprocess_rgb(
        rgb.reshape(B * V, *rgb.shape[2:]), cfg.clip.image_size
    )
    if cfg.clip.compute_dtype == "bf16":
        # both ViT-L passes (grid + llava tower below) run bf16, the
        # reference's own tower precision (fp16 CLIP / bf16 LLaVA)
        pixels = pixels.astype(jnp.bfloat16)
    _, grid = clip_mod.encode_image(params["clip"], cfg.clip, pixels)
    grid = jax.lax.stop_gradient(grid).reshape(B, V, HW, f.fts_dim)
    # the reference quantizes the grid features to fp16 before they enter
    # the memory tables (feature_fields.py:499) — reproduce the rounding so
    # table contents stay bit-close (the closed-loop golden test holds
    # greedy decode in token lockstep, which a 3e-4 feature drift flips)
    grid = grid.astype(jnp.float16).astype(grid.dtype)

    # --- segmentation: learned FastSAM port by default (the reference
    # segments every view, feature_fields.py:750-780), geometric fallback ---
    if cfg.segmenter.provider == "yolov8" and "yolo" in params:
        from dynam3d_tpu.models.encoders import yolov8_seg

        segm = yolov8_seg.segment_views(
            params["yolo"], cfg.segmenter,
            rgb.reshape(B * V, *rgb.shape[2:]), (H, W), f.max_segments,
        ).reshape(B, V, HW)
    else:
        segm = jax.vmap(
            lambda dv: depth_plane_segments(dv, H, W, f.max_segments)
        )(d24.reshape(B * V, HW)).reshape(B, V, HW)

    pos_world = habitat_to_world(position_hab)

    # --- frustum forgetting (":349-351"), then the update scan (":353-354") ---
    view_offsets = jnp.arange(V, dtype=jnp.float32) * (-jnp.pi / 6.0)
    headings_v = heading[:, None] + view_offsets[None, :]

    def per_element(st, df, d24_b, grid_b, segm_b, pw, hd_v):
        if delete_old:
            def del_view(s, xs):
                dmap, h = xs
                return delete_from_frustum(s, f, dmap, pw, h), None
            # reference deletes every view with the UN-offset heading
            # (feature_fields.py:347 uses heading_angle, not ix-rotated) —
            # with V==1 (VLN) this is exact; preserved for V>1.
            st, _ = jax.lax.scan(
                del_view, st, (df, jnp.broadcast_to(hd_v[0], (V,)))
            )
        st = jax.lax.stop_gradient(st)
        st, _ = update_views(
            params["fields"], st, f, d24_b, grid_b, segm_b, pw, hd_v
        )
        return st

    state = jax.vmap(per_element)(
        state, dfull, d24, grid, segm, pos_world, headings_v
    )

    # --- environment tokens (":358-362") ---
    def env_tokens(st, pw, hd):
        env = environment_features(
            st, pw, hd, cfg.eval.instance_distance, cfg.eval.zone_distance
        )
        ii, ifill = _first_k_true_idx(env.inst_mask, I_ENV)
        zi, zfill = _first_k_true_idx(env.zone_mask, Z_ENV)
        inst = jnp.concatenate(
            [env.inst_fts[ii], mlp2(params["inst_pos_emb"], env.inst_rel_pos[ii])],
            axis=-1,
        )
        zone = jnp.concatenate(
            [env.zone_fts[zi], mlp2(params["zone_pos_emb"], env.zone_rel_pos[zi])],
            axis=-1,
        )
        inst = mlp2(params["inst_proj"], inst)
        zone = mlp2(params["zone_proj"], zone)
        return inst, ifill, zone, zfill

    inst_tok, inst_fill, zone_tok, zone_fill = jax.vmap(env_tokens)(
        state, pos_world, heading
    )

    # --- llava-tower patch tokens + 3D position embedding (":363-394") ---
    tower_feats = llava_mod.image_features(
        params["llava"], cfg.llava, cfg.clip, pixels
    )  # [B*V, HW, D_llm]
    tower_feats = jax.lax.stop_gradient(tower_feats)
    px, py, pz, pdir, pscale = patch_3d_info(
        d24.reshape(B * V, HW), height=H, width=W,
        hfov_deg=f.input_hfov, vfov_deg=f.input_vfov,
    )
    p3d = jnp.stack([px, py, pz, jnp.sin(pdir), jnp.cos(pdir), pscale], axis=-1)
    patch_tok = tower_feats + mlp2(params["patch_pos_emb"], p3d)
    patch_tok = patch_tok.reshape(B, V * HW, -1)

    # multimodal tokens take the LANGUAGE MODEL's dtype (bf16 in production —
    # the reference loads llava torch_dtype=bfloat16, ":117" — but f32 when
    # the LLM runs f32, e.g. the fp32 golden tests: a hardcoded bf16 round
    # here injected 3e-3 noise against the fp32 reference)
    llm_dtype = params["llava"]["phi3"]["embed_tokens"].dtype
    mm = jnp.concatenate(
        [patch_tok.astype(llm_dtype), inst_tok.astype(llm_dtype),
         zone_tok.astype(llm_dtype)],
        axis=1,
    )
    mm_valid = jnp.concatenate(
        [jnp.ones((B, V * HW), bool), inst_fill, zone_fill], axis=1
    )
    return PerceiveOut(
        state=state,
        mm_tokens=mm,
        mm_valid=mm_valid,
        n_inst=jnp.sum(inst_fill, axis=1),
        n_zone=jnp.sum(zone_fill, axis=1),
    )


def generate_action_ids(
    params: Params,
    cfg: Dynam3DConfig,
    input_ids: jnp.ndarray,       # [B,T] prompt ids (<image> span at splice_start)
    text_valid: jnp.ndarray,      # [B,T]
    mm_tokens: jnp.ndarray,
    mm_valid: jnp.ndarray,
    splice_start: int = 2,
    prev_gen: Optional[jnp.ndarray] = None,   # [B,new_tok] last step's ids
) -> jnp.ndarray:
    """Eval path: splice + greedy decode (Policy_Dynam3D_VLN.py:430-469).

    ``splice_start`` is the first <image> position — 2 for the HF phi-3
    tokenizer (the reference's fixed index, ":393"), 3 for ByteTokenizer.

    ``prev_gen`` primes the speculative-decode draft source with the
    PREVIOUS step's generated token ids: consecutive VLN actions repeat
    heavily ("move 4 steps." streaks, the quantized 15-degree/0.25 m grammar
    of Policy_Dynam3D_VLN.py:472-506), and the raw ids of the last action
    are a stronger n-gram source than its re-tokenized history rendering.
    Greedy-exact regardless — every draft is verified against the model's
    own argmax (phi3.greedy_decode_spec).
    """
    emb = llava_mod.splice_embeds(
        params["llava"], cfg.llava, input_ids, mm_tokens, splice_start
    )
    attn_valid = jax.lax.dynamic_update_slice(text_valid, mm_valid, (0, splice_start))
    # draft source for the (default-on) speculative decode: the prompt's TEXT
    # ids only — the <image> span and pads are -1 sentinels that never match
    lookup_ids = jnp.where(
        text_valid & (input_ids != cfg.llava.phi3.image_token_id),
        input_ids, -1,
    )
    if prev_gen is not None:
        # appended LAST: _ngram_draft prefers the most recent match, so the
        # previous action's continuation wins over older prompt occurrences
        prev = jnp.where(
            prev_gen == cfg.llava.phi3.pad_token_id, -1, prev_gen
        ).astype(lookup_ids.dtype)
        lookup_ids = jnp.concatenate([lookup_ids, prev], axis=1)
    return llava_mod.generate(
        params["llava"], cfg.llava, emb, attn_valid, lookup_ids=lookup_ids
    )


def train_loss(
    params: Params,
    cfg: Dynam3DConfig,
    input_ids: jnp.ndarray,
    text_valid: jnp.ndarray,
    mm_tokens: jnp.ndarray,
    mm_valid: jnp.ndarray,
    label_ids: jnp.ndarray,
    label_mask: jnp.ndarray,
    turn_token_weight: jnp.ndarray,
    splice_start: int = 2,
) -> llava_mod.TrainOutput:
    """Teacher-forced CE on the action span (Policy_Dynam3D_VLN.py:366-427)."""
    emb = llava_mod.splice_embeds(
        params["llava"], cfg.llava, input_ids, mm_tokens, splice_start
    )
    attn_valid = jax.lax.dynamic_update_slice(text_valid, mm_valid, (0, splice_start))
    # PHYSICAL prompt length (label tokens sit right after the prompt ids in
    # the tokenized layout) — attn_valid's count undercounts it by the
    # masked-out static instance/zone slots, which would gather the CE
    # logits from mid-prompt positions (same count-vs-index bug as
    # phi3._last_valid_idx; caught by the closed-loop golden test)
    prompt_len = jnp.sum(text_valid.astype(jnp.int32), axis=1) - jnp.sum(
        label_mask.astype(jnp.int32), axis=1
    )
    return llava_mod.teacher_forced_loss(
        params["llava"], cfg.llava, emb, attn_valid,
        label_ids, label_mask, prompt_len, turn_token_weight,
    )


def full_step(
    params: Params,
    cfg: Dynam3DConfig,
    state: FieldState,
    rgb: jnp.ndarray,
    depth_raw: jnp.ndarray,
    position_hab: jnp.ndarray,
    heading: jnp.ndarray,
    input_ids: jnp.ndarray,
    text_valid: jnp.ndarray,
    splice_start: int = 2,
    prev_gen: Optional[jnp.ndarray] = None,
) -> Tuple[FieldState, jnp.ndarray]:
    """Perceive + generate fused into ONE device program.

    The prompt depends only on the instruction and the PREVIOUS steps'
    history, so the host can tokenize before dispatch; fusing halves the
    per-step dispatch count (each host<->device round trip costs ~25 ms over
    a tunneled chip and ~10 us of launch overhead on a local one, and fusing
    also lets XLA overlap the vision tower with the prefill).

    ``prev_gen`` (last step's generated ids) primes the speculative-decode
    draft source — see :func:`generate_action_ids`.

    Returns (new_state, generated ids [B, max_new_tokens]).
    """
    out = perceive(params, cfg, state, rgb, depth_raw, position_hab, heading)
    gen = generate_action_ids(
        params, cfg, input_ids, text_valid, out.mm_tokens, out.mm_valid,
        splice_start, prev_gen=prev_gen,
    )
    return out.state, gen


def batched_init_state(cfg: Dynam3DConfig, batch: int) -> FieldState:
    one = init_state(cfg.fields)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
    )


def pop_state(state: FieldState, index: int) -> FieldState:
    """Drop one episode from the batch (Feature_Fields.pop, ":210-229")."""
    B = state.patch_pos.shape[0]
    keep = jnp.asarray([i for i in range(B) if i != index], jnp.int32)
    return jax.tree_util.tree_map(lambda x: x[keep], state)
