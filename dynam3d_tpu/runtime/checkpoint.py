"""Checkpointing: orbax save/resume + torch->JAX weight converters.

Covers the reference's checkpoint surface (SURVEY.md §5.4):

  - ``save_checkpoint``/resume with requeue-by-mtime
    (ss_trainer_Dynam3D.py:75-84,201-218);
  - ``convert_ckpt.py`` semantics: strip the ``net(.module).feature_fields.``
    prefix from a pretrain checkpoint to produce the frozen 3D-memory weights
    the VLN policy loads (``dynam3d.pth``);
  - 1:1 weight converters from the torch module layouts into this build's
    parameter pytrees: the Feature_Fields modules, PyTorch
    ``nn.TransformerEncoder`` stacks (fused in_proj split), the ``Linear ->
    LayerNorm -> GELU -> Linear`` MLPs, OpenAI CLIP towers, HF Phi-3/LLaVA,
    and the waypoint BERT.

Converters accept a ``state_dict``-like mapping of numpy arrays (call
``.numpy()`` on torch tensors first, or pass tensors — they are coerced).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu()
        # torch bf16/fp16 tensors refuse .numpy(); real llava-phi-3 ckpts
        # are stored bf16 (Policy_Dynam3D_VLN.py:117 torch_dtype=bfloat16)
        if str(x.dtype) in ("torch.bfloat16", "torch.float16"):
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def strip_prefix(state: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """convert_ckpt.py equivalent: keep keys under ``prefix``, drop the rest."""
    out = {}
    for k, v in state.items():
        k = k.replace("module.", "", 1) if k.startswith("module.") else k
        if k.startswith(prefix):
            out[k[len(prefix):]] = _np(v)
    return out


# --------------------------------------------------------------------------
# primitive converters
# --------------------------------------------------------------------------
def dense_from_torch(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    """torch ``nn.Linear`` [out,in] -> our {"w": [in,out], "b": [out]}."""
    w = _np(sd[_j(prefix, "weight")]).T
    b = _np(sd.get(_j(prefix, "bias"), np.zeros(w.shape[1], np.float32)))
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def ln_from_torch(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(_np(sd[_j(prefix, "weight")])),
        "bias": jnp.asarray(_np(sd[_j(prefix, "bias")])),
    }


def mlp2_from_torch(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """``nn.Sequential(Linear, LayerNorm, GELU, Linear)`` -> ops.mlp2 params."""
    return {
        "fc1": dense_from_torch(sd, _j(prefix, "0")),
        "ln": ln_from_torch(sd, _j(prefix, "1")),
        "fc2": dense_from_torch(sd, _j(prefix, "3")),
    }


def encoder_layer_from_torch(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """``nn.TransformerEncoderLayer`` (post-norm) -> ops.encoder_layer params."""
    qkv_w = _np(sd[_j(prefix, "self_attn.in_proj_weight")]).T  # [D,3D]
    qkv_b = _np(sd[_j(prefix, "self_attn.in_proj_bias")])
    return {
        "attn": {
            "qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
            "out": dense_from_torch(sd, _j(prefix, "self_attn.out_proj")),
        },
        "ln1": ln_from_torch(sd, _j(prefix, "norm1")),
        "ff1": dense_from_torch(sd, _j(prefix, "linear1")),
        "ff2": dense_from_torch(sd, _j(prefix, "linear2")),
        "ln2": ln_from_torch(sd, _j(prefix, "norm2")),
    }


def encoder_stack_from_torch(
    sd: Mapping, prefix: str, n_layers: int, final_ln: str
) -> Dict[str, Any]:
    """``nn.TransformerEncoder(layers, norm=LN)`` -> ops.encoder_stack params."""
    return {
        "layers": [
            encoder_layer_from_torch(sd, _j(prefix, f"layers.{i}"))
            for i in range(n_layers)
        ],
        "final_ln": ln_from_torch(sd, final_ln),
    }


# --------------------------------------------------------------------------
# Feature_Fields (the 3D memory modules)
# --------------------------------------------------------------------------
def field_params_from_torch(sd: Mapping) -> Dict[str, Any]:
    """``dynam3d.pth`` (Feature_Fields state_dict) -> memory3d params.

    Module names from feature_fields.py:139-161.
    """
    return {
        "patch_pos_mlp": mlp2_from_torch(sd, "patch_to_instance_position_embedding"),
        "p2i_agg_token": jnp.asarray(_np(sd["aggregate_patch_to_instance_embedding"])),
        "p2i_encoder": encoder_stack_from_torch(
            sd, "aggregate_patch_to_instance_encoder", 2,
            "aggregate_patch_to_instance_encoder.norm",
        ),
        "inst_pos_mlp": mlp2_from_torch(sd, "instance_to_zone_position_embedding"),
        "i2z_agg_token": jnp.asarray(_np(sd["aggregate_instance_to_zone_embedding"])),
        "i2z_encoder": encoder_stack_from_torch(
            sd, "aggregate_instance_to_zone_encoder", 2,
            "aggregate_instance_to_zone_encoder.norm",
        ),
        "merge_disc": {
            "fc1": dense_from_torch(sd, "instance_merge_discriminator.0"),
            "ln": ln_from_torch(sd, "instance_merge_discriminator.1"),
            "fc2": dense_from_torch(sd, "instance_merge_discriminator.3"),
        },
    }


def _ceil16(n: int) -> int:
    return ((n + 15) // 16) * 16


def tcnn_mlp_from_flat(
    flat: Any, n_in: int, n_out: int, neurons: int, n_hidden: int
) -> list:
    """Unflatten a tinycudann CutlassMLP ``params`` tensor into per-layer
    ``[in, out]`` matrices.

    tcnn stores the network as one flat fp16 vector: row-major weight
    matrices concatenated in layer order, with the network's input and
    output widths padded up to multiples of 16 (hidden layers use
    ``n_neurons`` as-is).  The reference's renderer heads (``nerf_encoder``
    / ``nerf_decoder``, src_3dff feature_fields.py:221-243) serialize this
    way inside pretrain checkpoints.
    """
    w = np.asarray(_np(flat), np.float32).reshape(-1)
    in_pad, out_pad = _ceil16(n_in), _ceil16(n_out)
    dims = (
        [(neurons, in_pad)]
        + [(neurons, neurons)] * (n_hidden - 1)
        + [(out_pad, neurons)]
    )
    mats, off = [], 0
    for o, i in dims:
        m = w[off : off + o * i].reshape(o, i)
        off += o * i
        mats.append(m)
    if off != w.size:
        raise ValueError(
            f"tcnn flat params size {w.size} != layout {off} "
            f"(in={n_in}, out={n_out}, neurons={neurons}, hidden={n_hidden})"
        )
    # crop padding, transpose to our [in, out] convention
    out = [jnp.asarray(mats[0][:, :n_in].T)]
    out += [jnp.asarray(m.T) for m in mats[1:-1]]
    out.append(jnp.asarray(mats[-1][:n_out, :].T))
    return out


def render_params_from_torch(sd: Mapping, cfg) -> Dict[str, Any]:
    """Renderer heads (src_3dff feature_fields.py:218-256) -> render params.

    ``patch_to_nerf_position_embedding`` / ``aggregate_patch_to_nerf_encoder``
    are plain Linear+LayerNorm pairs; ``nerf_encoder`` / ``nerf_decoder``
    are tinycudann networks stored as flat ``params`` vectors (see
    :func:`tcnn_mlp_from_flat`).  ``cfg`` is the FieldsConfig providing
    ``mlp_net_width`` / ``mlp_net_layers``.
    """
    d = cfg.mlp_net_width
    n_enc = cfg.mlp_net_layers // 2
    n_dec = cfg.mlp_net_layers - n_enc
    enc = tcnn_mlp_from_flat(sd["nerf_encoder.params"], d, d + 1, d, n_enc)
    dec = tcnn_mlp_from_flat(sd["nerf_decoder.params"], d, d, d, n_dec)
    pos = dense_from_torch(sd, "patch_to_nerf_position_embedding.0")
    agg = dense_from_torch(sd, "aggregate_patch_to_nerf_encoder.0")
    return {
        "pos_w": pos["w"],
        "pos_b": pos["b"],
        "pos_ln": ln_from_torch(sd, "patch_to_nerf_position_embedding.1"),
        "agg_w": agg["w"],
        "agg_b": agg["b"],
        "agg_ln": ln_from_torch(sd, "aggregate_patch_to_nerf_encoder.1"),
        "mlp": {
            "enc_hidden": enc[:-1],
            "enc_out": enc[-1],
            "dec_hidden": dec[:-1],
            "dec_out": dec[-1],
        },
    }


# --------------------------------------------------------------------------
# CLIP (OpenAI layout, clip/model.py)
# --------------------------------------------------------------------------
def _clip_block_from_torch(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "attn": {
            "qkv": {
                "w": jnp.asarray(_np(sd[f"{prefix}.attn.in_proj_weight"]).T),
                "b": jnp.asarray(_np(sd[f"{prefix}.attn.in_proj_bias"])),
            },
            "out": dense_from_torch(sd, f"{prefix}.attn.out_proj"),
        },
        "ln1": ln_from_torch(sd, f"{prefix}.ln_1"),
        "ln2": ln_from_torch(sd, f"{prefix}.ln_2"),
        "fc1": dense_from_torch(sd, f"{prefix}.mlp.c_fc"),
        "fc2": dense_from_torch(sd, f"{prefix}.mlp.c_proj"),
    }


def clip_params_from_torch(sd: Mapping, vision_layers: int, text_layers: int) -> Dict[str, Any]:
    conv_w = _np(sd["visual.conv1.weight"])  # [W,3,P,P]
    W, _, P, _ = conv_w.shape
    # our patchify layout: [g,ps,g,ps,3] flattened as (ps,ps,3) per patch
    conv_flat = conv_w.transpose(2, 3, 1, 0).reshape(P * P * 3, W)
    return {
        "visual": {
            "conv1_w": jnp.asarray(conv_flat),
            "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
            "positional_embedding": jnp.asarray(_np(sd["visual.positional_embedding"])),
            "ln_pre": ln_from_torch(sd, "visual.ln_pre"),
            "transformer": {
                "blocks": [
                    _clip_block_from_torch(sd, f"visual.transformer.resblocks.{i}")
                    for i in range(vision_layers)
                ]
            },
            "ln_post": ln_from_torch(sd, "visual.ln_post"),
            "proj": jnp.asarray(_np(sd["visual.proj"])),
        },
        "text": {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
            "transformer": {
                "blocks": [
                    _clip_block_from_torch(sd, f"transformer.resblocks.{i}")
                    for i in range(text_layers)
                ]
            },
            "ln_final": ln_from_torch(sd, "ln_final"),
            "projection": jnp.asarray(_np(sd["text_projection"])),
        },
    }


def clip_vision_from_hf(sd: Mapping, num_layers: int) -> Dict[str, Any]:
    """HF ``CLIPVisionModel`` (the llava ``vision_tower``) -> our clip
    ``visual`` tree.

    The xtuner llava-phi-3-mini-hf checkpoint carries the vision tower in HF
    layout (separate q/k/v projections, ``pre_layrnorm`` [sic]); the vendored
    OpenAI layout converter above handles the reference's standalone CLIP.
    LLaVA consumes intermediate hidden states (vision_feature_layer=-2), so
    ``ln_post``/``proj`` are filled with identity — encode_image never
    reaches them on the hidden-layer path.
    """

    def g(k):
        for cand in (
            k,
            f"vision_tower.{k}",
            f"model.vision_tower.{k}",
            f"vision_tower.vision_model.{k}",
            f"model.vision_tower.vision_model.{k}",
            f"vision_model.{k}",
        ):
            if cand in sd:
                return _np(sd[cand])
        raise KeyError(k)

    def dense(prefix):
        return {
            "w": jnp.asarray(g(f"{prefix}.weight").T),
            "b": jnp.asarray(g(f"{prefix}.bias")),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(g(f"{prefix}.weight")),
            "bias": jnp.asarray(g(f"{prefix}.bias")),
        }

    def block(i):
        p = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [g(f"{p}.self_attn.q_proj.weight"), g(f"{p}.self_attn.k_proj.weight"),
             g(f"{p}.self_attn.v_proj.weight")], axis=0,
        ).T
        qkv_b = np.concatenate(
            [g(f"{p}.self_attn.q_proj.bias"), g(f"{p}.self_attn.k_proj.bias"),
             g(f"{p}.self_attn.v_proj.bias")], axis=0,
        )
        return {
            "attn": {
                "qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
                "out": dense(f"{p}.self_attn.out_proj"),
            },
            "ln1": ln(f"{p}.layer_norm1"),
            "ln2": ln(f"{p}.layer_norm2"),
            "fc1": dense(f"{p}.mlp.fc1"),
            "fc2": dense(f"{p}.mlp.fc2"),
        }

    conv_w = g("embeddings.patch_embedding.weight")  # [W,3,P,P], no bias
    W, _, P, _ = conv_w.shape
    conv_flat = conv_w.transpose(2, 3, 1, 0).reshape(P * P * 3, W)
    return {
        "conv1_w": jnp.asarray(conv_flat),
        "class_embedding": jnp.asarray(g("embeddings.class_embedding").reshape(-1)),
        "positional_embedding": jnp.asarray(g("embeddings.position_embedding.weight")),
        "ln_pre": ln("pre_layrnorm"),
        "transformer": {"blocks": [block(i) for i in range(num_layers)]},
        "ln_post": {
            "scale": jnp.ones((W,), jnp.float32),
            "bias": jnp.zeros((W,), jnp.float32),
        },
        "proj": jnp.eye(W, dtype=jnp.float32),
    }


# --------------------------------------------------------------------------
# Phi-3 / LLaVA (HF layout)
# --------------------------------------------------------------------------
def phi3_params_from_torch(sd: Mapping, num_layers: int, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF ``Phi3ForCausalLM`` (under ``language_model.`` in llava) layouts."""

    def g(k):
        # bare Phi3ForCausalLM, legacy llava ("language_model.model."), and
        # transformers>=4.52 llava ("model.language_model." with the inner
        # "model." dropped) key layouts
        stripped = k[len("model."):] if k.startswith("model.") else k
        for cand in (
            k,
            f"language_model.{k}",
            f"model.{k}",
            f"language_model.model.{k}",
            f"model.language_model.{stripped}",
            f"language_model.{stripped}" if stripped != k else k,
        ):
            if cand in sd:
                return _np(sd[cand])
        raise KeyError(k)

    layers = []
    for i in range(num_layers):
        p = f"model.layers.{i}"
        try:
            qkv = g(f"{p}.self_attn.qkv_proj.weight").T
        except KeyError:
            qkv = np.concatenate(
                [
                    g(f"{p}.self_attn.q_proj.weight"),
                    g(f"{p}.self_attn.k_proj.weight"),
                    g(f"{p}.self_attn.v_proj.weight"),
                ],
                axis=0,
            ).T
        layers.append(
            {
                "input_ln": jnp.asarray(g(f"{p}.input_layernorm.weight"), jnp.float32),
                "qkv": jnp.asarray(qkv, dtype),
                "o": jnp.asarray(g(f"{p}.self_attn.o_proj.weight").T, dtype),
                "post_ln": jnp.asarray(
                    g(f"{p}.post_attention_layernorm.weight"), jnp.float32
                ),
                "gate_up": jnp.asarray(g(f"{p}.mlp.gate_up_proj.weight").T, dtype),
                "down": jnp.asarray(g(f"{p}.mlp.down_proj.weight").T, dtype),
            }
        )
    return {
        "embed_tokens": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "layers": layers,
        "final_ln": jnp.asarray(g("model.norm.weight"), jnp.float32),
        "lm_head": jnp.asarray(g("lm_head.weight").T, dtype),
    }


def llava_projector_from_torch(sd: Mapping) -> Dict[str, Any]:
    # transformers<4.52 stores the projector at top level; >=4.52 nests it
    # under "model." (verified against a meta-device LlavaForConditionalGeneration)
    prefix = (
        "multi_modal_projector"
        if "multi_modal_projector.linear_1.weight" in sd
        else "model.multi_modal_projector"
    )
    return {
        "fc1": dense_from_torch(sd, f"{prefix}.linear_1"),
        "fc2": dense_from_torch(sd, f"{prefix}.linear_2"),
    }


# --------------------------------------------------------------------------
# Waypoint BERT (TRM_net.py + waypoint_bert.py)
# --------------------------------------------------------------------------
def waypoint_params_from_torch(sd: Mapping, n_layers: int = 2) -> Dict[str, Any]:
    layers = []
    for i in range(n_layers):
        p = f"waypoint_TRM.bert.encoder.layer.{i}"
        qkv_w = np.concatenate(
            [
                _np(sd[f"{p}.attention.self.query.weight"]),
                _np(sd[f"{p}.attention.self.key.weight"]),
                _np(sd[f"{p}.attention.self.value.weight"]),
            ],
            axis=0,
        ).T
        qkv_b = np.concatenate(
            [
                _np(sd[f"{p}.attention.self.query.bias"]),
                _np(sd[f"{p}.attention.self.key.bias"]),
                _np(sd[f"{p}.attention.self.value.bias"]),
            ]
        )
        layers.append(
            {
                "attn": {
                    "qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
                    "out": dense_from_torch(sd, f"{p}.attention.output.dense"),
                },
                "ln1": ln_from_torch(sd, f"{p}.attention.output.LayerNorm"),
                "ff1": dense_from_torch(sd, f"{p}.intermediate.dense"),
                "ff2": dense_from_torch(sd, f"{p}.output.dense"),
                "ln2": ln_from_torch(sd, f"{p}.output.LayerNorm"),
            }
        )
    return {
        "visual_fc_depth": dense_from_torch(sd, "visual_fc_depth.1"),
        "bert_layers": layers,
        "cls_fc1": dense_from_torch(sd, "vis_classifier.0"),
        "cls_fc2": dense_from_torch(sd, "vis_classifier.2"),
    }


# --------------------------------------------------------------------------
# save / resume (orbax)
# --------------------------------------------------------------------------
def save_checkpoint(ckpt_dir: str, step: int, payload: Any) -> str:
    """``ckpt.iter{N}`` save (rank-0 only in multiproc; caller gates).

    Arrays are staged to host numpy first: orbax's async d2h path can hang on
    experimental PJRT backends (observed on the axon tunnel), and host staging
    also keeps checkpoints sharding-agnostic.
    """
    import jax
    import orbax.checkpoint as ocp

    payload = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "devices") else x, payload
    )
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt.iter{step}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), item=template)
        return ckptr.restore(os.path.abspath(path))


def newest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Requeue resume: newest ckpt by mtime (ss_trainer_Dynam3D.py:201-206)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if d.startswith("ckpt.iter")
    ]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)


def checkpoint_step(path: str) -> int:
    """ckpt id from filename (base_il_trainer.py:891-895)."""
    m = re.search(r"iter(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


# --------------------------------------------------------------------------
# YOLOv8-seg / FastSAM (ultralytics layout, BN folding)
# --------------------------------------------------------------------------
def conv_bn_from_torch(sd: Mapping, prefix: str, eps: float = 1e-3) -> Dict[str, Any]:
    """ultralytics ``Conv`` = Conv2d(bias=False) + BatchNorm2d -> folded
    HWIO conv weight + bias (our yolov8_seg._conv layout)."""
    w = _np(sd[f"{prefix}.conv.weight"])          # [O,I,kh,kw]
    gamma = _np(sd[f"{prefix}.bn.weight"])
    beta = _np(sd[f"{prefix}.bn.bias"])
    mean = _np(sd[f"{prefix}.bn.running_mean"])
    var = _np(sd[f"{prefix}.bn.running_var"])
    scale = gamma / np.sqrt(var + eps)
    w_f = w * scale[:, None, None, None]
    b_f = beta - mean * scale
    return {"w": jnp.asarray(w_f.transpose(2, 3, 1, 0)), "b": jnp.asarray(b_f)}


def plain_conv_from_torch(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """Bare Conv2d (the detect-head output convs, which have bias, no BN)."""
    w = _np(sd[f"{prefix}.weight"])
    b = _np(sd.get(f"{prefix}.bias", np.zeros(w.shape[0], np.float32)))
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}


def _c2f_from_torch(sd: Mapping, prefix: str, n: int) -> Dict[str, Any]:
    return {
        "cv1": conv_bn_from_torch(sd, f"{prefix}.cv1"),
        "m": [
            {
                "cv1": conv_bn_from_torch(sd, f"{prefix}.m.{i}.cv1"),
                "cv2": conv_bn_from_torch(sd, f"{prefix}.m.{i}.cv2"),
            }
            for i in range(n)
        ],
        "cv2": conv_bn_from_torch(sd, f"{prefix}.cv2"),
    }


def yolov8_params_from_torch(
    sd: Mapping, depth_n=(3, 6, 6, 3)
) -> Dict[str, Any]:
    """FastSAM-x state dict (``model.model.N`` ultralytics indexing) -> our
    yolov8_seg param tree.  Layer indices follow the yolov8-seg yaml:
    0 stem, 1 down1, 2 c2f1, 3 down2, 4 c2f2, 5 down3, 6 c2f3, 7 down4,
    8 c2f4, 9 sppf, 12/15/18/21 neck c2fs, 16/19 pan convs, 22 Segment head.
    """
    n1, n2, n3, n4 = depth_n
    m = "model.model"
    p: Dict[str, Any] = {
        "stem": conv_bn_from_torch(sd, f"{m}.0"),
        "down1": conv_bn_from_torch(sd, f"{m}.1"),
        "c2f1": _c2f_from_torch(sd, f"{m}.2", n1),
        "down2": conv_bn_from_torch(sd, f"{m}.3"),
        "c2f2": _c2f_from_torch(sd, f"{m}.4", n2),
        "down3": conv_bn_from_torch(sd, f"{m}.5"),
        "c2f3": _c2f_from_torch(sd, f"{m}.6", n3),
        "down4": conv_bn_from_torch(sd, f"{m}.7"),
        "c2f4": _c2f_from_torch(sd, f"{m}.8", n4),
        "sppf": {
            "cv1": conv_bn_from_torch(sd, f"{m}.9.cv1"),
            "cv2": conv_bn_from_torch(sd, f"{m}.9.cv2"),
        },
        "neck1": _c2f_from_torch(sd, f"{m}.12", n1),
        "neck2": _c2f_from_torch(sd, f"{m}.15", n1),
        "pan1": conv_bn_from_torch(sd, f"{m}.16"),
        "neck3": _c2f_from_torch(sd, f"{m}.18", n1),
        "pan2": conv_bn_from_torch(sd, f"{m}.19"),
        "neck4": _c2f_from_torch(sd, f"{m}.21", n1),
        "proto": {
            "cv1": conv_bn_from_torch(sd, f"{m}.22.proto.cv1"),
            "cv2": conv_bn_from_torch(sd, f"{m}.22.proto.cv2"),
            "cv3": conv_bn_from_torch(sd, f"{m}.22.proto.cv3"),
        },
        "det": [],
    }
    for i in range(3):
        p["det"].append(
            {
                "box0": conv_bn_from_torch(sd, f"{m}.22.cv2.{i}.0"),
                "box1": conv_bn_from_torch(sd, f"{m}.22.cv2.{i}.1"),
                "box2": plain_conv_from_torch(sd, f"{m}.22.cv2.{i}.2"),
                "cls0": conv_bn_from_torch(sd, f"{m}.22.cv3.{i}.0"),
                "cls1": conv_bn_from_torch(sd, f"{m}.22.cv3.{i}.1"),
                "cls2": plain_conv_from_torch(sd, f"{m}.22.cv3.{i}.2"),
                "m0": conv_bn_from_torch(sd, f"{m}.22.cv4.{i}.0"),
                "m1": conv_bn_from_torch(sd, f"{m}.22.cv4.{i}.1"),
                "m2": plain_conv_from_torch(sd, f"{m}.22.cv4.{i}.2"),
            }
        )
    return p


# --------------------------------------------------------------------------
# DDPPO depth resnet50 (habitat gibson-2plus checkpoint)
# --------------------------------------------------------------------------
def depth_resnet_from_torch(sd: Mapping) -> Dict[str, Any]:
    """gibson-2plus-resnet50.pth visual_encoder weights -> depth_resnet params.

    The reference strips the ``actor_critic.net.visual_encoder.`` prefix
    first (resnet_encoders.py:40-52); pass that stripped dict here.
    """

    def conv(prefix):
        return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0))}

    def gn(prefix):
        return {
            "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        }

    stages = []
    blocks_per = [3, 4, 6, 3]
    for si, nb in enumerate(blocks_per):
        stage = []
        for bi in range(nb):
            b = f"backbone.layer{si + 1}.{bi}"
            blk = {
                "conv1": conv(f"{b}.convs.0"),
                "gn1": gn(f"{b}.convs.1"),
                "conv2": conv(f"{b}.convs.3"),
                "gn2": gn(f"{b}.convs.4"),
                "conv3": conv(f"{b}.convs.6"),
                "gn3": gn(f"{b}.convs.7"),
            }
            if bi == 0:
                blk["down_conv"] = conv(f"{b}.downsample.0")
                blk["down_gn"] = gn(f"{b}.downsample.1")
            stage.append(blk)
        stages.append(stage)
    return {
        "stem_conv": conv("backbone.conv1.0"),
        "stem_gn": gn("backbone.conv1.1"),
        "stages": stages,
        "compress_conv": conv("compression.0"),
        "compress_gn": gn("compression.1"),
    }
