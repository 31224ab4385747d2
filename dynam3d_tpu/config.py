"""Unified configuration for dynam3d_tpu.

The reference carries TWO disjoint config systems — a yacs experiment tree
(Dynam3D_VLN/vlnce_baselines/config/default.py:14-230) and a configargparse
namespace buried inside the 3D memory module
(vlnce_baselines/models/feature_fields.py:22-46).  SURVEY.md §5.6 calls for
unifying them; this module is that unification: one frozen-dataclass tree,
overridable from YAML/JSON dicts and "dotted.key=value" CLI opts.

All numeric defaults preserve the reference's constants (SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class FieldsConfig:
    """3D memory ("Feature Fields") hyperparameters.

    Mirrors the configargparse defaults at
    reference vlnce_baselines/models/feature_fields.py:28-45 and
    src_3dff/models/feature_fields.py:29-76, plus the fixed table
    capacities that replace the reference's unbounded Python lists.
    """

    input_hfov: float = 90.0
    input_vfov: float = 90.0
    input_height: int = 24          # patch grid height (24x24 per view)
    input_width: int = 24
    fts_dim: int = 768

    zone_x_length: float = 2.0      # zone cell 2x2x2 m (feature_fields.py:39-41)
    zone_y_length: float = 2.0
    zone_z_length: float = 2.0

    deleted_frustum_distance: float = 3.0   # frustum-delete far plane (":42")
    frustum_depth_slack: float = 0.1        # visibility test slack (":353")

    num_proposal_instances: int = 2  # VLN merge proposals k=2 (":44"); pretrain uses 4

    # --- fixed-capacity table sizes (TPU replacement for unbounded growth) ---
    patch_capacity: int = 32768     # >= max_traj_len(50) * 576 patches/step
    instance_capacity: int = 2048
    zone_capacity: int = 1024
    max_segments: int = 64          # max FastSAM segments per view
    max_members: int = 4096         # patch-members cap for instance re-aggregation
    max_zone_members: int = 256     # instance-members cap per zone re-aggregation

    #: Matmul dtype for the patch->instance / instance->zone aggregation
    #: encoders.  "bf16" matches the reference's fp16-autocast training
    #: regime (ss_trainer_Dynam3D.py:323, ss_trainer_3DFF.py:501) and runs
    #: the [S, max_members] re-aggregation attention — the single biggest
    #: perceive cost — on the MXU's fast path; golden parity tests pin
    #: "f32" to compare bit-closely against the fp32 reference run.
    encoder_dtype: str = "bf16"

    # --- renderer (pretrain feature fields; src_3dff feature_fields.py:48-76) ---
    near: float = 0.0
    far: float = 10.0
    view_hfov: float = 90.0
    view_vfov: float = 90.0
    view_height: int = 12
    view_width: int = 12
    search_radius: float = 1.0      # feature_fields_search_radius
    search_num: int = 4             # k neighbors within radius
    mlp_net_layers: int = 4
    mlp_net_width: int = 768
    n_samples: int = 501            # coarse samples per ray
    n_importance: int = 8           # fine (important) samples per ray
    # banded ray-kNN culling granularity (ops/knn.py::knn_banded): points
    # per bbox tile and depth samples per query band; defaults from the
    # on-chip sweep at 32k Morton-sorted walk-clustered patches with the
    # values-only stage-1 merge (54.3 ms/view vs 68.7 at 2048/32;
    # docs/BENCH_NOTES.md round 3)
    knn_tile: int = 1024
    knn_band: int = 64

    # tombstone marker for deleted entries (feature_fields.py:357,378,392)
    tombstone: float = -10000.0


@dataclass(frozen=True)
class CLIPConfig:
    """OpenAI CLIP ViT-L/14@336px (vendored clip/model.py:219-238)."""

    image_size: int = 336
    patch_size: int = 14
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    embed_dim: int = 768            # projected output dim
    text_context: int = 77
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    vocab_size: int = 49408

    #: Vision-tower matmul dtype for the perception path.  "bf16" matches
    #: the reference deployment (OpenAI CLIP ships fp16 weights via
    #: clip.load; the LLaVA tower is loaded torch_dtype=bfloat16,
    #: Policy_Dynam3D_VLN.py:117) and halves the two ViT-L passes' MXU
    #: time; parameters stay f32 and golden tests feed f32 pixels, so
    #: bit-close comparisons are unaffected.
    compute_dtype: str = "bf16"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size  # 24


@dataclass(frozen=True)
class DepthEncoderConfig:
    """DDPPO resnet50 depth encoder (resnet_encoders.py:15-109)."""

    input_size: int = 256
    output_size: int = 128
    base_planes: int = 32
    ngroups: int = 16
    spatial_output: bool = True     # -> [B,128,4,4]


@dataclass(frozen=True)
class SegmenterConfig:
    """FastSAM / YOLOv8-seg "segment everything" (models/fastsam/*.py).

    ``provider`` selects the live segmentation source in the perceive path:
    "yolov8" (default — the learned FastSAM port, matching the reference's
    always-on FastSAM at feature_fields.py:750-780, conf 0.4 / iou 0.8 /
    imgsz 576) or "depth_plane" (the geometric fallback / test provider,
    models/segmenter.py).
    """

    provider: str = "yolov8"
    imgsz: int = 576
    conf: float = 0.4
    iou: float = 0.8
    max_masks: int = 64             # fixed S_max for TPU
    width_mult: float = 1.25        # FastSAM-x = YOLOv8x-seg scaling
    depth_mult: float = 1.0
    num_protos: int = 32

    def depth_layers(self) -> tuple:
        """ultralytics depth scaling: base (3,6,6,3) x depth_mult, min 1."""
        return tuple(
            max(1, round(n * self.depth_mult)) for n in (3, 6, 6, 3)
        )


@dataclass(frozen=True)
class WaypointConfig:
    """Frozen waypoint predictor (waypoint_pred/TRM_net.py:9-88)."""

    hidden_dim: int = 768
    num_angles: int = 120
    num_imgs: int = 12
    n_classes: int = 12             # distance bins
    trm_layers: int = 2
    trm_neighbor: int = 1
    heatmap_offset: int = 5
    num_attention_heads: int = 12
    max_candidates: int = 5         # nms max_predictions (Policy_Dynam3D_VLN.py:243)
    nms_sigma: Tuple[float, float] = (7.0, 5.0)


@dataclass(frozen=True)
class Phi3Config:
    """Phi-3-mini-4k decoder (xtuner/llava-phi-3-mini-hf language model)."""

    vocab_size: int = 32064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 96
    rope_theta: float = 10000.0
    max_position: int = 4096
    rms_eps: float = 1e-5
    pad_token_id: int = 32000       # <|endoftext|>
    end_token_id: int = 32007       # <|end|>
    image_token_id: int = 32038     # <image> placeholder added by llava-phi-3 processor


@dataclass(frozen=True)
class LLaVAConfig:
    """LLaVA-Phi-3-mini: CLIP-L/14-336 tower + 2-layer MLP projector + Phi-3."""

    phi3: Phi3Config = field(default_factory=Phi3Config)
    vision_feature_layer: int = -2  # second-to-last ViT layer
    projector_hidden: int = 3072
    max_new_tokens: int = 20        # greedy decode cap (Policy_Dynam3D_VLN.py:463)
    prefill_bucket: int = 128       # pad prompt length to a multiple of this
                                    # (tighter buckets waste fewer padded
                                    # prefill tokens — 816-token prompts pad
                                    # to 896 not 1024, prefill -7% measured;
                                    # each distinct bucket costs one compile,
                                    # amortized by the persistent XLA cache)


@dataclass(frozen=True)
class ActionConfig:
    """Action-text quantization (Policy_Dynam3D_VLN.py:298-300,473-475)."""

    angle_per_step_deg: float = 15.0
    distance_per_step: float = 0.25
    max_turn_steps: int = 4
    history_len: int = 4            # last-4 action strings in prompt


@dataclass(frozen=True)
class TrainConfig:
    """IL training knobs (scripts/iter_train.yaml, ss_trainer_Dynam3D.py)."""

    lr: float = 1e-6                # VLN Adafactor lr (main.bash)
    pretrain_lr: float = 1e-5       # 3DFF AdamW lr (3dff.bash)
    grad_clip_norm: float = 10.0    # VLN clip_grad_norm_ (ss_trainer_Dynam3D.py:796)
    grad_clip_value: float = 10.0   # pretrain clip_grad_value_ (ss_trainer_3DFF.py:517)
    max_traj_len: int = 50
    pretrain_traj_len: int = 5
    iters: int = 100000
    log_every: int = 500
    batch_size: int = 1
    seed: int = 0
    ckpt_dir: str = "data/checkpoints"
    is_requeue: bool = False        # resume from newest ckpt by mtime
    ml_weight: float = 1.0          # IL loss weight (ss_trainer_Dynam3D.py:287)
    waypoint_aug: bool = True       # pretrain waypoint sampling augmentation
                                    # (IL.waypoint_aug, ss_trainer_3DFF.py:845)
    sample_ratio: float = 1.0       # teacher-vs-sampled waypoint ratio
                                    # (IL.sample_ratio; commented in the VLN
                                    # trainer, active in pretrain dispatch)
    max_text_len: int = 2000        # instruction char cap (iter_train.yaml:42)
    recycle_every: int = 20         # env rebuild cadence (":577-587")
    use_waypoint_predictor: bool = True  # frozen TRM candidates, the
                                    # reference's always-on teacher path
                                    # (ss_trainer_Dynam3D.py:636-640)


@dataclass(frozen=True)
class EvalConfig:
    success_distance: float = 3.0   # 3dff.yaml:28
    max_infer_positions: int = 500  # inference path cap (ss_trainer_Dynam3D.py:773)
    fast_eval_stride: int = 5       # fast_eval = every 5th episode (":358")
    instance_distance: float = 5.0  # instance-token radius (feature_fields.py:818)
    zone_distance: float = 100.0    # zone-token radius


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout; the reference's only parallelism is DP (SURVEY §2.3)."""

    dp: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.tp


@dataclass(frozen=True)
class Dynam3DConfig:
    fields: FieldsConfig = field(default_factory=FieldsConfig)
    clip: CLIPConfig = field(default_factory=CLIPConfig)
    depth: DepthEncoderConfig = field(default_factory=DepthEncoderConfig)
    segmenter: SegmenterConfig = field(default_factory=SegmenterConfig)
    waypoint: WaypointConfig = field(default_factory=WaypointConfig)
    llava: LLaVAConfig = field(default_factory=LLaVAConfig)
    action: ActionConfig = field(default_factory=ActionConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def _replace_nested(cfg: Any, dotted: str, value: Any) -> Any:
    head, _, rest = dotted.partition(".")
    if not rest:
        fields_ = {f.name: f for f in dataclasses.fields(cfg)}
        if head not in fields_:
            raise KeyError(f"unknown config key: {head!r} on {type(cfg).__name__}")
        ftype = fields_[head].type
        if isinstance(value, str):
            value = _coerce(value, getattr(cfg, head))
        del ftype
        return dataclasses.replace(cfg, **{head: value})
    sub = getattr(cfg, head)
    return dataclasses.replace(cfg, **{head: _replace_nested(sub, rest, value)})


def _coerce(text: str, prev: Any) -> Any:
    if isinstance(prev, bool):
        return text.lower() in ("1", "true", "yes", "on")
    if isinstance(prev, int):
        return int(text)
    if isinstance(prev, float):
        return float(text)
    if isinstance(prev, tuple):
        return tuple(type(prev[0])(t) for t in text.split(","))
    return text


def apply_opts(cfg: Dynam3DConfig, opts: list[str]) -> Dynam3DConfig:
    """Apply trailing CLI opts as ``dotted.key=value`` pairs.

    Equivalent of the reference's ``merge_from_list`` (run.py:42-46).
    """
    for opt in opts:
        key, _, val = opt.partition("=")
        cfg = _replace_nested(cfg, key.strip(), val.strip())
    return cfg


def from_dict(d: dict, base: Optional[Dynam3DConfig] = None) -> Dynam3DConfig:
    """Build a config from a (possibly partial) nested dict (e.g. parsed YAML/JSON)."""
    cfg = base or Dynam3DConfig()

    def rec(prefix: str, node: Any):
        nonlocal cfg
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}.{k}" if prefix else k, v)
        else:
            cfg = _replace_nested(cfg, prefix, node)

    rec("", d)
    return cfg


def load(path: str, opts: Optional[list[str]] = None) -> Dynam3DConfig:
    """``get_config`` equivalent (vlnce_baselines/config/default.py:190-230)."""
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml  # optional dep; stdlib json is the fallback format

        d = yaml.safe_load(text)
    else:
        d = json.loads(text)
    cfg = from_dict(d or {})
    if opts:
        cfg = apply_opts(cfg, opts)
    return cfg
