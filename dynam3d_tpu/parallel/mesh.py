"""Device meshes and sharding rules.

The reference's only parallelism is 4-process DDP over NCCL
(ss_trainer_Dynam3D.py:186-190; SURVEY.md §2.3).  The TPU equivalent is a
``jax.sharding.Mesh`` with a data axis — gradients sync through the ``psum``
XLA inserts for the mesh, riding ICI instead of NCCL rings.  On top of the
reference (which has no TP), the LLaVA-Phi-3 weights optionally shard over a
tensor axis: attention heads and MLP columns split on 'tp', their output
projections row-split, so each layer incurs exactly two all-reduces (the
Megatron layout XLA derives from these PartitionSpecs).

PP/SP/EP are intentionally absent: the reference has no pipeline, sequence,
or expert parallelism to match (SURVEY.md §2.3), prompts are ~1-5k tokens
(no SP need, §5.7), and there is no MoE.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int, tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())[: dp * tp]
    if len(devs) < dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {len(devs)}")
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def split_qkv_params(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Fused Phi-3 params -> TP-clean split layout (wq/wk/wv, wgate/wup).

    The Megatron TP layout needs each shard to own whole attention heads
    (and a matching gate|up pair); a plain 'tp' column split of the FUSED
    ``[D, q|k|v]`` / ``[D, gate|up]`` matrices crosses the concat
    boundaries, so XLA must reassemble aligned slices with
    collective-permutes inside every layer (measured: 44 permutes for a
    2-layer tp=4 decode, 16 with only qkv split).  Splitting the weights (a
    one-time host transform at shard time) makes the per-layer comms
    exactly the two Megatron all-reduces.  ``phi3.forward`` accepts both
    layouts.
    """
    q_sz = cfg.num_heads * cfg.head_dim
    kv_sz = cfg.num_kv_heads * cfg.head_dim

    def layer(lp):
        w = lp["qkv"]
        if isinstance(w, dict) or isinstance(lp["gate_up"], dict):
            raise ValueError("split_qkv_params expects unquantized weights")
        out = {k: v for k, v in lp.items() if k not in ("qkv", "gate_up")}
        out["wq"] = w[:, :q_sz]
        out["wk"] = w[:, q_sz : q_sz + kv_sz]
        out["wv"] = w[:, q_sz + kv_sz :]
        gu = lp["gate_up"]
        i_sz = gu.shape[1] // 2
        out["wgate"] = gu[:, :i_sz]
        out["wup"] = gu[:, i_sz:]
        return out

    return {**params, "layers": [layer(lp) for lp in params["layers"]]}


def phi3_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Megatron-style TP specs for the Phi-3 parameter pytree.

    wq/wk/wv (or fused qkv) and gate_up column-split on 'tp'; o/down
    row-split; embeddings and lm_head vocab-split; norms replicated.  Use
    :func:`split_qkv_params` first — the fused layout stays supported but
    pays collective-permute resharding around attention (see its docstring).
    """

    def layer(lp):
        specs = {
            "input_ln": P(),
            "o": P("tp", None),
            "post_ln": P(),
            "down": P("tp", None),
        }
        if "wq" in lp:
            specs.update(wq=P(None, "tp"), wk=P(None, "tp"), wv=P(None, "tp"))
        else:
            specs["qkv"] = P(None, "tp")
        if "wgate" in lp:
            specs.update(wgate=P(None, "tp"), wup=P(None, "tp"))
        else:
            specs["gate_up"] = P(None, "tp")
        return specs

    return {
        "embed_tokens": P("tp", None),
        "layers": [layer(l) for l in params["layers"]],
        "final_ln": P(),
        "lm_head": P(None, "tp"),
    }


def replicated_specs(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def policy_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Sharding specs for the full VLN policy param tree: LLM TP-sharded,
    everything else (CLIP towers, 3D-memory modules, projectors) replicated —
    they are small (<1 GB total) and latency-critical."""
    specs = {k: replicated_specs(v) for k, v in params.items()}
    specs["llava"] = {
        "clip": replicated_specs(params["llava"]["clip"]),
        "projector": replicated_specs(params["llava"]["projector"]),
        "phi3": phi3_param_specs(params["llava"]["phi3"]),
    }
    return specs


def shard_tree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def data_sharding(mesh: Mesh):
    """Batch-leading data sharding (the DP equivalent of per-rank envs)."""
    return NamedSharding(mesh, P("dp"))
