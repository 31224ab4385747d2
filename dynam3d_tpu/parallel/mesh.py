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


def phi3_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Megatron-style TP specs for the Phi-3 parameter pytree.

    qkv/gate_up column-split on 'tp'; o/down row-split; embeddings and
    lm_head vocab-split; norms replicated.

    NOTE: with fused qkv, a plain column split would mix Q/K/V shards;
    correctness is preserved because attention splits heads AFTER the matmul
    and XLA re-shards as needed — for the compile-path validation this is
    the intended layout, and the dedicated per-chip layout can be refined
    per-kernel later.
    """

    def layer(_):
        return {
            "input_ln": P(),
            "qkv": P(None, "tp"),
            "o": P("tp", None),
            "post_ln": P(),
            "gate_up": P(None, "tp"),
            "down": P("tp", None),
        }

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
