"""Feature gates, read ONCE at import time.

These env vars select between compiled code paths, so they are read inside
traced (jitted) functions.  Reading ``os.environ`` lazily at trace time is a
footgun: flipping a var after the first compile (or hitting the persistent
XLA cache) silently has no effect in that process.  All gates therefore
resolve to module constants here, at first import of ``dynam3d_tpu`` — set
them in the environment BEFORE importing the package.  Tests that need to
flip a gate monkeypatch the constant (e.g. ``dynam3d_tpu.flags.DISABLE_PALLAS``)
and clear jit caches, not the environment.
"""

from __future__ import annotations

import os


def _on(name: str, default: str = "") -> bool:
    return os.environ.get(name, default) not in ("", "0", "false")


#: Disable every Pallas kernel (pure-XLA fallbacks everywhere).
DISABLE_PALLAS: bool = _on("DYNAM3D_DISABLE_PALLAS")

#: Opt-in experimental Pallas kNN (measured slower than wide top_k; off).
ENABLE_PALLAS_KNN: bool = _on("DYNAM3D_ENABLE_PALLAS_KNN")

#: Opt-in 2D-grid int4 matvec variant (measured neutral; off).
INT4_GRID2D: bool = _on("DYNAM3D_INT4_GRID2D")

#: Disable the depth-band x tile-bbox culled ray kNN in the render path.
DISABLE_BANDED_KNN: bool = _on("DYNAM3D_DISABLE_BANDED_KNN")

#: Disable the Morton pre-sort feeding the banded kNN's tile bboxes.
DISABLE_MORTON_KNN: bool = _on("DYNAM3D_DISABLE_MORTON_KNN")

#: Fused int4 gate+up matvec in the decode MLP (default on).
INT4_FUSED_MLP: bool = _on("DYNAM3D_INT4_FUSED_MLP", "1")

#: Per-shape nblk tuning for the int4 matvec (measured worse in-loop; off).
INT4_PER_SHAPE_NBLK: bool = _on("DYNAM3D_INT4_PER_SHAPE_NBLK")

#: Fused decode-layer attention kernel (ops/pallas_decode.py): rmsnorm +
#: int4 qkv + rope + cached attention + o-proj in one Pallas program, with
#: the MLP half as a second single program (int4_mlp_block).  Applies to
#: B=1 int4 decode at unpadded dims.  On-chip A/B: 4.62 vs 4.93 ms/token
#: unfused (tools/ab_fused_decode.py, docs/BENCH_NOTES.md round 3).
FUSED_DECODE_ATTN: bool = _on("DYNAM3D_FUSED_ATTN", "1")

#: Manual-ring whole-layer decode kernel (decode_layer_ring): qkv/o/gate_up
#: column blocks share one deep DMA ring in consumption order, so the HBM
#: bus keeps streaming through the attention step.  (A grid-pipelined
#: whole-layer variant measured NEUTRAL — 4.06 vs 4.04 ms/token — because
#: its one-block lookahead leaves the bus idle through the ~25 us attention
#: step; it was deleted in round 4 once the ring superseded it, see
#: docs/BENCH_NOTES.md round 3 "whole-layer fusion".)
#: On-chip: 3.53 ms/token vs 3.95 split / 4.19 unfused (8->128 chains,
#: docs/BENCH_NOTES.md round 3) — default ON.
FUSED_DECODE_RING: bool = _on("DYNAM3D_FUSED_RING", "1")

#: Ring depth (outstanding [D, nblk] weight-block DMAs) for the ring kernel.
FUSED_RING_SLOTS: int = int(os.environ.get("DYNAM3D_FUSED_RING_SLOTS", "4"))

#: Store packed int4 weights block-major ([nb, Dp, nblk]) so each column
#: block streams as one contiguous DMA instead of nblk-byte strided rows.
INT4_BLOCK_MAJOR: bool = _on("DYNAM3D_INT4_BLOCK_MAJOR")

#: Speculative greedy decode with n-gram prompt-lookup drafts
#: (models/vlm/phi3.py::greedy_decode_spec).  Decode is HBM-bound (the
#: weight stream IS the cost, ~3.5 ms/token at Phi-3-mini int4), so
#: verifying K draft tokens in one pass costs ~one token's weight stream;
#: with the templated VLN action vocabulary ("turn left N degree ...",
#: "go forward ...", "stop.") the draft source (instruction + history +
#: own output) hits often.  Greedy-exact: every emitted token is the
#: argmax given exactly the accepted prefix; a draft-less pass falls back
#: to a plain one-token step, so the all-miss regime costs the same as
#: non-speculative decode.  Applies at B=1 (llava.generate falls back to
#: plain greedy for batched rows).  Default ON: full-step p50 186.7 ->
#: 151.6 ms on the serving bench (decode 3.57 -> 2.49 ms/token;
#: docs/BENCH_NOTES.md).  DYNAM3D_SPEC_DECODE=0 disables.
SPEC_DECODE: bool = _on("DYNAM3D_SPEC_DECODE", "1")

#: Draft window K (tokens verified per pass, incl. the carried token).
#: Pass cost is ~flat in K (the weight stream dominates: 4.28/5.14/5.30
#: ms at K=1/4/8 on the XLA path), so the largest window the kernel
#: supports (8 sublane rows) amortizes best: alpha=1 measures 0.535
#: ms/token at K=8 vs 0.97 at K=4 (docs/BENCH_NOTES.md).
SPEC_DRAFT_LEN: int = int(os.environ.get("DYNAM3D_SPEC_K", "8"))

#: MEASUREMENT MODE ONLY: treat every draft as accepted, so an e2e spec
#: run times the full-acceptance (alpha=1) machinery throughput — the
#: compute path is identical, only the accept decision is overridden
#: (emitted tokens are then the drafts, i.e. garbage).  Random weights
#: give near-uniform logits where bf16 accumulation noise flips argmax
#: between passes, so real acceptance cannot be demonstrated without
#: trained weights; this brackets it instead (tools/ab_spec_decode.py).
SPEC_FORCE_ACCEPT: bool = _on("DYNAM3D_SPEC_FORCE_ACCEPT")

#: W8A8 prefill: quantize activations per token (dynamic max-abs) and run
#: prefill matmuls as int8 x int8 -> int32 on the MXU (2x the bf16 peak).
#: Measured 1.9x the per-matmul rate at prefill shapes with ~0.9% median
#: relative error on top of weight quantization (tools/bench_int8_prefill.py,
#: docs/BENCH_NOTES.md round 3); prefill 87.7 -> 75.1 ms in the full step.
#: Default ON, consistent with the default int4 weight-only decode (both
#: apply only to *quantized* inference packs — dense training/golden paths
#: never take this branch).  Disable with DYNAM3D_W8A8_PREFILL=0 for
#: bit-faithful weight-only-int8 eval logits.
W8A8_PREFILL: bool = _on("DYNAM3D_W8A8_PREFILL", "1")
