"""tools/spec_acceptance.py: the realistic-text speculation study.

Pins the qualitative result the serving default rests on: on the trained
action grammar, prompt-lookup drafting clears break-even by a wide margin
in the history-repeat regimes and degrades gracefully at cold start."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import numpy as np

import spec_acceptance


def test_simulation_counts_are_exact():
    """Hand-checkable case: continuation identical to a history entry ->
    after the first bigram lands, every pass should emit close to k
    tokens."""
    from dynam3d_tpu.models.vlm.tokenizer import ByteTokenizer, build_prompt

    tok = ByteTokenizer(32064)
    cont = "turn left 2 steps, move forward 4 steps."
    ids = tok.encode(build_prompt("go", [cont + "\n"] * 4, 8))
    prompt = np.asarray(
        [t if t != tok.image_id else -1 for t in ids], np.int32
    )
    cont_ids = tok.encode(cont + "<|end|>", add_bos=False)
    N, passes = spec_acceptance.simulate(prompt, cont_ids, k=8)
    assert N == len(cont_ids)
    # 42 tokens in <= 9 passes (>= 4.6 tokens/pass): the drafter must be
    # finding the verbatim history occurrence
    assert N / passes > 4.0, (N, passes)


def test_study_verdict_is_spec():
    """Both tokenizer granularities (char + sentencepiece-length word
    proxy) must clear break-even; the top-level verdict is computed from
    the WORSE one (VERDICT r4 weak #3)."""
    out = spec_acceptance.main(["--json"])
    char = out["granularity"]["char"]
    by = {r["scenario"]: r["tokens_per_pass"] for r in char["scenarios"]}
    assert by["repeat"] > 4.0
    assert by["novel-counts"] > 2.0
    assert by["cold-start"] >= 1.0 and by["stop"] >= 1.0
    assert char["mean_tokens_per_pass"] > out["break_even_tokens_per_pass"]

    word = out["granularity"]["word"]
    wby = {r["scenario"]: r["tokens_per_pass"] for r in word["scenarios"]}
    assert wby["repeat"] > 3.0          # verbatim repeats still draft well
    assert word["mean_tokens_per_pass"] > out["break_even_tokens_per_pass"]
    assert out["worst_case_tokens_per_pass"] == min(
        char["mean_tokens_per_pass"], word["mean_tokens_per_pass"]
    )
    assert out["verdict"] == "spec"
