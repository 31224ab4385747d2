"""HFTokenizer conventions pinned against a REAL on-disk tokenizer asset.

The reference splices multimodal embeddings at a HARDCODED offset 2
(``inputs_embeds[b:b+1, :2]``, Policy_Dynam3D_VLN.py:393): token 0 is bos,
token 1 is ``<|user|>``, and token 2 is the first ``<image>`` — which only
holds because Phi-3's chat specials carry ``rstrip=True`` (the "\n" after
``<|user|>`` is absorbed into the special token).  This builds a byte-level
fast tokenizer with the same conventions (bos post-processor, rstrip'ing
``<|user|>``/``<|end|>``/``<|assistant|>``, plain ``<image>``), saves it to
disk, loads it through ``HFTokenizer`` (AutoTokenizer.from_pretrained), and
pins every convention the runtime relies on — no external downloads.
"""

import pytest

from dynam3d_tpu.models.vlm.tokenizer import HFTokenizer, build_prompt


@pytest.fixture(scope="module")
def tok_path(tmp_path_factory):
    from tokenizers import AddedToken, Regex, Tokenizer, pre_tokenizers
    from tokenizers.models import WordLevel
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for ch in sorted(pre_tokenizers.ByteLevel.alphabet()):
        vocab[ch] = len(vocab)
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    # byte-level chars, one token per byte (WordLevel matches whole
    # pre-tokens, so split to single chars after the byte mapping)
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        pre_tokenizers.Split(Regex("[\\s\\S]"), "isolated"),
    ])
    tok.decoder = ByteLevelDecoder()
    # Llama/Phi-3-style bos prepend on encode(add_special_tokens=True)
    tok.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A <s> $B", special_tokens=[("<s>", 1)]
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<pad>",
    )
    # Phi-3 tokenizer_config: the chat specials are rstrip=True; the xtuner
    # llava-phi-3 <image> token is a plain special
    fast.add_special_tokens({
        "additional_special_tokens": [
            AddedToken("<|user|>", rstrip=True, special=True),
            AddedToken("<|end|>", rstrip=True, special=True),
            AddedToken("<|assistant|>", rstrip=True, special=True),
            AddedToken("<image>", special=True),
        ]
    })
    path = tmp_path_factory.mktemp("tok") / "llava_phi3_like"
    fast.save_pretrained(str(path))
    return str(path)


@pytest.fixture(scope="module")
def hf(tok_path):
    return HFTokenizer(tok_path)


N_MM = 5
PROMPT = build_prompt(
    "go to the red chair", ["turn left 2 steps.\n"], N_MM, "move 4 steps."
)


def test_special_ids_resolve(hf):
    assert hf.bos_id is not None and hf.bos_id >= 0
    assert hf.image_id >= 0 and hf.end_id >= 0
    assert hf.pad_id >= 0 and hf.pad_id != hf.bos_id
    assert hf.pad_id == hf.tok.pad_token_id


def test_splice_start_is_two(hf):
    """bos, <|user|> (newline absorbed by rstrip), then the <image> run —
    the layout Policy_Dynam3D_VLN.py:393's hardcoded ':2' depends on."""
    ids = hf.encode(PROMPT)
    user_id = hf.tok.convert_tokens_to_ids("<|user|>")
    assert ids[0] == hf.bos_id
    assert ids[1] == user_id
    assert ids[2] == hf.image_id
    # the runtime's dynamic splice finder equals the reference's constant
    assert ids.index(hf.image_id) == 2
    # the image run is contiguous and exactly n_mm long
    assert ids[2 : 2 + N_MM] == [hf.image_id] * N_MM
    assert ids[2 + N_MM] != hf.image_id


def test_no_bos_when_disabled(hf):
    ids = hf.encode(PROMPT, add_bos=False)
    assert ids[0] != hf.bos_id
    assert ids.index(hf.image_id) == 1


def test_end_assistant_adjacency(hf):
    """'<|end|>\\n<|assistant|>' collapses to [end, assistant] — the
    greedy-decode stop scan relies on <|end|> being a single id."""
    ids = hf.encode(PROMPT)
    asst_id = hf.tok.convert_tokens_to_ids("<|assistant|>")
    i = ids.index(hf.end_id)
    assert ids[i + 1] == asst_id


def test_decode_roundtrips_text(hf):
    ids = hf.encode("Next action: move 4 steps.", add_bos=False)
    assert hf.decode(ids) == "Next action: move 4 steps."


def test_gt_text_tail(hf):
    """The teacher-forced label region tokenizes identically standalone and
    in context (byte-level model: no cross-boundary merges)."""
    gt = "move 4 steps."
    tail = hf.encode(gt, add_bos=False)
    ids = hf.encode(PROMPT)
    assert ids[-len(tail):] == tail


def test_check_tokenizer_tool(tok_path):
    """tools/check_tokenizer.py runs its convention checks against a real
    on-disk tokenizer: structural conventions hold on the llava-phi-3-like
    fixture, and the id-arithmetic checks correctly flag that this fixture
    is NOT the real asset (its ids differ from Phi3Config's)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_tokenizer import run_checks

    checks = run_checks(tok_path)
    for name in ("C1_single_token_image", "C4_static_splice_offset",
                 "C5_contiguous_span", "C6_no_whitespace_absorption",
                 "C7_action_text_roundtrip", "C8_vocab_bound"):
        assert checks[name]["ok"], (name, checks[name])
    # the fixture's ids are not the real model's — the checker must notice
    assert not checks["C2_image_id"]["ok"]
    assert not checks["all_ok"]
