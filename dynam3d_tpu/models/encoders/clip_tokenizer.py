"""CLIP text tokenization for category/caption embeddings.

The reference vendors OpenAI's BPE ``simple_tokenizer`` (clip/clip.py
``tokenize``) for the pretraining text alignment.  The BPE vocab file is an
external asset; this module provides:

  - :class:`HFClipTokenizer` — exact tokenization via a locally available HF
    ``CLIPTokenizer`` (weight-parity runs);
  - :func:`hash_tokenize` — a deterministic, asset-free fallback mapping
    words to stable vocab buckets with the correct BOS/EOT framing; adequate
    for tests/benchmarks (the text encoder is frozen and random-init there).

Both produce ``[B, 77] int32`` with BOS=49406, EOT=49407 (the OpenAI ids),
EOT being the argmax token as ``encode_text`` expects (clip/model.py:352).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np

BOS = 49406
EOT = 49407
CONTEXT = 77


def hash_tokenize(texts: Sequence[str], context: int = CONTEXT) -> np.ndarray:
    out = np.zeros((len(texts), context), np.int32)
    for b, text in enumerate(texts):
        ids: List[int] = [BOS]
        for word in text.lower().strip().split():
            h = int.from_bytes(
                hashlib.md5(word.encode()).digest()[:4], "little"
            )
            ids.append(1 + h % (BOS - 1))  # stay below BOS so EOT is argmax
            if len(ids) >= context - 1:
                break
        ids.append(EOT)
        out[b, : len(ids)] = ids
    return out


class HFClipTokenizer:
    def __init__(self, path: str):
        from transformers import CLIPTokenizer

        self.tok = CLIPTokenizer.from_pretrained(path, local_files_only=True)

    def __call__(self, texts: Sequence[str], context: int = CONTEXT) -> np.ndarray:
        enc = self.tok(
            list(texts), padding="max_length", max_length=context,
            truncation=True, return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)
