"""HuggingFace tokenizer wrapper (reference open_clip/tokenizer.py
HFTokenizer:404-459): pads/truncates to context_length and returns int32
numpy id arrays like SimpleTokenizer, so data pipelines are agnostic."""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class HFTokenizer:
    def __init__(self, tokenizer_name: str, context_length: int = 77, **hf_kwargs):
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, **hf_kwargs)
        except Exception as exn:  # pragma: no cover - network/env dependent
            raise RuntimeError(
                f"could not load HF tokenizer {tokenizer_name!r} — on a "
                "zero-egress machine pass a local tokenizer directory path"
            ) from exn
        self.context_length = context_length

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        length = context_length or self.context_length
        out = self.tokenizer(
            texts, return_tensors="np", max_length=length,
            padding="max_length", truncation=True,
        )
        return out["input_ids"].astype(np.int32)
