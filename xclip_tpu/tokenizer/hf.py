"""HuggingFace tokenizer wrappers (reference open_clip/tokenizer.py
HFTokenizer:403-459, SigLipTokenizer:463-520): pad/truncate to
context_length and return int32 numpy id arrays like SimpleTokenizer, so
data pipelines are tokenizer-agnostic."""

from __future__ import annotations

import warnings
from typing import List, Optional, Union

import numpy as np

from xclip_tpu.tokenizer.bpe import get_clean_fn


class HFTokenizer:
    def __init__(self, tokenizer_name: str, context_length: int = 77,
                 clean: str = "whitespace", strip_sep_token: bool = False,
                 language: Optional[str] = None, **hf_kwargs):
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, **hf_kwargs)
        except Exception as exn:  # pragma: no cover - network/env dependent
            raise RuntimeError(
                f"could not load HF tokenizer {tokenizer_name!r} — on a "
                "zero-egress machine pass a local tokenizer directory path"
            ) from exn
        # nllb-style multilingual tokenizers expose a src-lang setter
        # (reference tokenizer.py:417-421)
        set_lang_fn = getattr(self.tokenizer, "set_src_lang_special_tokens", None)
        if callable(set_lang_fn):
            self.set_lang_fn = set_lang_fn
        if language is not None:
            self.set_language(language)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        length = context_length or self.context_length
        texts = [self.clean_fn(t) for t in texts]
        out = self.tokenizer(
            texts, return_tensors="np", max_length=length,
            padding="max_length", truncation=True,
        )
        ids = out["input_ids"].astype(np.int32)
        if self.strip_sep_token:
            ids = np.where(ids == self.tokenizer.sep_token_id, 0, ids)
        return ids

    def set_language(self, src_lang):
        if hasattr(self, "set_lang_fn"):
            self.set_lang_fn(src_lang)
        else:
            warnings.warn("Cannot set language for the tokenizer.")


class SigLipTokenizer:
    """SigLIP's T5-compatible sentencepiece tokenizer (reference
    tokenizer.py:463-520): canonicalize-cleaned text through T5TokenizerFast
    with pad_token_id = eos_token_id = 1.

    The reference downloads the c4-en/mc4 sentencepiece vocabs from GCS; on
    a zero-egress machine pass a local sentencepiece .model path or a local
    HF tokenizer directory as ``tokenizer_name``."""

    # reference VOCAB_FILES (tokenizer.py:466-471) — kept for name parity;
    # these URLs are only reachable with network egress
    VOCAB_FILES = {
        "c4-en": "http://storage.googleapis.com/t5-data/vocabs/cc_en.32000/sentencepiece.model",
        "mc4": "http://storage.googleapis.com/t5-data/vocabs/mc4.250000.100extra/sentencepiece.model",
    }

    def __init__(self, tokenizer_name: str, context_length: Optional[int] = 64):
        import os

        from transformers import T5TokenizerFast

        try:
            if tokenizer_name in self.VOCAB_FILES:
                import tempfile
                import urllib.request

                with tempfile.NamedTemporaryFile("wb", suffix=".model") as dst:
                    with urllib.request.urlopen(self.VOCAB_FILES[tokenizer_name]) as src:
                        dst.write(src.read())
                    dst.flush()
                    self.tokenizer = T5TokenizerFast(dst.name, legacy=False)
            elif os.path.isfile(tokenizer_name) and tokenizer_name.endswith(".model"):
                self.tokenizer = T5TokenizerFast(tokenizer_name, legacy=False)
            else:
                self.tokenizer = T5TokenizerFast.from_pretrained(tokenizer_name, legacy=False)
        except Exception as exn:  # pragma: no cover - network/env dependent
            raise RuntimeError(
                f"could not load SigLIP tokenizer {tokenizer_name!r} — on a "
                "zero-egress machine pass a local sentencepiece .model path "
                "or a local tokenizer directory"
            ) from exn

        # reference tokenizer.py:493-494
        self.tokenizer.pad_token_id = 1
        self.tokenizer.eos_token_id = 1
        self.context_length = context_length
        self.clean_fn = get_clean_fn("canonicalize")

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        length = context_length or self.context_length
        assert length, "Please set a valid context length in class init or call."
        texts = [self.clean_fn(t) for t in texts]
        out = self.tokenizer(
            texts, return_tensors="np", max_length=length,
            padding="max_length", truncation=True,
        )
        return out["input_ids"].astype(np.int32)
