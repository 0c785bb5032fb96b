"""CLIP byte-pair-encoding tokenizer (host-side, numpy output).

Clean-room implementation of the OpenAI CLIP BPE scheme so that token ids
match reference open_clip exactly (reference behaviour:
deps/open_clip/src/open_clip/tokenizer.py:133-277). The merge table
``bpe_simple_vocab_16e6.txt.gz`` is the public OpenAI vocabulary data asset.

Tokenization is host CPU work; the output int32 ``(N, 77)`` arrays feed the
jitted text encoder. The tokenizer itself never touches JAX.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import string
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np
import regex as re

DEFAULT_CONTEXT_LENGTH = 77

try:  # pragma: no cover - exercised only when ftfy is installed
    import ftfy

    def _fix_text(text: str) -> str:
        return ftfy.fix_text(text)

except ImportError:  # minimal mojibake-safe fallback

    def _fix_text(text: str) -> str:
        return text


@functools.lru_cache()
def default_bpe_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "bpe_simple_vocab_16e6.txt.gz")


@functools.lru_cache()
def byte_to_unicode() -> dict:
    """Reversible byte -> printable-unicode map used by GPT-2-style BPE.

    Printable latin byte values map to themselves; the remaining byte values
    are assigned codepoints starting at 256 so that no byte maps to
    whitespace/control characters.
    """
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    next_cp = 256
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(next_cp)
            next_cp += 1
    return mapping


def basic_clean(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def canonicalize_text(text: str, *, keep_punctuation_exact_string: Optional[str] = None) -> str:
    """Lowercase + strip punctuation (big_vision-style canonicalization)."""
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(_PUNCT_TABLE) for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(_PUNCT_TABLE)
    text = text.lower()
    return " ".join(text.split()).strip()


def _get_clean_fn(kind: str):
    if kind == "canonicalize":
        return lambda x: canonicalize_text(basic_clean(x))
    if kind == "lower":
        return lambda x: whitespace_clean(basic_clean(x)).lower()
    if kind == "whitespace":
        return lambda x: whitespace_clean(basic_clean(x))
    raise ValueError(f"invalid clean function {kind!r}")


# public name matching the reference (tokenizer.py:93-101)
get_clean_fn = _get_clean_fn


def _adjacent_pairs(word: Sequence[str]) -> set:
    return set(zip(word[:-1], word[1:]))


class SimpleTokenizer:
    """OpenAI-CLIP-compatible BPE tokenizer producing numpy int32 batches."""

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        additional_special_tokens: Optional[List[str]] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
    ):
        bpe_path = bpe_path or default_bpe_path()
        self.byte_encoder = byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path) as fh:
            lines = fh.read().decode("utf-8").split("\n")
        # first line is a version header; the vocab holds 49152-256-2 merges
        merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]]

        base = list(self.byte_encoder.values())
        vocab: List[str] = base + [tok + "</w>" for tok in base]
        vocab.extend("".join(m) for m in merges)
        special_tokens = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            special_tokens = special_tokens + list(additional_special_tokens)
        vocab.extend(special_tokens)

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self._cache = {tok: tok for tok in special_tokens}

        special_alt = "|".join(special_tokens)
        self.pat = re.compile(
            special_alt + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

        self.vocab_size = len(self.encoder)
        self.all_special_ids = [self.encoder[t] for t in special_tokens]
        self.sot_token_id = self.all_special_ids[0]
        self.eot_token_id = self.all_special_ids[1]
        self.context_length = context_length
        self.clean_fn = _get_clean_fn(clean)

    def bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: tuple = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _adjacent_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            n = len(word)
            while i < n:
                try:
                    j = word.index(first, i)
                except ValueError:
                    merged.extend(word[i:])
                    break
                merged.extend(word[i:j])
                i = j
                if i < n - 1 and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _adjacent_pairs(word)

        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = self.clean_fn(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[sub] for sub in self.bpe(token).split(" "))
        return ids

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(
        self,
        texts: Union[str, List[str]],
        context_length: Optional[int] = None,
    ) -> np.ndarray:
        """Tokenize to a ``(len(texts), context_length)`` int32 array.

        Sequences are ``<sot> tokens <eot>`` padded with zeros; over-length
        sequences are truncated with the final slot forced to ``<eot>``
        (matching the reference padding contract).
        """
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        if not context_length:
            raise ValueError("context_length must be set")

        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token_id
            result[i, : len(tokens)] = tokens
        return result


# ---------------------------------------------------------------------------
# masking tokenize variants (reference open_clip/tokenizer.py:280-401):
# over-length captions are reduced by token *sampling* instead of truncation.


def random_mask_tokenize(
    texts: Union[str, List[str]],
    context_length: int = DEFAULT_CONTEXT_LENGTH,
    *,
    shuffle: bool = False,
    tokenizer: Optional[SimpleTokenizer] = None,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Keep a random subset of tokens when over-length (sorted to preserve
    order unless ``shuffle``); reference tokenizer.py:280-306."""
    tk = tokenizer or _default_tokenizer()
    rng = rng or np.random
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(tk.encode(text))
        if len(tokens) > context_length - 2:
            indices = rng.permutation(len(tokens))[: context_length - 2]
            if not shuffle:
                indices = np.sort(indices)
            tokens = tokens[indices]
        n = len(tokens)
        result[i, 0] = tk.sot_token_id
        result[i, 1 : n + 1] = tokens
        result[i, n + 1] = tk.eot_token_id
    return result


def simple_mask_tokenize(
    texts: Union[str, List[str]],
    context_length: int = DEFAULT_CONTEXT_LENGTH,
    *,
    tokenizer: Optional[SimpleTokenizer] = None,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Keep a random contiguous window when over-length
    (reference tokenizer.py:309-328)."""
    tk = tokenizer or _default_tokenizer()
    rng = rng or np.random
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = tk.encode(text)
        if len(tokens) > context_length - 2:
            num_keep = context_length - 2
            start = int(rng.randint(0, len(tokens) - num_keep + 1))
            tokens = tokens[start : start + num_keep]
        seq = [tk.sot_token_id] + list(tokens) + [tk.eot_token_id]
        result[i, : len(seq)] = seq
    return result


def _nltk_has(nltk, resource: str) -> bool:
    try:
        nltk.data.find(resource)
        return True
    except LookupError:
        return False


def syntax_mask_tokenize(
    texts: Union[str, List[str]],
    context_length: int = DEFAULT_CONTEXT_LENGTH,
    *,
    tokenizer: Optional[SimpleTokenizer] = None,
    word_tokenize=None,
    pos_tag=None,
) -> np.ndarray:
    """Part-of-speech-prioritized masking (nouns > adjectives > verbs > rest;
    reference tokenizer.py:331-401): tag the sentence, keep the
    ``context_length - 2`` highest-priority words in their original order,
    re-encode, and truncate with a forced EOT.

    ``word_tokenize``/``pos_tag`` default to nltk; when nltk or its data
    packs (punkt, averaged_perceptron_tagger) are unavailable — both import
    AND data are needed, and the data download requires network — this
    raises ImportError with guidance instead of hanging on
    ``nltk.download``. Tests inject stubs to pin the selection logic.
    """
    if word_tokenize is None or pos_tag is None:
        _hint = ("use random_mask_tokenize or simple_mask_tokenize, or inject "
                 "word_tokenize/pos_tag callables")
        try:
            import nltk
        except ImportError as exn:  # pragma: no cover - env-dependent
            raise ImportError(
                f"syntax_mask_tokenize requires nltk, which is not importable "
                f"in this environment; {_hint}") from exn
        # resolve the data packs; download only as a fallback (needs network)
        for pack, paths in (
            ("punkt", ("tokenizers/punkt", "tokenizers/punkt_tab")),
            ("averaged_perceptron_tagger",
             ("taggers/averaged_perceptron_tagger",
              "taggers/averaged_perceptron_tagger_eng")),
        ):
            if any(_nltk_has(nltk, p) for p in paths):
                continue
            try:  # pragma: no cover - env-dependent (network)
                if not nltk.download(pack, quiet=True, raise_on_error=True):
                    raise LookupError(pack)
            except Exception as exn:
                raise ImportError(
                    f"syntax_mask_tokenize needs the nltk data pack "
                    f"{pack!r}, which is neither installed nor downloadable "
                    f"in this environment (no network egress); {_hint}"
                ) from exn
        word_tokenize = nltk.tokenize.word_tokenize  # pragma: no cover
        pos_tag = nltk.pos_tag  # pragma: no cover
    tk = tokenizer or _default_tokenizer()
    if isinstance(texts, str):
        texts = [texts]

    def get_order(pos: str) -> int:
        if pos.startswith("NN"):
            return 1
        if pos.startswith("JJ"):
            return 2
        if pos.startswith("VB"):
            return 3
        return 4

    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        words = list(word_tokenize(text))
        order_list = [get_order(tag) for _, tag in pos_tag(words)]
        sorted_ids = np.argsort(np.array(order_list))
        sampled_ids = sorted(sorted_ids[: context_length - 2])
        kept = [str(words[j]) for j in sampled_ids]
        tokens = [tk.sot_token_id] + list(tk.encode(" ".join(kept))) + [tk.eot_token_id]
        if len(tokens) > context_length:
            # some words encode to multiple BPE tokens (reference :378-381)
            tokens = tokens[:context_length]
            tokens[-1] = tk.eot_token_id
        result[i, : len(tokens)] = tokens
    return result


@functools.lru_cache()
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


def tokenize(texts: Union[str, List[str]], context_length: int = DEFAULT_CONTEXT_LENGTH) -> np.ndarray:
    return _default_tokenizer()(texts, context_length=context_length)


def decode(token_ids) -> str:
    return _default_tokenizer().decode(np.asarray(token_ids).tolist())


def get_tokenizer(model_name: str = "", context_length: Optional[int] = None, **kwargs):
    """Tokenizer factory keyed by model name (mirrors open_clip
    factory.get_tokenizer:84-126): configs with an ``hf_tokenizer_name``
    resolve a HuggingFace tokenizer (requires the tokenizer files locally —
    zero egress); everything else uses the CLIP BPE. ``tokenizer_kwargs``
    from the config's text_cfg (e.g. SigLIP's clean="canonicalize") merge
    under explicit kwargs."""
    text_cfg = {}
    if model_name:
        try:
            from xclip_tpu.models.factory import get_model_config

            text_cfg = (get_model_config(model_name) or {}).get("text_cfg", {})
        except Exception:
            text_cfg = {}
    tokenizer_kwargs = dict(text_cfg.get("tokenizer_kwargs", {}), **kwargs)
    if context_length is None:
        context_length = text_cfg.get("context_length", DEFAULT_CONTEXT_LENGTH)
    if text_cfg.get("hf_tokenizer_name"):
        from xclip_tpu.tokenizer.hf import HFTokenizer

        return HFTokenizer(text_cfg["hf_tokenizer_name"],
                           context_length=context_length, **tokenizer_kwargs)
    return SimpleTokenizer(context_length=context_length, **tokenizer_kwargs)
