"""Zero-shot classifiers (prompt ensembles -> cosine logits).

Reference behaviour: xclip/zero_shot.py — ``ZeroShotClassifier`` (one prompt
per class) and ``OpenAIZeroShotClassifier`` (86-template ensemble,
per-class mean-then-renormalize, xclip/zero_shot.py:224-240), plus
open_clip's batched builder (deps/open_clip/src/open_clip/
zero_shot_classifier.py:21-68).

TPU design: all class prompts are tokenized host-side into one
(num_classes*num_templates, 77) array and encoded in a single jitted batched
pass (the reference loops per class); the ensemble mean/renormalize is a
reshape+reduce on device. Prediction is one (B, E) x (E, C) matmul.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.evals.metadata import DOMAIN_TEMPLATE_KEYWORDS, XCLIP_OPENAI_TEMPLATES


def _l2(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def encode_texts_batched(model, params, token_ids: np.ndarray, *, batch_size: int = 1024, dtype=None):
    """Encode a big token array in fixed-size jitted chunks (pads the tail so
    one compiled program serves every chunk)."""

    @jax.jit
    def _enc(p, ids):
        feats, _ = model.encode_text(p, ids, normalize=True, dtype=dtype)
        return feats

    n = token_ids.shape[0]
    out = []
    for i in range(0, n, batch_size):
        chunk = token_ids[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)])
        feats = np.asarray(_enc(params, chunk))
        out.append(feats[: batch_size - pad] if pad else feats)
    return np.concatenate(out, axis=0)


class ZeroShotClassifier:
    """Single-prompt-per-class zero-shot head (xclip/zero_shot.py:84-109)."""

    def __init__(
        self,
        model,
        params,
        tokenizer,
        idx2class: Union[Dict[int, str], List[str]],
        prompt_fn: Callable[[str], str] = lambda s: s,
        dtype=None,
    ):
        classnames = [idx2class[i] for i in range(len(idx2class))]
        tokens = tokenizer([prompt_fn(c) for c in classnames])
        self.prompt_feat = encode_texts_batched(model, params, tokens, dtype=dtype)  # (C, E)

    def predict_from_features(self, img_feat: np.ndarray, return_scores: bool = False):
        scores = np.asarray(img_feat) @ self.prompt_feat.T
        return {"pred": scores if return_scores else scores.argmax(axis=1)}


class OpenAIZeroShotClassifier:
    """86-template prompt-ensemble classifier (xclip/zero_shot.py:112-240).

    Per class: encode all templates, L2-normalize, mean over templates,
    re-normalize -> one class embedding; ensemble computed in a single
    batched device pass.
    """

    templates = XCLIP_OPENAI_TEMPLATES

    def __init__(
        self,
        model,
        params,
        tokenizer,
        idx2class: Union[Dict[int, str], List[str]],
        domain_invariant: bool = False,
        templates: Optional[Sequence[str]] = None,
        dtype=None,
        batch_size: int = 2048,
    ):
        tpls = list(templates if templates is not None else self.templates)
        if domain_invariant:
            tpls = [t for t in tpls if any(k in t for k in DOMAIN_TEMPLATE_KEYWORDS)]
        classnames = [idx2class[i] for i in range(len(idx2class))]
        texts = [t.format(c) for c in classnames for t in tpls]
        tokens = tokenizer(texts)
        feats = encode_texts_batched(model, params, tokens, batch_size=batch_size, dtype=dtype)
        feats = feats.reshape(len(classnames), len(tpls), -1)
        mean = feats.mean(axis=1)
        self.prompt_feat = np.asarray(_l2(jnp.asarray(mean)))  # (C, E)

    def predict_from_features(self, img_feat: np.ndarray, return_scores: bool = False):
        scores = np.asarray(img_feat, dtype=self.prompt_feat.dtype) @ self.prompt_feat.T
        return {"pred": scores if return_scores else scores.argmax(axis=1)}


def build_zero_shot_classifier(
    model,
    params,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence,
    *,
    dtype=None,
    batch_size: int = 2048,
) -> np.ndarray:
    """open_clip-style builder returning the (E, C) classifier matrix
    (reference: zero_shot_classifier.py:21-68). ``templates`` may be format
    strings or callables."""
    fmt = [t if callable(t) else t.format for t in templates]
    texts = [f(c) for c in classnames for f in fmt]
    tokens = tokenizer(texts)
    feats = encode_texts_batched(model, params, tokens, batch_size=batch_size, dtype=dtype)
    feats = feats.reshape(len(classnames), len(fmt), -1).mean(axis=1)
    feats = np.asarray(_l2(jnp.asarray(feats)))
    return feats.T  # (E, C)
