"""Discover-then-Name concept naming for SAE features.

Reference behaviour: xclip/sparse_autoencoder/method.py:140-399
(DiscoverThenName) + scripts/name_concepts.py — normalize the SAE decoder
dictionary columns, dot against CLIP text embeddings of a vocabulary, and
name each feature by its argmax concept; config strings like
``lr0.0005_l1coeff3e-05_ef8_...`` are parsed by ``decode_sae_config``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np


def decode_sae_config(sae_config: str) -> Dict:
    """Parse an SAE run-config string (reference _decode_config:307-329)."""
    out: Dict = {}
    for item in sae_config.split("_"):
        if item.startswith("lr"):
            out["lr"] = float(item[2:])
        elif item.startswith("l1coeff"):
            out["l1_coeff"] = float(item[7:])
        elif item.startswith("ef"):
            out["expansion_factor"] = int(item[2:])
        elif item.startswith("rf"):
            out["resample_freq"] = int(item[2:])
        elif item.startswith("hook"):
            out["hook_points"] = [item[4:]]
        elif item.startswith("bs"):
            out["train_sae_bs"] = int(item[2:])
        elif item.startswith("epo"):
            out["num_epochs"] = int(item[3:])
        else:
            raise ValueError(f"Invalid SAE config item: {item}")
    return out


def embed_vocab(model, params, tokenizer, concept_names: Sequence[str],
                batch_size: int = 256) -> np.ndarray:
    """Normalized CLIP text embeddings of a concept vocabulary (reference
    name_concepts.save_activations)."""
    from xclip_tpu.evals.zero_shot import encode_texts_batched

    tokens = tokenizer(list(concept_names))
    return encode_texts_batched(model, params, tokens, batch_size=batch_size)


def concept_name_similarity_matrix(sae_params: Dict, vocab_embeddings: np.ndarray) -> np.ndarray:
    """(vocab, n_features) similarity: vocab embeddings x unit-norm decoder
    columns (reference get_concept_name_similarity_matrix:221-229)."""
    dic = np.asarray(sae_params["decoder"]["weight"], np.float32)
    if dic.ndim == 3:  # components axis
        dic = dic[0]
    dic = dic / np.maximum(np.linalg.norm(dic, axis=0, keepdims=True), 1e-12)
    return np.asarray(vocab_embeddings, np.float32) @ dic


class DiscoverThenName:
    """Names every SAE feature by its most-similar vocabulary concept."""

    def __init__(self, sae_params: Dict, vocab_embeddings: np.ndarray, vocab_texts: Sequence[str]):
        self.sae_params = sae_params
        self.vocab_embeddings = np.asarray(vocab_embeddings, np.float32)
        self.vocab_texts = list(vocab_texts)

    def get_concept_name_similarity_matrix(self) -> np.ndarray:
        return concept_name_similarity_matrix(self.sae_params, self.vocab_embeddings)

    def get_concept_names(self) -> List[str]:
        sim = self.get_concept_name_similarity_matrix()
        top = sim.argmax(axis=0)
        return [self.vocab_texts[i] for i in top]

    def get_concepts_from_features(self, x) -> np.ndarray:
        from xclip_tpu.sae.model import sae_apply

        learned, _ = sae_apply(self.sae_params, jnp.asarray(x, jnp.float32))
        learned = np.asarray(learned)
        return learned[:, 0] if learned.ndim == 3 else learned

    def write_concept_names_csv(self, path: str) -> List[str]:
        names = self.get_concept_names()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            for idx, name in enumerate(names):
                fh.write(f"{idx},{name}\n")
        return names


def load_concept_names(sae_dir: str) -> List[str]:
    """Read concepts/concept_names.csv (reference analyze_sae_features.py:30-32)."""
    with open(os.path.join(sae_dir, "concepts", "concept_names.csv")) as fh:
        return [line.split(",")[1].strip() for line in fh.readlines()]
