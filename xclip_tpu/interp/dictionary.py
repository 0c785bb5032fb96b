"""Dictionaries for circuit analysis: identity (neuron basis) and SAE basis.

Reference behaviour: xclip/feature_circuits/dictionary.py:7-54 — an
encode/decode ABC; ``IdentityDict`` is the identity "SAE" used for
neuron-level circuits (compute_circuits.py uses IdentityDicts for all 22
submodules). ``SAEDictionary`` exposes a trained SparseAutoencoder in the
same interface for feature-level circuits.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from xclip_tpu.sae.model import sae_apply, sae_state_dict_to_params


class Dictionary:
    activation_dim: int
    dict_size: int

    def encode(self, x):
        raise NotImplementedError

    def decode(self, f):
        raise NotImplementedError

    def forward_for_sfc(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(x_hat, f) pair (the reference's hacked_forward_for_sfc)."""
        f = self.encode(x)
        return self.decode(f), f


class IdentityDict(Dictionary):
    """encode = decode = identity (reference dictionary.py:30-54)."""

    def __init__(self, activation_dim: int):
        self.activation_dim = activation_dim
        self.dict_size = activation_dim

    def encode(self, x):
        return x

    def decode(self, f):
        return f


class SAEDictionary(Dictionary):
    """Wrap trained SAE params (xclip_tpu.sae.model layout)."""

    def __init__(self, params: Dict):
        self.params = params
        w = params["encoder"]["weight"]
        self.dict_size = w.shape[-2]
        self.activation_dim = w.shape[-1]

    def encode(self, x):
        centered = x - self.params["tied_bias"]
        return jnp.maximum(
            centered @ self.params["encoder"]["weight"].T + self.params["encoder"]["bias"], 0.0
        )

    def decode(self, f):
        return f @ self.params["decoder"]["weight"].T + self.params["tied_bias"]

    def forward_for_sfc(self, x):
        learned, decoded = sae_apply(self.params, x)
        return decoded, learned


def load_sae_dictionary(path: str) -> SAEDictionary:
    """Load a trained SAE checkpoint (.pt torch state dict or .npz from
    xclip_tpu.sae.pipeline) as a circuit dictionary. Single-component
    checkpoints with a leading (1, ...) component axis are squeezed."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch

        sd = {
            k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in torch.load(path, map_location="cpu", weights_only=False).items()
        }
    params = sae_state_dict_to_params(sd)
    for holder, key in (
        (params, "tied_bias"),
        (params["encoder"], "weight"),
        (params["encoder"], "bias"),
        (params["decoder"], "weight"),
    ):
        v = holder[key]
        if v.ndim > (2 if key == "weight" else 1) and v.shape[0] == 1:
            holder[key] = v[0]
    return SAEDictionary(params)


def resolve_sae_checkpoint(sae_dir: str, submodule: str) -> Optional[str]:
    """Find the checkpoint for ``submodule`` under ``sae_dir``. Accepts a
    flat ``{submodule}.pt``/``.npz`` or the training pipeline's nested
    ``{submodule}/checkpoints/sparse_autoencoder_final.{pt,npz}`` layout."""
    candidates = [
        os.path.join(sae_dir, f"{submodule}.pt"),
        os.path.join(sae_dir, f"{submodule}.npz"),
        os.path.join(sae_dir, submodule, "checkpoints", "sparse_autoencoder_final.pt"),
        os.path.join(sae_dir, submodule, "checkpoints", "sparse_autoencoder_final.npz"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None
