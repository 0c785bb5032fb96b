"""Dictionaries for circuit analysis: identity (neuron basis) and SAE basis.

Reference behaviour: xclip/feature_circuits/dictionary.py:7-54 — an
encode/decode ABC; ``IdentityDict`` is the identity "SAE" used for
neuron-level circuits (compute_circuits.py uses IdentityDicts for all 22
submodules). ``SAEDictionary`` exposes a trained SparseAutoencoder in the
same interface for feature-level circuits.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from xclip_tpu.sae.model import sae_apply


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
