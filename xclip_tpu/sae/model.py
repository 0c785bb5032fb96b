"""Sparse autoencoder: tied-bias -> ReLU encoder -> unit-norm decoder.

Reference behaviour: deps/sparse_autoencoder/sparse_autoencoder/autoencoder/
model.py:24-179 (SparseAutoencoder), components/linear_encoder.py (kaiming
init, forward :135), components/unit_norm_decoder.py (column unit-norm
constraint + parallel-gradient removal hook), components/tied_bias.py
(pre-encoder subtract / post-decoder add).

Param layout matches the torch state dict (encoder weight (M, D), decoder
weight (D, M)) so reference SAE checkpoints load directly; an optional
leading components axis mirrors ``n_components``. All ops are single fused
MXU matmuls under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SAECfg:
    n_input_features: int
    n_learned_features: int
    n_components: Optional[int] = None


def sae_init(rng, cfg: SAECfg, geometric_median: Optional[np.ndarray] = None) -> Dict:
    """Initialize params (kaiming-uniform encoder, unit-norm decoder columns,
    tied bias = geometric median of the dataset when given)."""
    c = () if cfg.n_components is None else (cfg.n_components,)
    d, m = cfg.n_input_features, cfg.n_learned_features
    k_enc, k_encb, k_dec = jax.random.split(rng, 3)

    # kaiming_uniform_(nonlinearity='relu'): bound = sqrt(6 / fan_in), fan_in = d
    bound_w = np.sqrt(6.0 / d)
    enc_w = jax.random.uniform(k_enc, (*c, m, d), jnp.float32, -bound_w, bound_w)
    bound_b = 1.0 / np.sqrt(d)
    enc_b = jax.random.uniform(k_encb, (*c, m), jnp.float32, -bound_b, bound_b)

    dec_w = jax.random.uniform(k_dec, (*c, d, m), jnp.float32, -np.sqrt(6.0 / m), np.sqrt(6.0 / m))
    dec_w = dec_w / jnp.linalg.norm(dec_w, axis=-2, keepdims=True)

    tied = jnp.zeros((*c, d), jnp.float32)
    if geometric_median is not None:
        tied = jnp.broadcast_to(jnp.asarray(geometric_median, jnp.float32), tied.shape)
    return {
        "tied_bias": tied,
        "encoder": {"weight": enc_w, "bias": enc_b},
        "decoder": {"weight": dec_w},
    }


def sae_apply(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass -> (learned_activations, decoded_activations).

    ``x`` is (batch, [components,] d)."""
    centered = x - params["tied_bias"]
    learned = jax.nn.relu(
        jnp.einsum("...d,...md->...m", centered, params["encoder"]["weight"],
                   preferred_element_type=jnp.float32)
        + params["encoder"]["bias"]
    )
    decoded = jnp.einsum("...m,...dm->...d", learned, params["decoder"]["weight"],
                         preferred_element_type=jnp.float32)
    return learned, decoded + params["tied_bias"]


def constrain_decoder_unit_norm(params: Dict) -> Dict:
    """Post-step projection of decoder columns back to unit norm (reference
    post_backwards_hook -> constrain_weights_unit_norm)."""
    w = params["decoder"]["weight"]
    norms = jnp.linalg.norm(w, axis=-2, keepdims=True)
    params = dict(params)
    params["decoder"] = {"weight": w / jnp.maximum(norms, 1e-12)}
    return params


def remove_parallel_gradient(params: Dict, grads: Dict) -> Dict:
    """Remove the gradient component parallel to each decoder dictionary
    vector before the optimizer step (reference _weight_backward_hook)."""
    w = params["decoder"]["weight"]
    g = grads["decoder"]["weight"]
    # project per column (axis -2 is the feature dim d)
    dot = jnp.sum(g * w, axis=-2, keepdims=True)
    norm_sq = jnp.maximum(jnp.sum(w * w, axis=-2, keepdims=True), 1e-12)
    grads = dict(grads)
    grads["decoder"] = {"weight": g - dot / norm_sq * w}
    return grads


# ---------------------------------------------------------------------------
# torch checkpoint bridge


def sae_state_dict_to_params(sd: Dict[str, np.ndarray], cfg: Optional[SAECfg] = None) -> Dict:
    """Map a reference SAE torch state dict onto our params (identical
    layouts; handles both private `_weight` and public `weight` key forms)."""

    def get(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], np.float32)
        raise KeyError(names)

    return {
        "tied_bias": jnp.asarray(get("tied_bias"), jnp.float32),
        "encoder": {
            "weight": jnp.asarray(get("encoder._weight", "encoder.weight"), jnp.float32),
            "bias": jnp.asarray(get("encoder._bias", "encoder.bias"), jnp.float32),
        },
        "decoder": {
            "weight": jnp.asarray(get("decoder._weight", "decoder.weight"), jnp.float32),
        },
    }


def sae_params_to_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    return {
        "tied_bias": np.asarray(params["tied_bias"]),
        "encoder._weight": np.asarray(params["encoder"]["weight"]),
        "encoder._bias": np.asarray(params["encoder"]["bias"]),
        "decoder._weight": np.asarray(params["decoder"]["weight"]),
    }
