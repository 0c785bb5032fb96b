"""SAE training/validation metrics.

Reference behaviour: deps/sparse_autoencoder/sparse_autoencoder/metrics/ —
train: L0 norm (l0_norm_metric.py), batch feature density
(feature_density.py), capacity (capacity.py, Scherlis et al. 2022), neuron
activity (neuron_activity_metric.py); validate: model reconstruction score
(model_reconstruction_score.py).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def l0_norm(learned_activations) -> jnp.ndarray:
    """Mean number of firing features per sample (train L0 metric)."""
    return jnp.mean(jnp.sum(learned_activations > 0, axis=-1).astype(jnp.float32))


def feature_density(learned_activations, threshold: float = 0.0) -> jnp.ndarray:
    """Fraction of samples each feature fired in -> ([components,] m)."""
    fired = (learned_activations > threshold).astype(jnp.float32)
    return jnp.mean(fired, axis=0)


def capacities(features) -> jnp.ndarray:
    """Per-sample capacity: diag(G^2) / rowsum(G^2) with G the batch gram of
    learned features (reference capacity.py:34-73). 1 for orthogonal
    features, 1/n for identical ones. ``features``: (batch, [components,] m).
    Returns ([components,] batch)."""
    if features.ndim == 2:
        features = features[:, None, :]
    gram = jnp.einsum("bcm,dcm->cbd", features, features) ** 2
    total = jnp.sum(gram, axis=-1)
    diag = jnp.diagonal(gram, axis1=1, axis2=2)
    caps = diag / total
    return caps[0] if caps.shape[0] == 1 else caps


def neuron_activity(learned_activations) -> jnp.ndarray:
    """Number of times each neuron fired in the batch -> ([components,] m)."""
    return jnp.sum(learned_activations > 0, axis=0)


def model_reconstruction_score(
    source_loss: np.ndarray,
    loss_with_reconstruction: np.ndarray,
    loss_with_zero_ablation: np.ndarray,
) -> Dict[str, float]:
    """(l_zero - l_recon) / (l_zero - l), itemwise-mean (reference
    model_reconstruction_score.py)."""
    source_loss = np.asarray(source_loss, np.float64)
    recon = np.asarray(loss_with_reconstruction, np.float64)
    zero = np.asarray(loss_with_zero_ablation, np.float64)
    if source_loss.size == 0:
        return {}
    itemwise = (zero - recon) / (zero - source_loss)
    return {
        "source_model_loss": float(source_loss.mean()),
        "source_model_loss_with_reconstruction": float(recon.mean()),
        "source_model_loss_with_zero_ablation": float(zero.mean()),
        "model_reconstruction_score": float(itemwise.mean()),
    }


def train_metrics(source, learned, decoded) -> Dict[str, jnp.ndarray]:
    """The default train metric bundle logged per window (reference
    metrics_container.default_metrics)."""
    return {
        "learned_activations_l0_norm": l0_norm(learned),
        "mean_feature_density": jnp.mean(feature_density(learned)),
        "mean_capacity": jnp.mean(capacities(learned)),
    }
