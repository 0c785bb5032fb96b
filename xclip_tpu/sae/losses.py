"""SAE losses: L1 sparsity penalty + L2 reconstruction, summed.

Reference behaviour: deps/sparse_autoencoder/sparse_autoencoder/loss/
learned_activations_l1.py (itemwise sum(|learned|) * l1_coefficient),
decoded_activations_l2.py (itemwise MSE, feature-mean reduction by default),
reducer.py (sum of child losses), abstract_loss.py (batch-mean reduction).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SAELossCfg:
    l1_coefficient: float = 1e-4
    l2_reduction: str = "mean"  # 'mean' (reference default) or 'sum' over features


def itemwise_losses(cfg: SAELossCfg, source, learned, decoded) -> Dict[str, jnp.ndarray]:
    """Per-item loss components, shapes (batch, [components])."""
    abs_loss = jnp.sum(jnp.abs(learned), axis=-1)
    l1_penalty = cfg.l1_coefficient * abs_loss
    sq_err = (source - decoded) ** 2
    l2 = jnp.mean(sq_err, axis=-1) if cfg.l2_reduction == "mean" else jnp.sum(sq_err, axis=-1)
    return {
        "learned_activations_l1_loss": abs_loss,
        "learned_activations_l1_loss_penalty": l1_penalty,
        "l2_reconstruction_loss": l2,
        "total_loss": l1_penalty + l2,
    }


def sae_loss(cfg: SAELossCfg, source, learned, decoded) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Scalar training loss (batch mean of l1_penalty + l2) + per-term
    scalar metrics (the reference's 4-way loss vector)."""
    items = itemwise_losses(cfg, source, learned, decoded)
    metrics = {k: jnp.mean(v) for k, v in items.items()}
    return metrics["total_loss"], metrics


def loss_per_item(cfg: SAELossCfg, source, learned, decoded) -> jnp.ndarray:
    """Total loss per item — the resampler's importance weights
    (activation_resampler.py:200-263)."""
    return itemwise_losses(cfg, source, learned, decoded)["total_loss"]
