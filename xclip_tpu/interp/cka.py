"""Centered Kernel Alignment (CKA) representational similarity.

Reference behaviour: scripts/representational_analysis.py:150-228 — linear
and RBF-kernel CKA with the unbiased HSIC1 estimator (Song et al. 2012),
computed on class-mean activations in float64.

Jitted jnp implementation: gram matrices and the HSIC trace terms are single
MXU matmuls; float64 is emulated via fp32 pairs is unnecessary at the
class-mean scale (<=345x345 grams), so computation runs in fp64 on CPU or
fp32 on TPU — tolerance-tested against the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def rbf_kernel(x: jnp.ndarray, sigma: Optional[float] = None) -> jnp.ndarray:
    """RBF gram matrix with the reference's median-distance bandwidth
    heuristic (representational_analysis.py:160-173)."""
    gram = x @ x.T
    sq_norms = jnp.diag(gram)
    dists = sq_norms[:, None] - 2 * gram + sq_norms[None, :]
    if sigma is None:
        sigma_sq = jnp.median(dists)
        sigma_sq = jnp.where(sigma_sq <= 0, 1.0, sigma_sq)
    else:
        sigma_sq = sigma**2
    return jnp.exp(-0.5 * dists / sigma_sq)


def hsic0(k: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    """Biased HSIC estimator."""
    n = k.shape[0]
    h = jnp.eye(n, dtype=k.dtype) - jnp.ones((n, n), k.dtype) / n
    return jnp.trace(k @ h @ l @ h) / (n - 1) ** 2


def hsic1(k: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    """Unbiased HSIC1 estimator (Song et al. 2012; reference :184-199)."""
    n = k.shape[0]
    k_t = k - jnp.diag(jnp.diag(k))
    l_t = l - jnp.diag(jnp.diag(l))
    kl = k_t @ l_t
    trace_term = jnp.trace(kl)
    constant_term = jnp.sum(k_t) * jnp.sum(l_t) / ((n - 1) * (n - 2))
    cross_term = 2.0 / (n - 2) * jnp.sum(kl)
    return (trace_term + constant_term - cross_term) / (n * (n - 3))


def cka_from_grams(k: jnp.ndarray, l: jnp.ndarray, hsic=hsic1) -> jnp.ndarray:
    return hsic(k, l) / jnp.sqrt(hsic(k, k) * hsic(l, l))


def linear_cka(x: np.ndarray, y: np.ndarray, hsic=hsic1) -> float:
    x = jnp.asarray(x, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    y = jnp.asarray(y, x.dtype)
    return float(cka_from_grams(x @ x.T, y @ y.T, hsic))


def kernel_cka(x: np.ndarray, y: np.ndarray, hsic=hsic1, sigma: Optional[float] = None) -> float:
    x = jnp.asarray(x, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    y = jnp.asarray(y, x.dtype)
    return float(cka_from_grams(rbf_kernel(x, sigma), rbf_kernel(y, sigma), hsic))


def class_mean_activations(acts: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Mean activation per class (the reference evaluates CKA on class means,
    :337-412). Returns (n_present_classes, features)."""
    classes = np.unique(labels)
    return np.stack([acts[labels == c].mean(axis=0) for c in classes])
