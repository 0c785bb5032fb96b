"""Optimizers: AdamW with the reference's weight-decay param grouping.

Reference behaviour: deps/open_clip/src/training/main.py:311-326 — AdamW
where gains/biases (ndim < 2, or names containing bn/ln/bias/logit_scale)
get weight_decay=0. Here the same rule is a pytree mask fed to optax.adamw.

Also the supervised baseline's SGD(momentum, nesterov) + MultiStepLR
(reference: xclip/learner.py:66-86).
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
import optax


def _path_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def wd_mask(params) -> dict:
    """True where weight decay applies (reference exclude rule inverted:
    main.py:311-312 — exclude ndim<2 / bn / ln / bias / logit_scale)."""

    def decide(path, leaf):
        name = _path_name(path)
        excluded = (
            jnp.ndim(leaf) < 2
            or "bn" in name
            or "ln" in name
            or "bias" in name
            or "logit_scale" in name
        )
        return not excluded

    return jax.tree_util.tree_map_with_path(decide, params)


def adamw(
    learning_rate: Union[float, Callable],
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.2,
    grad_clip_norm: float = 0.0,
) -> optax.GradientTransformation:
    tx = optax.adamw(
        learning_rate,
        b1=beta1,
        b2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        mask=wd_mask,
    )
    if grad_clip_norm and grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def sgd_multistep(
    base_lr: float,
    *,
    momentum: float = 0.9,
    nesterov: bool = True,
    weight_decay: float = 1e-4,
    milestones=(30, 50, 70),
    gamma: float = 0.1,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """SGD + MultiStepLR for the supervised classifier baseline."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    schedule = optax.piecewise_constant_schedule(base_lr, boundaries)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=nesterov),
    )
