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


def lock_mask(
    params,
    *,
    lock_image: bool = False,
    lock_image_unlocked_groups: int = 0,
    lock_text: bool = False,
    lock_text_unlocked_layers: int = 0,
    lock_text_freeze_layer_norm: bool = True,
) -> dict:
    """LiT-style tower locking as a trainable mask (True = train).

    Reference behaviour: --lock-image/--lock-text wiring
    (training/main.py:268-276), VisionTransformer.lock groups
    (transformer.py:534-566: [stem+ln_pre], blocks[:-1], [last block +
    ln_post], proj — unlocked_groups keeps the last N trainable),
    ModifiedResNet.lock (modified_resnet.py:154-159: all-or-nothing), and
    text lock (hf_model.py:171: last N layers trainable, layer norms stay
    frozen when freeze_layer_norm)."""
    n_vis_blocks = len(params["visual"].get("blocks", ()))
    is_vit = n_vis_blocks > 0
    if lock_image and not is_vit and lock_image_unlocked_groups:
        raise ValueError("partial locking not currently supported for this model")
    n_text_blocks = len(params["text"]["blocks"])
    # ViT group ids: 0 = stem(conv1/class/pos/ln_pre), 1..n-1 = blocks[:-1],
    # n = last block + ln_post, n+1 = proj  -> total n+2 groups
    n_groups = n_vis_blocks + 2

    def decide(path, leaf):
        del leaf
        name = _path_name(path)
        parts = name.split(".")
        if parts[0] == "visual":
            if not lock_image:
                return True
            if not is_vit:
                return False
            if parts[1] == "blocks":
                idx = int(parts[2])
                group = n_vis_blocks if idx == n_vis_blocks - 1 else 1 + idx
            elif parts[1] == "ln_post":
                group = n_vis_blocks
            elif parts[1] == "proj":
                group = n_vis_blocks + 1
            else:  # conv1 / class_embedding / positional_embedding / ln_pre / attn_pool
                group = 0
            return group >= n_groups - lock_image_unlocked_groups
        if parts[0] == "text":
            if not lock_text:
                return True
            if parts[1] == "blocks" and int(parts[2]) >= n_text_blocks - lock_text_unlocked_layers:
                if lock_text_freeze_layer_norm and ("ln_1" in parts or "ln_2" in parts):
                    return False
                return True
            return False
        return True  # logit_scale & friends stay trainable

    return jax.tree_util.tree_map_with_path(decide, params)


def with_frozen(tx: optax.GradientTransformation, trainable_mask) -> optax.GradientTransformation:
    """Zero the updates of frozen leaves (requires_grad=False equivalent)."""
    frozen = jax.tree_util.tree_map(lambda t: not t, trainable_mask)
    return optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))


def sincos_freeze_mask(params) -> dict:
    """Trainable mask freezing the fixed sin-cos visual positional embedding
    (reference transformer.py:472-476 creates it with requires_grad=False).
    Combine with :func:`with_frozen`."""

    def decide(path, leaf):
        del leaf
        return _path_name(path) != "visual.positional_embedding"

    return jax.tree_util.tree_map_with_path(decide, params)


def adamw(
    learning_rate: Union[float, Callable],
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.2,
    grad_clip_norm: float = 0.0,
    mu_dtype=None,
) -> optax.GradientTransformation:
    # mu_dtype=bfloat16 stores the first moment in bf16 (halves its HBM
    # read+write in the fused update). Default None keeps fp32 — exact
    # parity with the reference torch.optim.AdamW (main.py:311-326).
    tx = optax.adamw(
        learning_rate,
        b1=beta1,
        b2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        mask=wd_mask,
        mu_dtype=mu_dtype,
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
