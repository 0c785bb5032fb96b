"""Per-step LR schedules (pure step -> lr functions).

Reference behaviour: deps/open_clip/src/training/scheduler.py:13-53 —
linear warmup into cosine / constant / constant+cooldown, evaluated every
optimizer step. Here schedules are pure functions usable directly as optax
learning-rate schedules (traced inside the jitted train step, so LR updates
cost nothing on the host).
"""

from __future__ import annotations

import jax.numpy as jnp


def _warmup(base_lr: float, warmup_length: int, step):
    return base_lr * (step + 1) / max(warmup_length, 1)


def cosine_lr(base_lr: float, warmup_length: int, steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = _warmup(base_lr, warmup_length, step)
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, warm, cos)

    return schedule


def const_lr(base_lr: float, warmup_length: int, steps: int = 0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), base_lr)

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = _warmup(base_lr, warmup_length, step)
        start_cooldown = steps - cooldown_steps
        e = jnp.maximum(step - start_cooldown, 0.0)
        es = max(steps - start_cooldown, 1)
        decay = (1 - e / es) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup_length, warm, lr)

    return schedule


def get_scheduler(name: str, base_lr: float, warmup: int, total_steps: int, **kw):
    if name == "cosine":
        return cosine_lr(base_lr, warmup, total_steps)
    if name == "const":
        return const_lr(base_lr, warmup, total_steps)
    if name == "const-cooldown":
        return const_lr_cooldown(base_lr, warmup, total_steps, **kw)
    raise ValueError(f"unknown scheduler {name!r}")
