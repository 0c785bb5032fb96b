"""Shared init + state-dict bridge helpers for the native timm towers.

Every family maps the same three primitive layouts between JAX pytrees and
torch/timm state dicts:

- Linear: torch ``weight`` (out, in) <-> kernel (in, out), optional bias
- LayerNorm: torch ``weight``/``bias`` <-> scale/bias
- Conv2d: torch OIHW <-> HWIO kernel, optional bias

and initializes with timm's trunc-normal(0.02) + zero bias.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def trunc_init(rng, shape, std: float = 0.02):
    return std * jax.random.truncated_normal(rng, -2, 2, shape, jnp.float32)


def linear_init(rng, din: int, dout: int, *, bias: bool = True, std: float = 0.02) -> Dict:
    p = {"kernel": trunc_init(rng, (din, dout), std)}
    if bias:
        p["bias"] = jnp.zeros((dout,), jnp.float32)
    return p


# -- writers (pytree -> torch-layout state dict) ----------------------------


def write_ln(sd: Dict, dst: str, p: Dict) -> None:
    sd[f"{dst}.weight"] = np.asarray(p["scale"])
    sd[f"{dst}.bias"] = np.asarray(p["bias"])


def write_linear(sd: Dict, dst: str, p: Dict) -> None:
    sd[f"{dst}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{dst}.bias"] = np.asarray(p["bias"])


def write_conv(sd: Dict, dst: str, p: Dict) -> None:
    sd[f"{dst}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        sd[f"{dst}.bias"] = np.asarray(p["bias"])


# -- readers (torch-layout state dict -> pytree) ----------------------------


def read_ln(sd: Dict, src: str) -> Dict:
    return {"scale": jnp.asarray(np.asarray(sd[f"{src}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{src}.bias"]))}


def read_linear(sd: Dict, src: str) -> Dict:
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{src}.weight"]).T)}
    if f"{src}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{src}.bias"]))
    return p


def read_conv(sd: Dict, src: str) -> Dict:
    p = {"kernel": jnp.asarray(np.transpose(np.asarray(sd[f"{src}.weight"]), (2, 3, 1, 0)))}
    if f"{src}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{src}.bias"]))
    return p
