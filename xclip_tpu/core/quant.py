"""Int8 linear-layer quantization for the transformer MLPs — the TPU-native
equivalent of the reference's bitsandbytes path.

Reference surface (deps/open_clip/src/open_clip/utils.py:64-90 +
training/main.py:251-259,422-425): ``--use-bnb-linear SwitchBackLinear*``
replaces the ``c_fc``/``c_proj`` MLP linears with triton int8 SwitchBack
modules — int8 forward matmul, 16-bit backward (Wortsman et al.,
arXiv:2304.13013) — and eval-only runs convert them to inference mode
(weights stored int8).

TPU-native design: the v5e MXU runs int8 x int8 -> int32 contractions at
double the bf16 rate, so both modes lower onto
``lax.dot_general(..., preferred_element_type=int32)``:

- **Inference mode** (``quantize_params``): weights pre-quantized per output
  channel into ``{"kernel_int8", "scale"}`` leaves; activations quantized
  dynamically per token at call time. ``models/layers.py:linear_apply``
  dispatches on the ``kernel_int8`` key, so any pytree produced here runs
  int8 wherever the caller put it (default: the reference's
  ``include_modules=['c_fc', 'c_proj']``).
- **Training mode** (``switchback_linear_apply``): SwitchBackLinearGlobal —
  per-tensor weight scale + per-token activation scale in the int8 forward,
  straight-through backward against the *dequantized* weight in the working
  dtype (the reference's 16-bit backward), via ``jax.custom_vjp``. Enabled
  globally with ``set_switchback`` (mirrors the reference's model surgery;
  scoped to the MLP linears by ``models/transformer.py:block_apply``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_SWITCHBACK = False


def set_switchback(enabled: bool) -> None:
    """Enable SwitchBack int8 training matmuls for the transformer MLP
    linears (re-jit happens naturally: callers trace after CLI parsing)."""
    global _SWITCHBACK
    _SWITCHBACK = bool(enabled)


def switchback_enabled() -> bool:
    return _SWITCHBACK


# ---------------------------------------------------------------------------
# weight quantization


def quantize_weight(kernel, axis=0):
    """Symmetric per-output-channel int8: returns (int8 kernel, fp32 scale
    broadcastable against the output axis)."""
    amax = jnp.max(jnp.abs(kernel), axis=axis, keepdims=False)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_linear_params(p):
    """{"kernel", "bias"?} -> {"kernel_int8", "scale", "bias"?}."""
    q, scale = quantize_weight(p["kernel"], axis=0)
    out = {"kernel_int8": q, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_params(params, include=("c_fc", "c_proj")):
    """Walk a param pytree and quantize every linear whose dict key is in
    ``include`` — the reference's ``replace_linear(include_modules=...)``
    (utils.py:65) applied to the state tree instead of the module tree."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k in include and isinstance(v, dict) and "kernel" in v
                        and getattr(v["kernel"], "ndim", 0) == 2):
                    out[k] = quantize_linear_params(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# int8 matmul core (shared by both modes)


def _quantize_act(x):
    """Dynamic symmetric per-token activation scale."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_matmul(x, kernel_q, w_scale):
    """x (..., in) fp -> (..., out) fp32 via int8 x int8 -> int32 on the MXU."""
    xq, s_x = _quantize_act(x)
    acc = lax.dot_general(
        xq, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s_x * w_scale


def int8_linear_apply(params, x, *, dtype=None):
    """Inference-mode linear on a pre-quantized {"kernel_int8","scale"} leaf."""
    y = _int8_matmul(x, params["kernel_int8"], params["scale"])
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    out_dtype = dtype or (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                          else jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# SwitchBack training matmul


@jax.custom_vjp
def switchback_matmul(x, kernel):
    # SwitchBackLinearGlobal forward: per-TENSOR weight scale (the "Global"
    # variant), per-token activation scale, int8 contraction
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel)), 1e-8).astype(jnp.float32) / 127.0
    wq = jnp.clip(jnp.round(kernel.astype(jnp.float32) / s_w), -127, 127
                  ).astype(jnp.int8)
    return _int8_matmul(x, wq, s_w).astype(x.dtype)


def _switchback_fwd(x, kernel):
    return switchback_matmul(x, kernel), (x, kernel)


def _switchback_bwd(res, g):
    # 16-bit backward (arXiv:2304.13013 eq. 6): grads flow through the
    # dequantized weight — straight-through on the rounding, computed in the
    # working dtype like the reference's triton kernels
    x, kernel = res
    dx = jnp.dot(g, kernel.astype(g.dtype).T).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jnp.dot(x2.T, g2, preferred_element_type=jnp.float32
                 ).astype(kernel.dtype)
    return dx, dw


switchback_matmul.defvjp(_switchback_fwd, _switchback_bwd)


def switchback_linear_apply(params, x, *, dtype=None):
    kernel = params["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    y = switchback_matmul(x, kernel)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y
