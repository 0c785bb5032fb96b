"""Functional neural-net primitives over plain param pytrees.

Every layer is a pair of pure functions: ``*_init(rng, ...) -> params`` and
``*_apply(params, x, ...) -> y``. Parameters follow JAX conventions —
linear kernels are ``(in, out)``, conv kernels are HWIO, images are NHWC —
which map directly onto the TPU MXU; the torch checkpoint bridge
(xclip_tpu/core/checkpoint.py) performs the layout transposes.

Norm layers compute in fp32 regardless of the activation dtype and cast back,
matching the reference LayerNorm/LayerNormFp32 semantics
(deps/open_clip/src/open_clip/transformer.py:15-30).
"""

from __future__ import annotations

from typing import Optional, Tuple

import os as _os

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# activations


def quick_gelu(x):
    """x * sigmoid(1.702 x) — the activation OpenAI CLIP was trained with."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x):
    # torch nn.GELU defaults to the exact (erf) formulation.
    return jax.nn.gelu(x, approximate=False)


ACT_FNS = {"gelu": gelu, "quick_gelu": quick_gelu, "relu": jax.nn.relu}


# ---------------------------------------------------------------------------
# linear


def linear_init(rng, in_dim: int, out_dim: int, *, bias: bool = True, std: Optional[float] = None):
    wkey, _ = jax.random.split(rng)
    if std is None:
        # torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))
        bound = 1.0 / np.sqrt(in_dim)
        kernel = jax.random.uniform(wkey, (in_dim, out_dim), jnp.float32, -bound, bound)
    else:
        kernel = jax.random.normal(wkey, (in_dim, out_dim), jnp.float32) * std
    params = {"kernel": kernel}
    if bias:
        params["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def linear_apply(params, x, *, dtype=None):
    if "kernel_int8" in params:
        # inference-mode int8 leaf produced by core.quant.quantize_params
        # (the reference's convert_int8_model_to_inference_mode, utils.py:84)
        from ..core.quant import int8_linear_apply

        return int8_linear_apply(params, x, dtype=dtype)
    kernel = params["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    if x.dtype == jnp.bfloat16:
        # MXU accumulates fp32 internally; emitting bf16 directly avoids a
        # separate fp32 buffer + convert pass (convert fusions measured at
        # ~20% of the RN50 train step)
        y = jnp.dot(x, kernel)
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        return y
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# layer norm


def layernorm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm_apply(params, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    if _os.environ.get("XCLIP_LN_BF16") == "1" and orig_dtype == jnp.bfloat16:
        # perf A/B: stats in fp32 (above), normalize+affine in bf16 so the
        # wide tensor never materializes in fp32 on either side of the
        # autodiff. Off by default — costs ~0.4% relative error, outside
        # the 2e-3 golden-parity tolerance.
        inv = jax.lax.rsqrt(var + eps)
        y = ((x32 - mean) * inv).astype(orig_dtype)
        return y * params["scale"].astype(orig_dtype) + params["bias"].astype(orig_dtype)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# conv2d (NHWC x HWIO)


def conv_init(rng, in_ch: int, out_ch: int, kernel_size: int, *, bias: bool = False):
    fan_in = in_ch * kernel_size * kernel_size
    bound = 1.0 / np.sqrt(fan_in)
    kernel = jax.random.uniform(
        rng, (kernel_size, kernel_size, in_ch, out_ch), jnp.float32, -bound, bound
    )
    params = {"kernel": kernel}
    if bias:
        params["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return params


def _conv1x1_as_dot() -> bool:
    """A/B gate (XCLIP_1X1_DOT=1): lower 1x1 convs to explicit
    (N*H*W, Cin) @ (Cin, Cout) matmuls. TPU XLA output-fuses elementwise
    consumers into ``dot`` fusions but not into ``convolution`` (round-2
    compiled-HLO finding, TODO.md) — as a dot, the trailing BN/ReLU chain
    can ride the matmul epilogue and skip an HBM round-trip over the
    block's widest tensor. Same contraction, same MXU fp32 accumulation."""
    return _os.environ.get("XCLIP_1X1_DOT", "0") == "1"


def conv_apply(params, x, *, stride: int = 1, padding: int = 0, dtype=None):
    kernel = params["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    if kernel.shape[0] == kernel.shape[1] == 1 and padding == 0 and _conv1x1_as_dot():
        if stride != 1:
            x = x[:, ::stride, ::stride, :]
        b, h, w, cin = x.shape
        y = jnp.dot(x.reshape(b * h * w, cin), kernel[0, 0]).reshape(b, h, w, -1)
    else:
        # no preferred_element_type: the MXU accumulates bf16 convs in fp32
        # internally, and the conv transpose (backward) rule requires uniform
        # operand dtypes.
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride, stride),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def conv_s2d_apply(params, x, *, dtype=None):
    """A 3x3 / stride-2 / pad-1 conv re-expressed as a 2x2 / stride-1 conv
    over the 2x2 space-to-depth input — identical math, but the MXU sees
    4x the input channels (3 -> 12 lanes) at a quarter of the spatial
    extent instead of a stride-2 window over a 3-channel image. Classic
    TPU resnet-stem rewrite; the kernel transform happens at trace time so
    checkpoints keep the reference (3,3,Cin,Cout) layout.

    Derivation: out[i,j] = sum_{dy,dx} x[2i+dy-1, 2j+dx-1] K[dy,dx] and
    x[2p+u, 2q+v] = xs2d[p, q, (u,v)]; so dy = 2a+u-1 with a in {0,1} over
    s2d rows {i-1, i} -> kernel size 2 with pad (1,0), entries
    K2[a,b,(u,v,c)] = K[2a+u-1, 2b+v-1, c] (zero outside the 3x3 taps).
    """
    kernel = params["kernel"]
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, "space-to-depth rewrite expects a 3x3 kernel"
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    b, h, w, _ = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # dy=-1 -> row 0
    k2 = kp.reshape(2, 2, 2, 2, cin, cout)       # (a, u, b, v, c, o)
    k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, cout)
    y = jax.lax.conv_general_dilated(
        xs, k2, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def avg_pool(x, window: int):
    """Non-overlapping average pool over NHWC spatial dims (native dtype —
    summing <=window^2 values loses no meaningful precision in bf16 and
    halves HBM traffic vs an fp32 round-trip)."""
    y = jax.lax.reduce_window(
        x,
        np.zeros((), x.dtype),
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, window, window, 1),
        padding="VALID",
    )
    return y * np.asarray(1.0 / (window * window), x.dtype)


# ---------------------------------------------------------------------------
# batch norm (non-synced across devices, matching reference DDP default)


def batchnorm_init(dim: int):
    params = {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batchnorm_apply(
    params,
    state,
    x,
    *,
    train: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm over the channel (last) axis of NHWC inputs.

    Training uses per-device batch statistics (the reference trains DDP
    without SyncBatchNorm — training/main.py only syncs BN when
    --force-sync-bn); inference uses running stats. Returns ``(y, new_state)``.
    """
    if train:
        # stats accumulate in fp32 (channel reductions are cheap); the
        # whole-activation elementwise math stays in the compute dtype so
        # XLA fuses it into the adjacent conv epilogue without an fp32
        # round-trip through HBM.
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
        # square in the activation dtype, accumulate fp32 inside the reduce —
        # x.astype(f32) here would materialize an fp32 copy of the whole
        # activation (measured as a large share of step time)
        mean_sq = jnp.mean(jax.lax.square(x), axis=axes, dtype=jnp.float32)
        var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    # per-channel affine precomputed in fp32, applied in compute dtype
    g = (params["scale"] * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    b = (params["bias"] - params["scale"] * mean * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return x * g + b, new_state


def bn_factors_from_stats(bn_params, bn_state, mean, var, n: int, *,
                          train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """(g, b, new_state) for a BatchNorm given already-computed batch moments
    (train) or running stats (eval). Shared by the fused conv-bn paths."""
    if train:
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
            "var": (1 - momentum) * bn_state["var"] + momentum * unbiased,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    g = bn_params["scale"] * jax.lax.rsqrt(var + eps)
    b = bn_params["bias"] - bn_params["scale"] * mean * jax.lax.rsqrt(var + eps)
    return g, b, new_state


def conv1x1_moments_from_input(z2d, w32, n: int):
    """Batch mean/var of ``y = z @ w`` from z's first/second moments (1x1
    conv linearity; see conv1x1_batchnorm_apply). z2d: (N, K); w32: (K, C)."""
    m_z = jnp.mean(z2d, axis=0, dtype=jnp.float32)
    cov = jnp.einsum("nk,nl->kl", z2d, z2d, preferred_element_type=jnp.float32) / n
    mean = m_z @ w32
    mean_sq = jnp.einsum("kc,kl,lc->c", w32, cov, w32)
    var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
    return mean, var


def conv1x1_batchnorm_apply(
    conv_params,
    bn_params,
    bn_state,
    z,
    *,
    train: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
    dtype=None,
) -> Tuple[jnp.ndarray, dict]:
    """Fused 1x1-conv + BatchNorm with *input-derived* batch statistics.

    A 1x1 conv is linear in its input, so the output batch statistics are
    exactly expressible from the input's first/second moments:

        mean(y)_c = m_z @ W[:, c]
        E[y^2]_c  = W[:, c]^T (Z^T Z / n) W[:, c]

    This removes the data dependency of the normalize step on the conv
    *output* — XLA can then fuse normalize(+downstream elementwise) into the
    conv epilogue instead of materializing y, reducing a full HBM round-trip
    plus a stats pass over y to one small covariance matmul over z
    (bandwidth-bound ResNet stages; the conv output tensor is the widest in
    the block). Same math as batchnorm_apply, different summation order.
    """
    kernel = conv_params["kernel"]
    assert kernel.shape[0] == kernel.shape[1] == 1, "1x1 conv only"
    w = kernel[0, 0]  # (K, C)
    if dtype is not None:
        z = z.astype(dtype)
    y = jax.lax.conv_general_dilated(
        z, kernel.astype(z.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in conv_params:
        y = y + conv_params["bias"].astype(y.dtype)

    if train:
        n = int(np.prod(z.shape[:-1]))
        zf = z.reshape(n, z.shape[-1])
        w32 = w.astype(jnp.float32)
        m_z = jnp.mean(zf, axis=0, dtype=jnp.float32)  # (K,)
        cov = jnp.einsum("nk,nl->kl", zf, zf, preferred_element_type=jnp.float32) / n
        mean = m_z @ w32  # (C,)
        mean_sq = jnp.einsum("kc,kl,lc->c", w32, cov, w32)
        if "bias" in conv_params:
            b32 = conv_params["bias"].astype(jnp.float32)
            mean_sq = mean_sq + 2.0 * mean * b32 + b32 * b32
            mean = mean + b32
        var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
            "var": (1 - momentum) * bn_state["var"] + momentum * unbiased,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    g = (bn_params["scale"] * jax.lax.rsqrt(var + eps)).astype(y.dtype)
    b = (bn_params["bias"] - bn_params["scale"] * mean * jax.lax.rsqrt(var + eps)).astype(y.dtype)
    return y * g + b, new_state


# ---------------------------------------------------------------------------
# multi-head attention

def mha_init(rng, dim: int, *, num_heads: int, out_dim: Optional[int] = None, std: Optional[float] = None):
    """Params for a torch-nn.MultiheadAttention-equivalent layer, stored as
    separate q/k/v/out linears (the checkpoint bridge splits packed
    in_proj_weight)."""
    del num_heads
    keys = jax.random.split(rng, 4)
    std = std if std is not None else dim**-0.5
    return {
        "q": linear_init(keys[0], dim, dim, std=std),
        "k": linear_init(keys[1], dim, dim, std=std),
        "v": linear_init(keys[2], dim, dim, std=std),
        "out": linear_init(keys[3], dim, out_dim or dim, std=std),
    }


def _split_heads(x, num_heads: int):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def attention(q, k, v, *, num_heads: int, mask: Optional[jnp.ndarray] = None,
              impl: str = "einsum", causal: bool = False):
    """Scaled dot-product attention over (B, L, D) tensors.

    ``mask`` is an additive float mask broadcastable to (B, H, Lq, Lk).
    Softmax is computed in fp32 for stability; matmuls run in the input
    dtype on the MXU with fp32 accumulation. ``impl='flash'`` routes to the
    Pallas online-softmax kernel (ops/flash_attention.py) — worthwhile for
    long-sequence towers; ``causal`` only applies to the flash path (the
    einsum path takes the mask directly).
    """
    if impl == "flash" and (mask is None or causal):
        from xclip_tpu.ops.flash_attention import flash_mha

        return flash_mha(q, k, v, num_heads=num_heads, causal=causal)
    b, lq, d = q.shape
    head_dim = d // num_heads
    scale = head_dim**-0.5
    qh = _split_heads(q, num_heads)  # B Lq H Dh
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
    return out.astype(q.dtype).reshape(b, lq, d)


def mha_apply(params, x, *, num_heads: int, mask: Optional[jnp.ndarray] = None, dtype=None,
              impl: str = "einsum", causal: bool = False):
    """Self-attention with separate q/k/v projections + output projection.

    The three projections are fused into one (D, 3D) matmul — numerically
    identical per element (each output column contracts the same K axis),
    but one large MXU call instead of three in both forward and wgrad."""
    d = params["q"]["kernel"].shape[1]
    fused = {"kernel": jnp.concatenate(
        [params["q"]["kernel"], params["k"]["kernel"], params["v"]["kernel"]], axis=1)}
    if "bias" in params["q"]:
        fused["bias"] = jnp.concatenate(
            [params["q"]["bias"], params["k"]["bias"], params["v"]["bias"]])
    qkv = linear_apply(fused, x, dtype=dtype)
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    o = attention(q, k, v, num_heads=num_heads, mask=mask, impl=impl, causal=causal)
    return linear_apply(params["out"], o, dtype=dtype)


def causal_mask(length: int, dtype=jnp.float32):
    """Additive causal mask: 0 on/below diagonal, -inf above."""
    mask = jnp.triu(jnp.full((length, length), -jnp.inf, dtype), k=1)
    return mask
