"""Shared numpy primitives for the tower oracles (torch tensor layouts,
float64 math, loop-based convolutions — deliberately naive and disjoint
from the JAX implementations they check)."""

from __future__ import annotations

import numpy as np
from scipy.special import erf


def ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def linear(sd, key, x):
    w = np.asarray(sd[f"{key}.weight"], np.float64)  # torch (out, in)
    y = x @ w.T
    if f"{key}.bias" in sd:
        y = y + np.asarray(sd[f"{key}.bias"], np.float64)
    return y


def gelu(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def silu(x):
    return x / (1.0 + np.exp(-x))


def softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def attention(q, k, v, heads):
    """(B, S, D) multi-head scaled dot-product attention."""
    b, s, d = q.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    o = np.einsum(
        "bhqk,bhkd->bhqd",
        softmax(np.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / np.sqrt(hd)),
        split(v))
    return o.transpose(0, 2, 1, 3).reshape(b, s, d)


def conv2d(x, w, b=None, *, stride=1, padding=0, groups=1):
    """NHWC input, torch OIHW weight, direct-loop convolution (float64)."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    n, h, ww, cin = x.shape
    cout, cin_g, kh, kw = w.shape
    assert cin == cin_g * groups, (cin, cin_g, groups)
    if padding:
        x = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oh = (x.shape[1] - kh) // stride + 1
    ow = (x.shape[2] - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout))
    cpg_in = cin // groups
    cpg_out = cout // groups
    for g in range(groups):
        xg = x[..., g * cpg_in:(g + 1) * cpg_in]
        wg = w[g * cpg_out:(g + 1) * cpg_out]  # (cpg_out, cpg_in, kh, kw)
        for oy in range(oh):
            for ox in range(ow):
                patch = xg[:, oy * stride:oy * stride + kh,
                           ox * stride:ox * stride + kw, :]  # (n, kh, kw, cpg_in)
                out[:, oy, ox, g * cpg_out:(g + 1) * cpg_out] = np.einsum(
                    "nhwc,ochw->no", patch, wg)
    if b is not None:
        out = out + np.asarray(b, np.float64)
    return out


def avgpool2d(x, k, stride, padding, count_include_pad=False):
    """NHWC average pooling (torch AvgPool2d semantics)."""
    x = np.asarray(x, np.float64)
    n, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    valid = np.pad(np.ones((1, h, w, 1)),
                   ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oh = (xp.shape[1] - k) // stride + 1
    ow = (xp.shape[2] - k) // stride + 1
    out = np.zeros((n, oh, ow, c))
    for oy in range(oh):
        for ox in range(ow):
            win = xp[:, oy * stride:oy * stride + k, ox * stride:ox * stride + k, :]
            if count_include_pad:
                cnt = k * k
            else:
                cnt = valid[:, oy * stride:oy * stride + k,
                            ox * stride:ox * stride + k, :].sum((1, 2))
            out[:, oy, ox, :] = win.sum((1, 2)) / cnt
    return out


def batchnorm(x, w, b, mean, var, eps=1e-5):
    """Inference-mode BN over the channel (last) axis."""
    return (np.asarray(x, np.float64) - mean) / np.sqrt(var + eps) * w + b
