"""Independent numpy reference for the timm ``fastvit`` MCi architecture
(FastViT arXiv:2303.14189; MobileCLIP arXiv:2311.17049; semantics as
documented in xclip_tpu/models/fastvit.py's header), eval mode (BN running
stats), consuming the TIMM state-dict layout (``trunk.*`` incl.
``running_mean/var``). Composed end to end: MobileOne stem, RepMixer and
attention stages with reparam downsamples + conditional position encoding,
ConvMlp + LayerScale, final grouped MobileOne conv with SE, avg pool,
``head.fc``. Shares nothing with the JAX tower.
"""

from __future__ import annotations

import numpy as np

from tests.oracles.np_common import attention, batchnorm, conv2d, gelu

ATTN_HEAD_DIM = 32
TOKEN_MIXERS = ("repmixer", "repmixer", "repmixer", "attention")


def _convbn(sd, base, x, *, stride=1, groups=1):
    w = sd[f"{base}.conv.weight"]
    k = w.shape[-1]
    y = conv2d(x, w, None, stride=stride, padding=k // 2, groups=groups)
    return batchnorm(y, sd[f"{base}.bn.weight"], sd[f"{base}.bn.bias"],
                     sd[f"{base}.bn.running_mean"], sd[f"{base}.bn.running_var"])


def _se(sd, base, x):
    pooled = x.mean(axis=(1, 2), keepdims=True)
    a = conv2d(pooled, sd[f"{base}.fc1.weight"], sd[f"{base}.fc1.bias"])
    a = np.maximum(a, 0.0)
    a = conv2d(a, sd[f"{base}.fc2.weight"], sd[f"{base}.fc2.bias"])
    return x * (1.0 / (1.0 + np.exp(-a)))


def _mobileone(sd, base, x, *, stride=1, groups=1, act=True):
    out = None
    if f"{base}.identity.weight" in sd:
        out = batchnorm(x, sd[f"{base}.identity.weight"], sd[f"{base}.identity.bias"],
                        sd[f"{base}.identity.running_mean"],
                        sd[f"{base}.identity.running_var"])
    if f"{base}.conv_scale.conv.weight" in sd:
        y = _convbn(sd, f"{base}.conv_scale", x, stride=stride, groups=groups)
        out = y if out is None else out + y
    j = 0
    while f"{base}.conv_kxk.{j}.conv.weight" in sd:
        y = _convbn(sd, f"{base}.conv_kxk.{j}", x, stride=stride, groups=groups)
        out = y if out is None else out + y
        j += 1
    if f"{base}.se.fc1.weight" in sd:
        out = _se(sd, f"{base}.se", out)
    return gelu(out) if act else out


def _convmlp(sd, base, x):
    dim = x.shape[-1]
    y = _convbn(sd, f"{base}.conv", x, groups=dim)
    y = gelu(conv2d(y, sd[f"{base}.fc1.weight"], sd[f"{base}.fc1.bias"]))
    return conv2d(y, sd[f"{base}.fc2.weight"], sd[f"{base}.fc2.bias"])


def _repmixer_block(sd, base, x):
    dim = x.shape[-1]
    normed = _mobileone(sd, f"{base}.token_mixer.norm", x, groups=dim, act=False)
    mixed = _mobileone(sd, f"{base}.token_mixer.mixer", x, groups=dim, act=False)
    x = x + sd[f"{base}.token_mixer.layer_scale.gamma"] * (mixed - normed)
    y = _convmlp(sd, f"{base}.mlp", x)
    return x + sd[f"{base}.layer_scale.gamma"] * y


def _attention_block(sd, base, x):
    b, h, w, dim = x.shape
    y = batchnorm(x, sd[f"{base}.norm.weight"], sd[f"{base}.norm.bias"],
                  sd[f"{base}.norm.running_mean"], sd[f"{base}.norm.running_var"])
    tokens = y.reshape(b, h * w, dim)
    qkv = tokens @ np.asarray(sd[f"{base}.token_mixer.qkv.weight"], np.float64).T
    q, k, v = qkv[..., :dim], qkv[..., dim:2 * dim], qkv[..., 2 * dim:]
    o = attention(q, k, v, dim // ATTN_HEAD_DIM)
    o = o @ np.asarray(sd[f"{base}.token_mixer.proj.weight"], np.float64).T \
        + sd[f"{base}.token_mixer.proj.bias"]
    x = x + sd[f"{base}.layer_scale_1.gamma"] * o.reshape(b, h, w, dim)
    y = _convmlp(sd, f"{base}.mlp", x)
    return x + sd[f"{base}.layer_scale_2.gamma"] * y


def fastvit_forward(sd, images, *, depths, dims):
    """NHWC fp images -> (B, output_dim) features, float64 numpy, eval BN."""
    sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}
    d0 = dims[0]
    y = np.asarray(images, np.float64)
    for j, (stride, groups) in enumerate(((2, 1), (2, d0), (1, 1))):
        y = _mobileone(sd, f"trunk.stem.{j}", y, stride=stride, groups=groups)

    prev = d0
    for i, depth in enumerate(depths):
        base = f"trunk.stages.{i}"
        if f"{base}.downsample.proj.0.large_conv.conv.weight" in sd:
            yl = _convbn(sd, f"{base}.downsample.proj.0.large_conv", y,
                         stride=2, groups=prev)
            ys = _convbn(sd, f"{base}.downsample.proj.0.small_conv", y,
                         stride=2, groups=prev)
            y = yl + ys
            if f"{base}.downsample.proj.0.se.fc1.weight" in sd:
                y = _se(sd, f"{base}.downsample.proj.0.se", y)
            y = gelu(y)
            y = _mobileone(sd, f"{base}.downsample.proj.1", y)
        if f"{base}.pos_emb.pos_enc.weight" in sd:
            dim = y.shape[-1]
            y = y + conv2d(y, sd[f"{base}.pos_emb.pos_enc.weight"],
                           sd[f"{base}.pos_emb.pos_enc.bias"],
                           padding=3, groups=dim)
        block = _attention_block if TOKEN_MIXERS[i] == "attention" else _repmixer_block
        for b in range(depth):
            y = block(sd, f"{base}.blocks.{b}", y)
        prev = dims[i]

    y = _mobileone(sd, "trunk.final_conv", y, groups=dims[-1])
    pooled = y.mean(axis=(1, 2))
    return pooled @ np.asarray(sd["trunk.head.fc.weight"], np.float64).T \
        + sd["trunk.head.fc.bias"]
