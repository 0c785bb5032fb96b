"""Independent numpy reference for the timm ``ViTamin`` architecture
(Chen et al., arXiv:2404.02132; timm vitamin.py semantics as documented in
xclip_tpu/models/vitamin.py's header), consuming the TIMM/open_clip
state-dict layout (``trunk.patch_embed.backbone.*`` MBConv stages +
``trunk.blocks.*`` GeGLU ViT + ``head.proj``). Composed end to end: stem,
both MBConv-LN stages (incl. the stride-2 avg-pool shortcut,
count_include_pad=False), the stride-2 patchify pool, abs pos embed, every
ViT block (qkv-bias MHSA + GeGLU MLP with its own leading LN), global avg
pool, fc_norm, bias-free projection. Shares nothing with the JAX tower.
"""

from __future__ import annotations

import numpy as np

from tests.oracles.np_common import attention, avgpool2d, conv2d, gelu, linear, ln


def _conv(sd, key, x, *, stride=1, padding=0, groups=1):
    return conv2d(x, sd[f"{key}.weight"], sd.get(f"{key}.bias"),
                  stride=stride, padding=padding, groups=groups)


def _mbconv(sd, base, x, *, stride):
    if f"{base}.shortcut.expand.weight" in sd:
        shortcut = _conv(sd, f"{base}.shortcut.expand",
                         avgpool2d(x, 3, 2, 1, count_include_pad=False))
    elif f"{base}.shortcut.weight" in sd:
        shortcut = _conv(sd, f"{base}.shortcut", x)
    else:
        shortcut = x
    y = ln(x, sd[f"{base}.pre_norm.weight"], sd[f"{base}.pre_norm.bias"])
    y = gelu(_conv(sd, f"{base}.conv1_1x1", y))
    mid = y.shape[-1]
    y = gelu(_conv(sd, f"{base}.conv2_kxk", y, stride=stride, padding=1, groups=mid))
    y = _conv(sd, f"{base}.conv3_1x1", y)
    return shortcut + y


def vitamin_forward(sd, images, *, heads, vit_depth, mb_depths=(2, 4)):
    """NHWC fp images -> (B, output_dim) features, float64 numpy."""
    sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}
    bb = "trunk.patch_embed.backbone"

    y = _conv(sd, f"{bb}.stem.conv1", images, stride=2, padding=1)
    y = gelu(ln(y, sd[f"{bb}.stem.norm1.weight"], sd[f"{bb}.stem.norm1.bias"]))
    y = _conv(sd, f"{bb}.stem.conv2", y, padding=1)

    for s in range(2):
        for b in range(mb_depths[s]):
            y = _mbconv(sd, f"{bb}.stages.{s}.{b}", y, stride=2 if b == 0 else 1)

    y = ln(y, sd[f"{bb}.pool.norm.weight"], sd[f"{bb}.pool.norm.bias"])
    y = _conv(sd, f"{bb}.pool.proj", y, stride=2, padding=1)
    n, gh, gw, d = y.shape
    t = y.reshape(n, gh * gw, d) + sd["trunk.pos_embed"][0]

    for i in range(vit_depth):
        base = f"trunk.blocks.{i}"
        y = ln(t, sd[f"{base}.norm1.weight"], sd[f"{base}.norm1.bias"])
        qkv = linear(sd, f"{base}.attn.qkv", y)
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        t = t + linear(sd, f"{base}.attn.proj", attention(q, k, v, heads))
        y = ln(t, sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"])
        y = ln(y, sd[f"{base}.mlp.norm.weight"], sd[f"{base}.mlp.norm.bias"])
        g = linear(sd, f"{base}.mlp.w0", y)
        u = linear(sd, f"{base}.mlp.w1", y)
        t = t + linear(sd, f"{base}.mlp.w2", gelu(g) * u)

    pooled = t.mean(axis=1)
    pooled = ln(pooled, sd["trunk.fc_norm.weight"], sd["trunk.fc_norm.bias"])
    if "head.proj.weight" in sd:
        pooled = linear(sd, "head.proj", pooled)
    return pooled
