"""Independent numpy reference for the timm ``vit_base_mci_224`` hybrid
(MobileCLIP-B; vision_transformer_hybrid semantics as documented in
xclip_tpu/models/mci_vit.py's header), eval mode, consuming the TIMM
state-dict layout. Composed end to end: 3-conv MCi stem (conv+BN+GELU x2,
bias conv patchify, all VALID padding), no_embed_class pos-embed (patch
tokens only, cls prepended after the add), pre-LN ViT blocks, final norm,
cls-token pool, head. Shares nothing with the JAX tower.
"""

from __future__ import annotations

import numpy as np

from tests.oracles.np_common import attention, batchnorm, conv2d, gelu, linear, ln


def mci_forward(sd, images, *, width, layers, heads, stem_strides=(4, 2, 2)):
    sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}
    bb = "trunk.patch_embed.backbone"

    y = conv2d(images, sd[f"{bb}.0.conv.weight"], stride=stem_strides[0])
    y = gelu(batchnorm(y, sd[f"{bb}.0.bn.weight"], sd[f"{bb}.0.bn.bias"],
                       sd[f"{bb}.0.bn.running_mean"], sd[f"{bb}.0.bn.running_var"]))
    y = conv2d(y, sd[f"{bb}.1.conv.weight"], stride=stem_strides[1])
    y = gelu(batchnorm(y, sd[f"{bb}.1.bn.weight"], sd[f"{bb}.1.bn.bias"],
                       sd[f"{bb}.1.bn.running_mean"], sd[f"{bb}.1.bn.running_var"]))
    y = conv2d(y, sd[f"{bb}.2.conv.weight"], sd[f"{bb}.2.conv.bias"],
               stride=stem_strides[2])

    n, gh, gw, d = y.shape
    tokens = y.reshape(n, gh * gw, d) + sd["trunk.pos_embed"][0]
    cls = np.broadcast_to(sd["trunk.cls_token"].reshape(1, 1, d), (n, 1, d))
    t = np.concatenate([cls, tokens], axis=1)

    for i in range(layers):
        base = f"trunk.blocks.{i}"
        y = ln(t, sd[f"{base}.norm1.weight"], sd[f"{base}.norm1.bias"])
        qkv = linear(sd, f"{base}.attn.qkv", y)
        q, k, v = qkv[..., :width], qkv[..., width:2 * width], qkv[..., 2 * width:]
        t = t + linear(sd, f"{base}.attn.proj", attention(q, k, v, heads))
        y = ln(t, sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"])
        t = t + linear(sd, f"{base}.mlp.fc2", gelu(linear(sd, f"{base}.mlp.fc1", y)))

    t = ln(t, sd["trunk.norm.weight"], sd["trunk.norm.bias"])
    return linear(sd, "trunk.head", t[:, 0])
