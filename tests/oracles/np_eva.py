"""Independent numpy reference for the timm ``Eva`` architecture.

Written from the architecture spec (EVA-01 arXiv:2211.07636, EVA-02
arXiv:2303.11331; timm eva.py semantics as documented in
xclip_tpu/models/eva.py's header) and consuming the TIMM STATE-DICT layout
directly (``trunk.*`` keys, torch (out,in) linear weights, OIHW conv
kernels) — it shares no code, no helper, and no tensor-layout convention
with the JAX tower, so a mismatch in rope band layout, qkv bias packing,
norm placement or pooling shows up as a numeric failure
(tests/test_tower_oracles.py).

Everything is float64 numpy for a tight tolerance against the fp32 tower.
"""

from __future__ import annotations

import numpy as np


def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _linear(sd, key, x):
    w = np.asarray(sd[f"{key}.weight"], np.float64)  # torch (out, in)
    y = x @ w.T
    if f"{key}.bias" in sd:
        y = y + np.asarray(sd[f"{key}.bias"], np.float64)
    return y


def _gelu(x):
    from scipy.special import erf  # exact erf GELU (torch nn.GELU default)

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def _attention(q, k, v, heads):
    """(B, S, D) multi-head scaled dot-product attention."""
    b, s, d = q.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)  # B H S hd

    qh, kh, vh = split(q), split(k), split(v)
    logits = np.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    o = np.einsum("bhqk,bhkd->bhqd", _softmax(logits), vh)
    return o.transpose(0, 2, 1, 3).reshape(b, s, d)


def _rope_angles(grid, ref_grid, head_dim):
    """timm RotaryEmbeddingCat, in_pixels=False, ref_feat_shape rescale:
    head_dim//4 bands per axis, angles for (y, x) concatenated then each
    duplicated over an adjacent channel pair."""
    n_bands = head_dim // 4
    inv_freq = 1.0 / (10000.0 ** (np.arange(n_bands) / n_bands))
    pos = np.arange(grid) / grid * ref_grid
    band_ang = np.outer(pos, inv_freq)  # (grid, n_bands)
    angles = np.empty((grid * grid, 2 * n_bands))
    i = 0
    for y in range(grid):
        for x in range(grid):
            angles[i] = np.concatenate([band_ang[y], band_ang[x]])
            i += 1
    return np.repeat(angles, 2, axis=-1)  # (N, head_dim)


def _apply_rope(t, angles, heads):
    """Rotate the patch tokens (cls token untouched). t: (B, S, D)."""
    b, s, d = t.shape
    hd = d // heads
    sin, cos = np.sin(angles), np.cos(angles)
    out = t.copy()
    tok = t[:, 1:].reshape(b, s - 1, heads, hd)
    rot = np.empty_like(tok)
    rot[..., 0::2] = -tok[..., 1::2]
    rot[..., 1::2] = tok[..., 0::2]
    tok = tok * cos[None, :, None, :] + rot * sin[None, :, None, :]
    out[:, 1:] = tok.reshape(b, s - 1, d)
    return out


def eva_forward(sd, images, *, patch_size, width, layers, heads,
                qkv_fused, swiglu, rope, ref_grid=16, post_norm=False):
    """NHWC fp images -> (B, output_dim) features, all numpy float64."""
    sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}
    b, h, w_, c = images.shape
    grid = h // patch_size
    x = np.asarray(images, np.float64)

    # patch embed: conv pxp stride p == per-patch flatten (h, w, c) @ W
    kw = sd["trunk.patch_embed.proj.weight"]  # (D, C, p, p) torch OIHW
    d = kw.shape[0]
    wmat = kw.transpose(2, 3, 1, 0).reshape(-1, d)  # (p*p*c, D) in (h, w, c) order
    patches = np.empty((b, grid * grid, patch_size * patch_size * c))
    for gy in range(grid):
        for gx in range(grid):
            block = x[:, gy * patch_size:(gy + 1) * patch_size,
                      gx * patch_size:(gx + 1) * patch_size, :]
            patches[:, gy * grid + gx] = block.reshape(b, -1)
    tokens = patches @ wmat + sd["trunk.patch_embed.proj.bias"]

    cls = np.broadcast_to(sd["trunk.cls_token"].reshape(1, 1, d), (b, 1, d))
    t = np.concatenate([cls, tokens], axis=1) + sd["trunk.pos_embed"][0]

    angles = _rope_angles(grid, ref_grid, width // heads) if rope else None

    for i in range(layers):
        base = f"trunk.blocks.{i}"

        def attn(inp):
            if qkv_fused:
                wqkv = sd[f"{base}.attn.qkv.weight"]  # (3D, D)
                bias = np.concatenate([
                    sd[f"{base}.attn.q_bias"], np.zeros(width),
                    sd[f"{base}.attn.v_bias"]])
                qkv = inp @ wqkv.T + bias
                q, k, v = qkv[..., :width], qkv[..., width:2 * width], qkv[..., 2 * width:]
            else:
                q = _linear(sd, f"{base}.attn.q_proj", inp)
                k = _linear(sd, f"{base}.attn.k_proj", inp)
                v = _linear(sd, f"{base}.attn.v_proj", inp)
            if rope:
                q = _apply_rope(q, angles, heads)
                k = _apply_rope(k, angles, heads)
            return _linear(sd, f"{base}.attn.proj", _attention(q, k, v, heads))

        def mlp(inp):
            if swiglu:
                g = _linear(sd, f"{base}.mlp.fc1_g", inp)
                hx = _linear(sd, f"{base}.mlp.fc1_x", inp)
                y = (g / (1.0 + np.exp(-g))) * hx  # silu(gate) * x
                y = _ln(y, sd[f"{base}.mlp.norm.weight"], sd[f"{base}.mlp.norm.bias"])
                return _linear(sd, f"{base}.mlp.fc2", y)
            y = _gelu(_linear(sd, f"{base}.mlp.fc1", inp))
            return _linear(sd, f"{base}.mlp.fc2", y)

        def gamma(key, y):
            return y * sd[f"{base}.{key}"] if f"{base}.{key}" in sd else y

        n1w, n1b = sd[f"{base}.norm1.weight"], sd[f"{base}.norm1.bias"]
        n2w, n2b = sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"]
        if post_norm:
            # EvaBlockPostNorm: residual add of the NORMED sublayer output
            t = t + gamma("gamma_1", _ln(attn(t), n1w, n1b))
            t = t + gamma("gamma_2", _ln(mlp(t), n2w, n2b))
        else:
            t = t + gamma("gamma_1", attn(_ln(t, n1w, n1b)))
            t = t + gamma("gamma_2", mlp(_ln(t, n2w, n2b)))

    t = _ln(t, sd["trunk.norm.weight"], sd["trunk.norm.bias"])
    return _linear(sd, "trunk.head", t[:, 0])  # timm_pool='token'
