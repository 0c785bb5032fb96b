"""Falsifiable NUMERICS property tests for the seven native timm-family
tower implementations whose cross-implementation oracle (timm) is absent on
this box (VERDICT r3 missing #2). Each family is pinned against an
INDEPENDENT closed form written here in plain numpy loops — so a wrong
stride, eps, mask index, or branch-fusion rule produces a value mismatch,
not just a shape mismatch:

- swin: shifted-window attention == dense per-window attention with the
  relative-position bias and the wrap-boundary -100 mask derived from first
  principles (timm swin_transformer.py WindowAttention semantics)
- eva: 2D axial RoPE == complex multiplication per channel pair, plus the
  norm-preservation and relative-phase (translation-invariance) identities
- fastvit: MobileOne eval-mode multi-branch block == ONE fused kxk conv
  whose kernel/bias are computed here by the published reparam algebra
  (the defining invariant of the architecture)
- vitamin: MBConv (both strides, both shortcut forms) == numpy loop convs
- timm_vit: AttentionPoolLatent == numpy single-query MHA + residual MLP
- convnext: block == numpy depthwise 7x7 + LN(1e-6) + pointwise MLP + gamma
- mci_vit: transformer block == numpy pre-LN MHA/MLP closed form
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# shared numpy closed forms (independent of xclip_tpu.models.layers)


def np_layernorm(x, scale, bias, eps):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_gelu(x):
    from scipy.special import erf  # scipy ships with the jax stack

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_linear(p, x):
    y = x @ np.asarray(p["kernel"])
    if "bias" in p:
        y = y + np.asarray(p["bias"])
    return y


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_conv2d(x, kernel, *, stride=1, pad=0, groups=1):
    """Plain-loop NHWC x HWIO conv (the independent oracle)."""
    b, h, w, cin = x.shape
    kh, kw, cg, cout = kernel.shape
    assert cg == cin // groups
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (w + 2 * pad - kw) // stride + 1
    out = np.zeros((b, oh, ow, cout), np.float64)
    opg = cout // groups  # output channels per group
    for o in range(cout):
        g = o // opg
        xs = xp[..., g * cg : (g + 1) * cg]
        for i in range(oh):
            for j in range(ow):
                patch = xs[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
                out[:, i, j, o] = np.einsum("bhwc,hwc->b", patch, kernel[..., o])
    return out.astype(np.float32)


def np_mha(q, k, v, heads):
    """(B, Lq, D) x (B, Lk, D): fp32 softmax, 1/sqrt(hd) scaling."""
    b, lq, d = q.shape
    hd = d // heads
    qh = q.reshape(b, lq, heads, hd)
    kh = k.reshape(b, k.shape[1], heads, hd)
    vh = v.reshape(b, v.shape[1], heads, hd)
    logits = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
    w = np_softmax(logits)
    o = np.einsum("bhqk,bkhd->bqhd", w, vh)
    return o.reshape(b, lq, d)


def _randomize(tree, rng, scale=0.2):
    """Replace every leaf with fresh N(0, scale) values (same shapes) so no
    zero-init bias/gamma can mask an indexing bug."""
    return jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(rng.randn(*np.shape(leaf)).astype(np.float32) * scale), tree
    )


# ---------------------------------------------------------------------------
# swin: shifted-window attention vs dense masked attention


@pytest.mark.parametrize("shift", [0, 1])
def test_swin_block_matches_dense_masked_attention(shift):
    from xclip_tpu.models import swin as S

    grid, window, heads, c, b = 4, 2, 2, 8, 2
    cfg = S.SwinCfg(timm_name="t", output_dim=8, image_size=16, patch_size=4,
                    embed_dim=c, depths=(1,), heads=(heads,), window=window)
    rng = np.random.RandomState(0)
    p = _randomize(S._block_init(jax.random.PRNGKey(0), c, heads, cfg), rng)
    x = rng.randn(b, grid, grid, c).astype(np.float32)

    got = np.asarray(S._block_apply(p, jnp.asarray(x), heads=heads,
                                    window=window, shift=shift))

    # ---- independent dense closed form -----------------------------------
    pn = jax.tree_util.tree_map(np.asarray, p)
    y = np_layernorm(x, pn["norm1"]["scale"], pn["norm1"]["bias"], 1e-5)
    if shift:
        y = np.roll(y, (-shift, -shift), axis=(1, 2))
    hd = c // heads
    table = pn["attn"]["relative_position_bias_table"]  # ((2w-1)^2, heads)
    out_spatial = np.zeros_like(y)
    n = grid // window
    for wi in range(n):
        for wj in range(n):
            coords = [(wi * window + a, wj * window + bb)
                      for a in range(window) for bb in range(window)]
            tok = np.stack([y[:, r, cc, :] for r, cc in coords], axis=1)  # (B, w², C)
            qkv = np_linear(pn["attn"]["qkv"], tok)
            q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
            qh = q.reshape(b, len(coords), heads, hd)
            kh = k.reshape(b, len(coords), heads, hd)
            vh = v.reshape(b, len(coords), heads, hd)
            logits = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
            for i, (r1, c1) in enumerate(coords):
                for j, (r2, c2) in enumerate(coords):
                    # relative-position bias straight from its definition
                    a1, b1 = (r1 - wi * window, c1 - wj * window)
                    a2, b2 = (r2 - wi * window, c2 - wj * window)
                    idx = (a1 - a2 + window - 1) * (2 * window - 1) + (b1 - b2 + window - 1)
                    logits[:, :, i, j] += table[idx]
                    if shift:
                        # two tokens of the rolled map hold contiguous image
                        # content iff they wrapped identically on both axes
                        # (rolled index r holds original row r+shift, which
                        # wrapped iff r >= grid - shift)
                        wrap1 = (r1 >= grid - shift, c1 >= grid - shift)
                        wrap2 = (r2 >= grid - shift, c2 >= grid - shift)
                        if wrap1 != wrap2:
                            logits[:, :, i, j] += -100.0
            o = np.einsum("bhqk,bkhd->bqhd", np_softmax(logits), vh)
            o = np_linear(pn["attn"]["proj"], o.reshape(b, len(coords), c))
            for i, (r, cc) in enumerate(coords):
                out_spatial[:, r, cc, :] = o[:, i, :]
    if shift:
        out_spatial = np.roll(out_spatial, (shift, shift), axis=(1, 2))
    xr = x + out_spatial
    y2 = np_layernorm(xr, pn["norm2"]["scale"], pn["norm2"]["bias"], 1e-5)
    y2 = np_linear(pn["mlp"]["fc2"], np_gelu(np_linear(pn["mlp"]["fc1"], y2)))
    want = xr + y2

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# eva: RoPE identities


def test_eva_rope_equals_complex_rotation():
    from xclip_tpu.models import eva as E

    grid, ref_grid, heads, hd, b = 3, 5, 2, 8, 2
    d = heads * hd
    n = grid * grid
    rng = np.random.RandomState(1)
    x = rng.randn(b, 1 + n, d).astype(np.float32)
    sin, cos = E._rope_tables(grid, ref_grid, hd)
    got = np.asarray(E._apply_rope(jnp.asarray(x), sin, cos, heads))

    # cls token passes through untouched
    np.testing.assert_array_equal(got[:, 0], x[:, 0])
    # rotations preserve the per-pair (hence total) token norm
    np.testing.assert_allclose(
        np.linalg.norm(got[:, 1:], axis=-1), np.linalg.norm(x[:, 1:], axis=-1),
        rtol=1e-5)

    # independent closed form: complex multiplication per adjacent pair
    n_bands = hd // 4
    want = x.copy()
    for t in range(n):
        ty, tx = divmod(t, grid)
        theta = np.empty(hd // 2, np.float64)
        for i in range(n_bands):
            inv = 10000.0 ** (-(i / n_bands))
            theta[i] = (ty / grid * ref_grid) * inv
            theta[n_bands + i] = (tx / grid * ref_grid) * inv
        rot = np.exp(1j * theta)
        for h in range(heads):
            seg = x[:, 1 + t, h * hd : (h + 1) * hd].astype(np.float64)
            z = (seg[:, 0::2] + 1j * seg[:, 1::2]) * rot
            out = np.empty_like(seg)
            out[:, 0::2] = z.real
            out[:, 1::2] = z.imag
            want[:, 1 + t, h * hd : (h + 1) * hd] = out.astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_eva_rope_relative_phase_invariance():
    """<rope(q,p1), rope(k,p2)> depends only on p1-p2 (the property that
    makes RoPE a relative position encoding)."""
    from xclip_tpu.models import eva as E

    grid, heads, hd = 4, 1, 8
    sin, cos = E._rope_tables(grid, grid, hd)
    rng = np.random.RandomState(2)
    q = rng.randn(hd).astype(np.float32)
    k = rng.randn(hd).astype(np.float32)

    def rot_at(vec, pos):
        x = np.zeros((1, 1 + grid * grid, hd), np.float32)
        x[0, 1 + pos] = vec
        return np.asarray(E._apply_rope(jnp.asarray(x), sin, cos, heads))[0, 1 + pos]

    def pos(y, x_):
        return y * grid + x_

    # translate the (p1, p2) pair by (+1, +1): inner product must not move
    a = rot_at(q, pos(0, 1)) @ rot_at(k, pos(2, 0))
    b = rot_at(q, pos(1, 2)) @ rot_at(k, pos(3, 1))
    np.testing.assert_allclose(a, b, rtol=1e-5)


# ---------------------------------------------------------------------------
# fastvit: MobileOne branch fusion (the reparam invariant)


def _fuse_convbn(kernel, bn_p, bn_s, eps=1e-5):
    """conv+BN -> (kernel', bias') by folding the affine BN into the conv."""
    g = np.asarray(bn_p["scale"]) / np.sqrt(np.asarray(bn_s["var"]) + eps)
    return np.asarray(kernel) * g, np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * g


def _pad_1x1_to_kxk(kernel, k):
    out = np.zeros((k, k) + kernel.shape[2:], np.float32)
    out[k // 2, k // 2] = kernel[0, 0]
    return out


def _identity_kernel(k, cin, groups):
    """kxk kernel equal to the identity map under grouped conv."""
    cg = cin // groups
    out = np.zeros((k, k, cg, cin), np.float32)
    for o in range(cin):
        out[k // 2, k // 2, o % cg, o] = 1.0
    return out


@pytest.mark.parametrize("groups,cin,cout,stride", [
    (1, 8, 8, 1),    # dense, with identity branch
    (8, 8, 8, 1),    # depthwise, with identity branch
    (1, 6, 8, 2),    # strided projection, no identity branch
])
def test_mobileone_branches_equal_fused_conv(groups, cin, cout, stride):
    from xclip_tpu.models import fastvit as F

    k = 3
    p, s = F._mobileone_init(jax.random.PRNGKey(0), k, cin, cout,
                             stride=stride, groups=groups)
    rng = np.random.RandomState(3)
    p = _randomize(p, rng)
    # sharp test: non-trivial running stats (variance strictly positive)
    s = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(np.abs(rng.randn(*np.shape(leaf))).astype(np.float32) + 0.2), s)
    assert ("identity" in p) == (cin == cout and stride == 1)

    x = rng.randn(2, 6, 6, cin).astype(np.float32)
    got, _ = F._mobileone(p, s, jnp.asarray(x), stride=stride, groups=groups,
                          act=False, train=False)

    # ---- fuse every branch into ONE conv, by the published algebra -------
    wk, bk = _fuse_convbn(p["conv_kxk"][0]["conv"]["kernel"],
                          p["conv_kxk"][0]["bn"], s["conv_kxk"][0]["bn"])
    w, bias = wk, bk
    if "conv_scale" in p:
        ws, bs = _fuse_convbn(p["conv_scale"]["conv"]["kernel"],
                              p["conv_scale"]["bn"], s["conv_scale"]["bn"])
        w = w + _pad_1x1_to_kxk(ws, k)
        bias = bias + bs
    if "identity" in p:
        gi = np.asarray(p["identity"]["scale"]) / np.sqrt(np.asarray(s["identity"]["var"]) + 1e-5)
        w = w + _identity_kernel(k, cin, groups) * gi
        bias = bias + np.asarray(p["identity"]["bias"]) - np.asarray(s["identity"]["mean"]) * gi

    want = np_conv2d(x, w, stride=stride, pad=k // 2, groups=groups) + bias
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_replk_conv_equals_fused_large_kernel():
    """ReparamLargeKernelConv: 7x7 + 3x3 depthwise branches == one fused 7x7
    (the 3x3 kernel zero-padded into the 7x7 center)."""
    from xclip_tpu.models import fastvit as F

    cin = cout = 8
    p, s = F._lkc_init(jax.random.PRNGKey(1), cin, cout)
    rng = np.random.RandomState(4)
    p = _randomize(p, rng)
    s = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(np.abs(rng.randn(*np.shape(leaf))).astype(np.float32) + 0.2), s)
    p.pop("se", None)

    x = rng.randn(2, 8, 8, cin).astype(np.float32)
    got, _ = F._lkc(p, s, jnp.asarray(x), groups=cin, train=False)

    wl, bl = _fuse_convbn(p["large_conv"]["conv"]["kernel"], p["large_conv"]["bn"],
                          s["large_conv"]["bn"])
    wsm, bsm = _fuse_convbn(p["small_conv"]["conv"]["kernel"], p["small_conv"]["bn"],
                            s["small_conv"]["bn"])
    w = wl.copy()
    w[2:5, 2:5] += wsm  # 3x3 centered in the 7x7
    want = np_conv2d(x, w, stride=2, pad=3, groups=cin) + (bl + bsm)
    want = np_gelu(want)  # _lkc applies the MCi lkc_use_act GELU
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# vitamin: MBConv closed form


@pytest.mark.parametrize("stride", [1, 2])
def test_vitamin_mbconv_matches_numpy(stride):
    from xclip_tpu.models import vitamin as V

    cin, cout = 4, (4 if stride == 1 else 6)
    p = V._mbconv_init(jax.random.PRNGKey(0), cin, cout, stride)
    rng = np.random.RandomState(5)
    p = _randomize(p, rng)
    x = rng.randn(2, 6, 6, cin).astype(np.float32)

    got = np.asarray(V._mbconv_apply(p, jnp.asarray(x), stride=stride))

    pn = jax.tree_util.tree_map(np.asarray, p)
    if "shortcut" not in pn:
        shortcut = x
    else:
        # stride-2 shortcut: AvgPool(3, 2, pad 1, count_include_pad=False)
        # then a 1x1 expand conv
        b, h, w, _ = x.shape
        oh = (h + 1) // 2
        pooled = np.zeros((b, oh, oh, cin), np.float32)
        for i in range(oh):
            for j in range(oh):
                r0, c0 = 2 * i - 1, 2 * j - 1
                rs = slice(max(r0, 0), min(r0 + 3, h))
                cs = slice(max(c0, 0), min(c0 + 3, w))
                pooled[:, i, j] = x[:, rs, cs, :].mean(axis=(1, 2))
        sc = pn["shortcut"]["expand"] if "expand" in pn["shortcut"] else pn["shortcut"]
        shortcut = np_conv2d(pooled, sc["kernel"], stride=1, pad=0) + sc["bias"]
    y = np_layernorm(x, pn["pre_norm"]["scale"], pn["pre_norm"]["bias"], 1e-6)
    y = np_conv2d(y, pn["conv1_1x1"]["kernel"], stride=1, pad=0) + pn["conv1_1x1"]["bias"]
    y = np_gelu(y)
    mid = y.shape[-1]
    y = np_conv2d(y, pn["conv2_kxk"]["kernel"], stride=stride, pad=1, groups=mid) \
        + pn["conv2_kxk"]["bias"]
    y = np_gelu(y)
    y = np_conv2d(y, pn["conv3_1x1"]["kernel"], stride=1, pad=0) + pn["conv3_1x1"]["bias"]
    np.testing.assert_allclose(got, shortcut + y, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# timm_vit: AttentionPoolLatent closed form


def test_timm_vit_attention_pool_latent_matches_numpy():
    from xclip_tpu.models import timm_vit as T

    cfg = T.TimmViTCfg(timm_name="t", output_dim=8, image_size=32, patch_size=16,
                       width=16, layers=1, heads=2, pool="map")
    p = T.timm_vit_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(6)
    p["attn_pool"] = _randomize(p["attn_pool"], rng)
    x = rng.randn(2, 4, cfg.width).astype(np.float32)

    got = np.asarray(T._attn_pool_latent(p["attn_pool"], jnp.asarray(x), cfg))

    pn = jax.tree_util.tree_map(np.asarray, p["attn_pool"])
    latent = np.broadcast_to(pn["latent"], (2, 1, cfg.width))
    q = np_linear(pn["q"], latent)
    kv = np_linear(pn["kv"], x)
    o = np_mha(q, kv[..., : cfg.width], kv[..., cfg.width :], cfg.heads)
    o = np_linear(pn["proj"], o)
    y = np_layernorm(o, pn["norm"]["scale"], pn["norm"]["bias"], 1e-6)
    y = np_linear(pn["mlp"]["fc2"], np_gelu(np_linear(pn["mlp"]["fc1"], y)))
    want = (o + y)[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# convnext: block closed form


def test_convnext_block_matches_numpy():
    from xclip_tpu.models import convnext as C

    dim = 6
    p = C._block_init(jax.random.PRNGKey(0), dim)
    rng = np.random.RandomState(7)
    p = _randomize(p, rng)
    x = rng.randn(2, 8, 8, dim).astype(np.float32)

    got = np.asarray(C._block_apply(p, jnp.asarray(x)))

    pn = jax.tree_util.tree_map(np.asarray, p)
    y = np_conv2d(x, pn["conv_dw"]["kernel"], stride=1, pad=3, groups=dim) \
        + pn["conv_dw"]["bias"]
    y = np_layernorm(y, pn["norm"]["scale"], pn["norm"]["bias"], 1e-6)
    y = np_linear(pn["mlp"]["fc2"], np_gelu(np_linear(pn["mlp"]["fc1"], y)))
    want = x + y * pn["gamma"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# mci_vit: transformer block closed form


def test_mci_vit_block_matches_numpy():
    from xclip_tpu.models import mci_vit as M

    cfg = M.MciViTCfg(timm_name="t", output_dim=8, image_size=32, width=16,
                      layers=1, heads=2, mlp_ratio=1.5)
    p = M._block_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(8)
    p = _randomize(p, rng)
    x = rng.randn(2, 5, cfg.width).astype(np.float32)

    got = np.asarray(M._block_apply(p, jnp.asarray(x), heads=cfg.heads))

    pn = jax.tree_util.tree_map(np.asarray, p)
    d = cfg.width
    y = np_layernorm(x, pn["norm1"]["scale"], pn["norm1"]["bias"], 1e-6)
    qkv = np_linear(pn["attn"]["qkv"], y)
    o = np_mha(qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:], cfg.heads)
    xr = x + np_linear(pn["attn"]["proj"], o)
    y = np_layernorm(xr, pn["norm2"]["scale"], pn["norm2"]["bias"], 1e-6)
    y = np_linear(pn["mlp"]["fc2"], np_gelu(np_linear(pn["mlp"]["fc1"], y)))
    want = xr + y
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
