"""Pallas kernel tests (interpret mode on CPU): flash attention vs the
reference einsum attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models.layers import attention, causal_mask
from xclip_tpu.ops.flash_attention import flash_attention, flash_mha


def _qkv(b=2, h=4, l=77, d=32, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(b, h, l, d).astype(np.float32)) for _ in range(3)]


@pytest.mark.parametrize("l", [50, 77, 128, 200])
def test_flash_matches_dense(l):
    q, k, v = _qkv(l=l)
    out = flash_attention(q, k, v, interpret=True, block_q=64, block_k=64)
    # dense reference
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_causal_matches_dense():
    q, k, v = _qkv(l=77)
    out = flash_attention(q, k, v, causal=True, interpret=True, block_q=32, block_k=32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    s = s + causal_mask(77)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_mha_matches_layer_attention():
    rng = np.random.RandomState(0)
    b, l, d, h = 2, 77, 64, 4
    q, k, v = [jnp.asarray(rng.randn(b, l, d).astype(np.float32)) for _ in range(3)]
    ref = attention(q, k, v, num_heads=h)
    got = flash_mha(q, k, v, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bf16_io():
    q, k, v = [x.astype(jnp.bfloat16) for x in _qkv(l=64)]
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_conv1x1_batchnorm_matches_reference_path():
    """Input-derived BN stats (conv1x1_batchnorm_apply) must equal the
    conv->batchnorm two-op path: same normalized output, same running-stat
    update (different summation order only)."""
    import numpy as np

    from xclip_tpu.models import layers as L

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(4, 7, 7, 16).astype(np.float32)) * 2.0 + 0.5
    conv = L.conv_init(jax.random.PRNGKey(1), 16, 24, 1)
    bn_p, bn_s = L.batchnorm_init(24)
    bn_s = {"mean": jnp.asarray(rng.randn(24).astype(np.float32)),
            "var": jnp.abs(jnp.asarray(rng.randn(24).astype(np.float32))) + 0.5}

    for train in (True, False):
        y_ref = L.conv_apply(conv, z)
        y_ref, s_ref = L.batchnorm_apply(bn_p, bn_s, y_ref, train=train)
        y_fused, s_fused = L.conv1x1_batchnorm_apply(conv, bn_p, bn_s, z, train=train)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_fused["mean"]), np.asarray(s_ref["mean"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_fused["var"]), np.asarray(s_ref["var"]),
                                   rtol=1e-3, atol=1e-4)

    # gradients flow and match the two-op path
    def loss_fused(conv, z):
        y, _ = L.conv1x1_batchnorm_apply(conv, bn_p, bn_s, z, train=True)
        return jnp.sum(y**2)

    def loss_ref(conv, z):
        y = L.conv_apply(conv, z)
        y, _ = L.batchnorm_apply(bn_p, bn_s, y, train=True)
        return jnp.sum(y**2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(conv, z)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(conv, z)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_conv1x1_batchnorm_with_bias():
    import numpy as np

    from xclip_tpu.models import layers as L

    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(2, 5, 5, 8).astype(np.float32))
    conv = L.conv_init(jax.random.PRNGKey(2), 8, 12, 1, bias=True)
    conv["bias"] = jnp.asarray(rng.randn(12).astype(np.float32))
    bn_p, bn_s = L.batchnorm_init(12)

    y_ref = L.conv_apply(conv, z)
    y_ref, s_ref = L.batchnorm_apply(bn_p, bn_s, y_ref, train=True)
    y_fused, s_fused = L.conv1x1_batchnorm_apply(conv, bn_p, bn_s, z, train=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_fused["var"]), np.asarray(s_ref["var"]),
                               rtol=1e-3, atol=1e-4)


class TestFusedConv:
    def _mk(self, m=128, k=32, c=64, seed=0):
        import numpy as np
        rng = np.random.RandomState(seed)
        z = jnp.asarray(rng.randn(m, k).astype(np.float32))
        w = jnp.asarray(rng.randn(k, c).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        ident = jnp.asarray(rng.randn(m, c).astype(np.float32))
        return z, w, g, b, ident

    def test_matmul_affine_act_values(self):
        import numpy as np
        from xclip_tpu.ops.fused_conv import matmul_affine_act

        z, w, g, b, ident = self._mk()
        ref = jnp.maximum((z @ w) * g + b + ident, 0.0)
        out = matmul_affine_act(z, w, g, b, ident, relu=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
        # no identity, no relu
        ref2 = (z @ w) * g + b
        out2 = matmul_affine_act(z, w, g, b, relu=False)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5, atol=1e-5)

    def test_matmul_affine_act_grads(self):
        import numpy as np
        from xclip_tpu.ops.fused_conv import matmul_affine_act

        z, w, g, b, ident = self._mk()

        def f_fused(z, w, g, b, ident):
            return jnp.sum(matmul_affine_act(z, w, g, b, ident, relu=True) ** 2)

        def f_ref(z, w, g, b, ident):
            return jnp.sum(jnp.maximum((z @ w) * g + b + ident, 0.0) ** 2)

        g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(z, w, g, b, ident)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(z, w, g, b, ident)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)

    def test_matmul_stats_values_and_grads(self):
        import numpy as np
        from xclip_tpu.ops.fused_conv import matmul_stats

        z, w, _, _, _ = self._mk(m=256, k=16, c=32, seed=1)
        y, s1, s2 = matmul_stats(z, w)
        ref_y = z @ w
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(ref_y.sum(0)), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s2), np.asarray((ref_y**2).sum(0)), rtol=1e-4, atol=1e-3)

        def f_fused(z, w):
            y, s1, s2 = matmul_stats(z, w)
            return jnp.sum(y**2) + jnp.sum(s1 * 0.5) + jnp.sum(s2 * 0.25)

        def f_ref(z, w):
            y = z @ w
            return jnp.sum(y**2) + jnp.sum(y.sum(0) * 0.5) + jnp.sum((y**2).sum(0) * 0.25)

        g1 = jax.grad(f_fused, argnums=(0, 1))(z, w)
        g2 = jax.grad(f_ref, argnums=(0, 1))(z, w)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)

    def test_bf16_io(self):
        import numpy as np
        from xclip_tpu.ops.fused_conv import matmul_affine_act, matmul_stats

        z, w, g, b, ident = self._mk()
        zb, wb, ib = z.astype(jnp.bfloat16), w.astype(jnp.bfloat16), ident.astype(jnp.bfloat16)
        out = matmul_affine_act(zb, wb, g, b, ib, relu=True)
        assert out.dtype == jnp.bfloat16
        ref = jnp.maximum((zb.astype(jnp.float32) @ wb.astype(jnp.float32)) * g + b
                          + ib.astype(jnp.float32), 0.0)
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2)
        y, s1, s2 = matmul_stats(zb, wb)
        assert y.dtype == jnp.bfloat16 and s1.dtype == jnp.float32


def test_pallas_bottleneck_matches_xla_path(monkeypatch):
    """_bottleneck_apply_pallas (interpret mode here) must reproduce the XLA
    bottleneck path: outputs, new BN state, and input/param grads."""
    import numpy as np

    import xclip_tpu.models.resnet as R

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    params, state = R._bottleneck_init(jax.random.PRNGKey(0), 32, 8, stride=2)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # non-trivial bn3 scale (zero-init would null the conv3 branch)
    params["bn3"]["scale"] = jnp.ones_like(params["bn3"]["scale"]) * 0.7

    for train in (True, False):
        monkeypatch.setenv("XCLIP_PALLAS_BLOCK", "0")
        ref, s_ref = R._bottleneck_apply(params, state, x, stride=2, train=train, dtype=None)
        monkeypatch.setenv("XCLIP_PALLAS_BLOCK", "1")
        got, s_got = R._bottleneck_apply(params, state, x, stride=2, train=train, dtype=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
        for k in s_ref:
            for kk in s_ref[k]:
                np.testing.assert_allclose(
                    np.asarray(s_got[k][kk]), np.asarray(s_ref[k][kk]),
                    rtol=1e-4, atol=1e-5, err_msg=f"{k}.{kk} train={train}")

    def loss(p, x, flag):
        monkeypatch.setenv("XCLIP_PALLAS_BLOCK", flag)
        out, _ = R._bottleneck_apply(p, state, x, stride=2, train=True, dtype=None)
        return jnp.sum(out**2)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, x, "0")
    g_got = jax.grad(loss, argnums=(0, 1))(params, x, "1")
    for a, r in zip(jax.tree_util.tree_leaves(g_got), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=5e-3, atol=5e-3)


def test_conv_s2d_equals_strided_conv():
    """layers.conv_s2d_apply (space-to-depth stem rewrite) computes exactly
    the 3x3/stride-2/pad-1 convolution it replaces."""
    import jax
    import numpy as np

    from xclip_tpu.models import layers as L

    rng = np.random.RandomState(0)
    for cin, cout, hw in ((3, 32, 16), (8, 16, 8)):
        params = {"kernel": jax.numpy.asarray(
            rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)}
        x = jax.numpy.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
        want = L.conv_apply(params, x, stride=2, padding=1)
        got = L.conv_s2d_apply(params, x)
        assert got.shape == want.shape == (2, hw // 2, hw // 2, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    # with a bias too
    params["bias"] = jax.numpy.asarray(rng.randn(16).astype(np.float32))
    want = L.conv_apply(params, x, stride=2, padding=1)
    got = L.conv_s2d_apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_s2d_stem_env_gate(monkeypatch):
    """XCLIP_S2D_STEM=1 routes the stem's stride-2 conv through the s2d
    rewrite with identical RN50 stage outputs."""
    import os

    import jax
    import numpy as np

    from xclip_tpu.models import resnet as R

    cfg = R.ResNetCfg(layers=(1, 1, 1, 1), width=16, output_dim=64, heads=8, image_size=32)
    params, state = R.resnet_init(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)

    monkeypatch.delenv("XCLIP_S2D_STEM", raising=False)
    base, _, _ = R.resnet_apply(params, state, x, cfg, train=True)
    monkeypatch.setenv("XCLIP_S2D_STEM", "1")
    s2d, _, _ = R.resnet_apply(params, state, x, cfg, train=True)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(base), atol=2e-5, rtol=1e-4)


def test_conv1x1_dot_env_gate(monkeypatch):
    """XCLIP_1X1_DOT=1 lowers 1x1 convs to reshaped matmuls with identical
    values and gradients (incl. the strided-downsample slice case)."""
    import jax
    import numpy as np

    from xclip_tpu.models import layers as L

    rng = np.random.RandomState(0)
    for stride, bias in ((1, False), (1, True), (2, False)):
        params = {"kernel": jax.numpy.asarray(
            rng.randn(1, 1, 8, 16).astype(np.float32) * 0.1)}
        if bias:
            params["bias"] = jax.numpy.asarray(rng.randn(16).astype(np.float32))
        x = jax.numpy.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

        def loss(p, x):
            return (L.conv_apply(p, x, stride=stride) ** 2).sum()

        monkeypatch.delenv("XCLIP_1X1_DOT", raising=False)
        want = L.conv_apply(params, x, stride=stride)
        gw = jax.grad(loss, argnums=(0, 1))(params, x)
        monkeypatch.setenv("XCLIP_1X1_DOT", "1")
        got = L.conv_apply(params, x, stride=stride)
        gg = jax.grad(loss, argnums=(0, 1))(params, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gg[0]["kernel"]), np.asarray(gw[0]["kernel"]),
                                   atol=1e-4, rtol=1e-4)
        if bias:
            np.testing.assert_allclose(np.asarray(gg[0]["bias"]), np.asarray(gw[0]["bias"]),
                                       atol=1e-4, rtol=1e-4)
        # d(loss)/dx: the strided dot path transposes through a strided
        # slice, structurally unlike the conv transpose — pin it too.
        np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gw[1]),
                                   atol=1e-4, rtol=1e-4)
