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
