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
