"""Pallas flash attention for TPU.

The reference's attention is torch scaled_dot_product_attention inside
ResidualAttentionBlock (deps/open_clip/src/open_clip/transformer.py:89-185).
At CLIP-RN50/B-32 sequence lengths (50/77 tokens) XLA's fused attention is
already compute-bound, so the default path uses plain einsum attention
(models/layers.py); this kernel is the memory-efficient path for the longer
towers (ViT-L/14: 257 tokens, ViT-H/14: 257, 336px variants: 577+), enabled
via ``attention_impl='flash'``.

Standard single-pass online-softmax tiling: Q blocks stream over KV blocks
with running (max, sum, accumulator) carried in VMEM; logits never
materialize in HBM. fp32 accumulation, bf16 IO.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, causal: bool,
                  block_k: int, seq_len: int):
    """Grid: (batch*heads, num_q_blocks). Refs are (block_q, d) / (seq, d)."""
    block_q = q_ref.shape[0]
    head_dim = q_ref.shape[1]
    q_idx = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32) * sm_scale

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, head_dim), jnp.float32)

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)

        # mask out-of-range keys (padded tail) and causal region
        key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = key_ids < seq_len
        if causal:
            q_ids = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, key_ids <= q_ids)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc_prev + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    if causal:
        # only blocks with key_start <= q_end participate
        last_block = jnp.minimum(
            (q_idx + 1) * block_q // block_k + 1, num_k_blocks
        )
    else:
        last_block = num_k_blocks
    m, l, acc = jax.lax.fori_loop(0, last_block, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, L, D) attention with online softmax. Returns (B, H, L, D)."""
    b, h, seq_len, head_dim = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)

    block_q = min(block_q, max(seq_len, 8))
    block_k = min(block_k, max(seq_len, 8))

    q3 = _pad_to(q.reshape(b * h, seq_len, head_dim), block_q, axis=1)
    k3 = _pad_to(k.reshape(b * h, seq_len, head_dim), block_k, axis=1)
    v3 = _pad_to(v.reshape(b * h, seq_len, head_dim), block_k, axis=1)
    padded_q = q3.shape[1]

    grid = (b * h, padded_q // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, sm_scale=sm_scale, causal=causal, block_k=block_k, seq_len=seq_len
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, head_dim), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((None, k3.shape[1], head_dim), lambda bh, qb: (bh, 0, 0)),
            pl.BlockSpec((None, v3.shape[1], head_dim), lambda bh, qb: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, head_dim), lambda bh, qb: (bh, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, padded_q, head_dim), q.dtype),
        interpret=interpret,
    )(q3, k3, v3)
    return out[:, :seq_len].reshape(b, h, seq_len, head_dim)


def flash_mha(q, k, v, *, num_heads: int, causal: bool = False, interpret: bool = False):
    """(B, L, D) convenience wrapper matching models.layers.attention's
    layout contract."""
    b, l, d = q.shape
    hd = d // num_heads

    def split(x):
        return x.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)

    out = flash_attention(split(q), split(k), split(v), causal=causal, interpret=interpret)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d)
