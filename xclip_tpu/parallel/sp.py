"""Sequence (context) parallelism for transformer block stacks.

Beyond the reference (SURVEY §5: the reference has no sequence/context
parallelism anywhere — text is fixed at 77 tokens, images at 50/197
tokens): activations are sharded along the TOKEN axis over a ``('seq',)``
mesh axis. Per-token ops (LayerNorm, the fused qkv projection, the output
projection, the MLP) run entirely on the local token shard — 1/n of the
activation memory and elementwise FLOPs per device — while attention keeps
queries local and reassembles only K/V with one ``lax.all_gather`` over ICI
per block (Megatron-SP / DeepSpeed-Ulysses style all-gather variant; a
ppermute ring would overlap better at long context, but CLIP's sequences
are far below the crossover).

Numerics match the sequential stack exactly: the all_gather is tiled in
ring order, so gathered K/V rows are the original token order, and the same
fused-qkv matmul + fp32-softmax attention path as ``layers.mha_apply`` runs
on identical values. Sequences that do not divide the mesh are zero-padded
on the token axis; padded KEY columns are masked out of every softmax
(padded QUERY rows attend to token 0 only so their softmax stays finite —
their outputs are sliced away and contribute zero gradient).
"""

from __future__ import annotations

import contextlib
import functools
import inspect

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from xclip_tpu.models import layers as L

SEQ_AXIS = "seq"


def create_seq_mesh(n_seq: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_seq:
        raise ValueError(f"need {n_seq} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))


# ---------------------------------------------------------------------------
# model integration: while a sequence context is active, the transformer
# towers' block loop (models/transformer._run_blocks) routes full-stack runs
# through the token-sharded schedule instead of the sequential local loop.

_ACTIVE = None  # mesh while inside sequence_context


@contextlib.contextmanager
def sequence_context(mesh: Mesh):
    """Route compatible block stacks through sequence parallelism."""
    global _ACTIVE
    prev, _ACTIVE = _ACTIVE, mesh
    try:
        yield
    finally:
        _ACTIVE = prev


def active():
    """The mesh of the enclosing sequence_context, or None."""
    return _ACTIVE


def _sp_block_apply(params, x, q, k_full, v_full, *, heads: int, act: str,
                    mask_rows, dtype=None, ln_eps: float = 1e-5):
    """One residual block on a local token shard given local Q + gathered K/V.

    Mirrors ``transformer.block_apply`` exactly except attention contracts
    local queries against the full-sequence K/V. ``mask_rows`` is the
    (t_local, t_pad) additive-mask slice for this shard's query rows.
    """
    act_fn = L.ACT_FNS[act]
    o = L.attention(q, k_full, v_full, num_heads=heads,
                    mask=mask_rows[None, None].astype(jnp.float32))
    o = L.linear_apply(params["attn"]["out"], o, dtype=dtype)
    if "ls_1" in params:
        o = o * params["ls_1"].astype(o.dtype)
    x = x + o
    y = L.layernorm_apply(params["ln_2"], x, eps=ln_eps)
    y = L.linear_apply(params["mlp"]["c_fc"], y, dtype=dtype)
    y = act_fn(y)
    y = L.linear_apply(params["mlp"]["c_proj"], y, dtype=dtype)
    if "ls_2" in params:
        y = y * params["ls_2"].astype(y.dtype)
    return x + y


def _fused_qkv_local(params, y, *, dtype=None):
    """The same fused (D, 3D) qkv matmul as layers.mha_apply, on the local
    token shard — numerically identical per element to three separate
    projections, one MXU call."""
    d = params["q"]["kernel"].shape[1]
    fused = {"kernel": jnp.concatenate(
        [params["q"]["kernel"], params["k"]["kernel"], params["v"]["kernel"]], axis=1)}
    if "bias" in params["q"]:
        fused["bias"] = jnp.concatenate(
            [params["q"]["bias"], params["k"]["bias"], params["v"]["bias"]])
    qkv = L.linear_apply(fused, y, dtype=dtype)
    return qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]


def _build_mask(t: int, t_pad: int, mask, causal: bool) -> jnp.ndarray:
    """Full (t_pad, t_pad) additive mask: user/causal mask in the top-left,
    padded key columns -inf for real query rows, padded query rows pinned to
    token 0 (finite softmax; outputs discarded)."""
    neg = jnp.float32(-jnp.inf)
    big = jnp.zeros((t_pad, t_pad), jnp.float32)
    if mask is not None:
        m = jnp.asarray(mask, jnp.float32)
        if m.ndim != 2:
            raise ValueError(f"sequence parallelism needs a (T, T) mask, got {m.shape}")
        big = big.at[:t, :t].set(m)
    elif causal:
        big = big.at[:t, :t].set(L.causal_mask(t))
    if t_pad > t:
        cols = jnp.arange(t_pad) >= t
        big = jnp.where(cols[None, :], neg, big)          # no one attends pads
        rows = jnp.arange(t_pad) >= t
        pad_row = jnp.where(jnp.arange(t_pad) == 0, 0.0, neg)
        big = jnp.where(rows[:, None], pad_row[None, :], big)
    return big


def sequence_blocks_apply(
    blocks_params,
    x,
    *,
    mesh: Mesh,
    heads: int,
    act: str = "gelu",
    causal: bool = False,
    mask=None,
    dtype=None,
    ln_eps: float = 1e-5,
):
    """Run the block stack over ``x`` (B, T, D) with tokens sharded over the
    ``seq`` mesh axis -> (B, T, D). Differentiable in params and x."""
    n_seq = mesh.shape[SEQ_AXIS]
    b, t, d = x.shape
    t_local = -(-t // n_seq)
    t_pad = t_local * n_seq
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    big_mask = _build_mask(t, t_pad, mask, causal)

    kw = ("check_vma" if "check_vma" in inspect.signature(jax.shard_map).parameters
          else "check_rep")
    smap = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS, None), P(SEQ_AXIS, None)),
        out_specs=P(None, SEQ_AXIS, None), **{kw: False})

    @smap
    def run(params, x_local, mask_rows):
        h = x_local
        for p in params:
            # qkv on the pre-LN of the local shard; K/V reassembled in token
            # order by the tiled all_gather (its autodiff transpose is a
            # psum_scatter back onto the shards)
            y = L.layernorm_apply(p["ln_1"], h, eps=ln_eps)
            q, k, v = _fused_qkv_local(p["attn"], y, dtype=dtype)
            k_full = jax.lax.all_gather(k, SEQ_AXIS, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, SEQ_AXIS, axis=1, tiled=True)
            h = _sp_block_apply(p, h, q, k_full, v_full, heads=heads, act=act,
                                mask_rows=mask_rows, dtype=dtype, ln_eps=ln_eps)
        return h

    out = run(list(blocks_params), x, big_mask)
    return out[:, :t] if t_pad != t else out


def make_train_step_sp(model, optimizer, mesh: Mesh, cfg=None):
    """Jitted pure-SP CLIP train step over a ('seq',) mesh.

    The step math is :func:`make_train_step_pjit` (committed-inputs mode,
    batch replicated — the parallelism lives in the token axis of the tower
    activations); during tracing a :func:`sequence_context` is active, so
    both towers' full block stacks route through
    :func:`sequence_blocks_apply` (models/transformer._run_blocks).
    """
    from xclip_tpu.train.step import TrainStepCfg
    from xclip_tpu.train.step_pjit import make_train_step_pjit

    return make_train_step_pjit(
        model, optimizer, mesh, cfg or TrainStepCfg(),
        committed_inputs=True,
        batch_spec=P(),
        trace_context=lambda: sequence_context(mesh),
    )
