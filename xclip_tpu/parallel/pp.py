"""Pipeline parallelism for transformer block stacks (GPipe-style).

Beyond the reference (NCCL DDP only, SURVEY §2e): the block stack is cut
into ``n_stages`` contiguous stages, one per device along a ``pipe`` mesh
axis; microbatches stream through the stages with ``lax.ppermute`` moving
activations stage-to-stage inside one ``lax.scan``. The backward pass is
plain autodiff: the transpose of ``ppermute`` is the reverse rotation and
the transpose of the scan replays the pipeline in reverse — the standard
fill/drain schedule with no hand-written schedule code.

The public scaling-book recipe (mesh -> shard_map -> ppermute ring) is the
shape of this implementation; efficiency on real hardware comes from the
fill/drain bubble fraction (n_stages-1)/(n_micro+n_stages-1), so pick
``n_micro >> n_stages``.

Embeddings/heads stay replicated (they are a few percent of the FLOPs);
only the homogeneous block stack — where the parameters and the compute
live — is pipelined.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def create_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def stack_block_params(blocks_params, n_stages: int):
    """[n_blocks] block pytrees -> one pytree with leading (n_stages,
    blocks_per_stage) axes (the leading axis is sharded over the pipe)."""
    n_blocks = len(blocks_params)
    if n_blocks % n_stages != 0:
        raise ValueError(f"{n_blocks} blocks do not split into {n_stages} stages")
    per = n_blocks // n_stages
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks_params)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked)


def unstack_block_params(stacked, n_blocks: int):
    """Inverse of :func:`stack_block_params` -> list of block pytrees."""
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape((n_blocks,) + a.shape[2:]), stacked)
    return [jax.tree_util.tree_map(lambda a, _i=i: a[_i], flat) for i in range(n_blocks)]


def pipe_param_sharding(mesh: Mesh, stacked):
    """Stage axis sharded over the pipe, everything else local."""
    def leaf(x):
        return NamedSharding(mesh, P(PIPE_AXIS, *([None] * (x.ndim - 1))))
    return jax.tree_util.tree_map(leaf, stacked)


# ---------------------------------------------------------------------------
# model integration: while a pipeline context is active, the transformer
# towers' block loop (models/transformer._run_blocks) routes full-stack runs
# through the pipeline instead of the sequential Python loop.

_ACTIVE = None  # (mesh, n_micro) while inside pipeline_context


@contextlib.contextmanager
def pipeline_context(mesh: Mesh, n_micro: int):
    """Route compatible block stacks through the pipeline during tracing."""
    global _ACTIVE
    prev, _ACTIVE = _ACTIVE, (mesh, n_micro)
    try:
        yield
    finally:
        _ACTIVE = prev


def active():
    """The (mesh, n_micro) of the enclosing pipeline_context, or None."""
    return _ACTIVE


def pipeline_blocks_apply(
    stacked_params,
    x,
    *,
    mesh: Mesh,
    n_micro: int,
    heads: int,
    act: str = "gelu",
    causal: bool = False,
    mask=None,
    dtype=None,
    ln_eps: float = 1e-5,
    attention_impl: str = "einsum",
):
    """Run the pipelined block stack over ``x`` (B, T, D) -> (B, T, D).

    ``stacked_params`` has leading (n_stages, blocks_per_stage) axes and is
    expected device_put with :func:`pipe_param_sharding`. ``B`` must divide
    into ``n_micro`` microbatches. Differentiable in params and x.
    """
    from xclip_tpu.models.transformer import block_apply

    n_stages = mesh.shape[PIPE_AXIS]
    b, t, d = x.shape
    if b % n_micro != 0:
        raise ValueError(f"batch {b} does not split into {n_micro} microbatches")
    mb = b // n_micro

    def stage_fn(p_stage, h):
        per = jax.tree_util.tree_leaves(p_stage)[0].shape[0]
        for j in range(per):
            pj = jax.tree_util.tree_map(lambda a, _j=j: a[_j], p_stage)
            h = block_apply(pj, h, heads=heads, act=act, causal=causal, mask=mask,
                            dtype=dtype, ln_eps=ln_eps, attention_impl=attention_impl)
        return h

    from jax import shard_map

    # jax.shard_map renamed check_rep -> check_vma across versions
    import inspect

    kw = ("check_vma" if "check_vma" in inspect.signature(shard_map).parameters
          else "check_rep")
    smap = functools.partial(
        shard_map, mesh=mesh, in_specs=(P(PIPE_AXIS), P()),
        out_specs=P(), **{kw: False})

    @smap
    def run(stage_params, micro):  # micro: (n_micro, mb, t, d) replicated
        p = jax.tree_util.tree_map(lambda a: a[0], stage_params)  # my stage
        stage = jax.lax.axis_index(PIPE_AXIS)
        last = n_stages - 1
        n_ticks = n_micro + n_stages - 1
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, tk):
            recv, out = carry
            # stage 0 ingests microbatch tk (clamped once the feed drains)
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(tk, 0, n_micro - 1), axis=0, keepdims=False)
            h = jnp.where(stage == 0, feed, recv)
            y = stage_fn(p, h)
            # the last stage banks its finished microbatch tk-(n_stages-1)
            out_idx = jnp.clip(tk - last, 0, n_micro - 1)
            bank = jnp.logical_and(stage == last, tk >= last)
            cur = jax.lax.dynamic_index_in_dim(out, out_idx, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(bank, y, cur), out_idx, 0)
            # rotate activations to the next stage
            recv = jax.lax.ppermute(y, PIPE_AXIS, fwd_perm)
            return (recv, out), None

        zeros = jnp.zeros((mb, t, d), micro.dtype)
        out0 = jnp.zeros((n_micro, mb, t, d), micro.dtype)
        (_, out), _ = jax.lax.scan(tick, (zeros, out0), jnp.arange(n_ticks))
        # broadcast the last stage's result to every device (psum mask)
        out = jax.lax.psum(jnp.where(stage == last, out, jnp.zeros_like(out)),
                           PIPE_AXIS)
        return out

    micro = x.reshape(n_micro, mb, t, d)
    out = run(stacked_params, micro)
    return out.reshape(b, t, d)


def make_train_step_pp(model, optimizer, mesh: Mesh, cfg=None, *, n_micro: int = 4):
    """Jitted pure-PP CLIP train step over a ('pipe',) mesh.

    The step math is :func:`make_train_step_pjit` (committed-inputs mode,
    batch replicated — pure pipeline, no data axis); during tracing a
    :func:`pipeline_context` is active, so both towers' full block stacks
    route through :func:`pipeline_blocks_apply` (models/transformer.
    _run_blocks). Params stay in the normal pytree layout (replicated) and
    are stacked/sharded onto the stages inside the step.
    """
    from xclip_tpu.train.step import TrainStepCfg
    from xclip_tpu.train.step_pjit import make_train_step_pjit

    return make_train_step_pjit(
        model, optimizer, mesh, cfg or TrainStepCfg(),
        committed_inputs=True,
        batch_spec=P(),
        trace_context=lambda: pipeline_context(mesh, n_micro),
    )
