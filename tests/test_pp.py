"""Pipeline parallelism: the GPipe ppermute/scan schedule is a pure
re-ordering — outputs and grads must match running the blocks sequentially."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models.transformer import block_apply, block_init
from xclip_tpu.parallel.pp import (
    create_pipe_mesh,
    pipe_param_sharding,
    pipeline_blocks_apply,
    stack_block_params,
    unstack_block_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)

WIDTH, HEADS, T, B = 32, 4, 8, 4
N_BLOCKS, N_STAGES, N_MICRO = 8, 4, 2


def _setup():
    keys = jax.random.split(jax.random.PRNGKey(0), N_BLOCKS)
    blocks = [block_init(k, WIDTH, HEADS, 4.0) for k in keys]
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, WIDTH), jnp.float32)
    mesh = create_pipe_mesh(N_STAGES)
    stacked = stack_block_params(blocks, N_STAGES)
    stacked = jax.device_put(stacked, pipe_param_sharding(mesh, stacked))
    return blocks, stacked, x, mesh


def _sequential(blocks, x):
    for p in blocks:
        x = block_apply(p, x, heads=HEADS, act="gelu", causal=True)
    return x


def test_pp_forward_matches_sequential():
    blocks, stacked, x, mesh = _setup()
    y_ref = _sequential(blocks, x)
    y_pp = pipeline_blocks_apply(
        stacked, x, mesh=mesh, n_micro=N_MICRO, heads=HEADS, causal=True)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_pp_grads_match_sequential():
    blocks, stacked, x, mesh = _setup()

    def loss_seq(bp, xx):
        return jnp.sum(_sequential(bp, xx) ** 2)

    def loss_pp(sp, xx):
        y = pipeline_blocks_apply(
            sp, xx, mesh=mesh, n_micro=N_MICRO, heads=HEADS, causal=True)
        return jnp.sum(y ** 2)

    g_seq_p, g_seq_x = jax.grad(loss_seq, argnums=(0, 1))(blocks, x)
    g_pp_p, g_pp_x = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, x)
    g_pp_p = unstack_block_params(g_pp_p, N_BLOCKS)

    np.testing.assert_allclose(np.asarray(g_pp_x), np.asarray(g_seq_x),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq_p),
                    jax.tree_util.tree_leaves(g_pp_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3)


def test_pp_stack_roundtrip():
    blocks, _, _, _ = _setup()
    rt = unstack_block_params(stack_block_params(blocks, N_STAGES), N_BLOCKS)
    for a, b in zip(jax.tree_util.tree_leaves(blocks), jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_train_step_matches_dp():
    """The pure-PP CLIP train step (both towers pipelined over a 4-stage
    mesh) matches the replicated DP pjit step from the same init."""
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.parallel.pp import create_pipe_mesh, make_train_step_pp
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg
    from xclip_tpu.train.step_pjit import make_train_step_pjit

    model, params, state = create_model("ViT-S-32", precision="fp32")
    params = jax.tree_util.tree_map(np.asarray, params)
    state = jax.tree_util.tree_map(np.asarray, state)
    tx = optim.adamw(schedule.cosine_lr(1e-3, 10, 100), weight_decay=0.2)
    cfg = TrainStepCfg(precision="fp32")
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(8, 224, 224, 3).astype(np.float32),
        "texts": rng.randint(1, 49000, size=(8, 77)).astype(np.int32),
    }

    mesh1 = create_mesh()
    step_dp = make_train_step_pjit(model, tx, mesh1, cfg)
    p1 = jax.device_put(params, jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec()))
    s1 = jax.device_put(state, jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec()))
    b1 = jax.device_put(batch, {
        "images": jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec("data")),
        "texts": jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec("data")),
    })
    p1n, _, _, m1 = step_dp(p1, s1, tx.init(p1), b1)

    pmesh = create_pipe_mesh(4)
    step_pp = make_train_step_pp(model, tx, pmesh, cfg, n_micro=2)
    rep = jax.sharding.NamedSharding(pmesh, jax.sharding.PartitionSpec())
    p2 = jax.device_put(params, rep)
    s2 = jax.device_put(state, rep)
    b2 = jax.device_put(batch, {"images": rep, "texts": rep})
    p2n, _, _, m2 = step_pp(p2, s2, tx.init(p2), b2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1n), jax.tree_util.tree_leaves(p2n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
