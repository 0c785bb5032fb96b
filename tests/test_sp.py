"""Sequence parallelism: sharding the token axis with per-block K/V
all_gather is a pure re-layout — outputs and grads must match running the
blocks sequentially, including when the sequence does not divide the mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import layers as L
from xclip_tpu.models.transformer import block_apply, block_init
from xclip_tpu.parallel.sp import (
    create_seq_mesh,
    sequence_blocks_apply,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)

WIDTH, HEADS, B = 32, 4, 4
N_BLOCKS, N_SEQ = 4, 4


def _setup(t, ls_init=None):
    keys = jax.random.split(jax.random.PRNGKey(0), N_BLOCKS)
    blocks = [block_init(k, WIDTH, HEADS, 4.0, ls_init_value=ls_init) for k in keys]
    x = jnp.asarray(np.random.RandomState(0).randn(B, t, WIDTH), jnp.float32)
    mesh = create_seq_mesh(N_SEQ)
    return blocks, x, mesh


def _sequential(blocks, x, mask=None):
    for p in blocks:
        x = block_apply(p, x, heads=HEADS, act="gelu", mask=mask)
    return x


def test_sp_forward_matches_sequential_divisible():
    blocks, x, mesh = _setup(t=8)
    y_ref = _sequential(blocks, x)
    y_sp = sequence_blocks_apply(blocks, x, mesh=mesh, heads=HEADS)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_sp_forward_matches_sequential_padded():
    """t=7 over 4 shards: the pad token must not leak into real tokens."""
    blocks, x, mesh = _setup(t=7)
    y_ref = _sequential(blocks, x)
    y_sp = sequence_blocks_apply(blocks, x, mesh=mesh, heads=HEADS)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_sp_causal_mask_and_layerscale():
    blocks, x, mesh = _setup(t=10, ls_init=1e-1)
    mask = L.causal_mask(10)
    y_ref = _sequential(blocks, x, mask=mask)
    y_sp = sequence_blocks_apply(blocks, x, mesh=mesh, heads=HEADS, mask=mask)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_sp_grads_match_sequential():
    blocks, x, mesh = _setup(t=7)
    mask = L.causal_mask(7)

    def loss_seq(bp, xx):
        return jnp.sum(_sequential(bp, xx, mask=mask) ** 2)

    def loss_sp(bp, xx):
        y = sequence_blocks_apply(bp, xx, mesh=mesh, heads=HEADS, mask=mask)
        return jnp.sum(y ** 2)

    g_seq_p, g_seq_x = jax.grad(loss_seq, argnums=(0, 1))(blocks, x)
    g_sp_p, g_sp_x = jax.jit(jax.grad(loss_sp, argnums=(0, 1)))(blocks, x)

    np.testing.assert_allclose(np.asarray(g_sp_x), np.asarray(g_seq_x),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq_p),
                    jax.tree_util.tree_leaves(g_sp_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3)


def test_sp_train_step_matches_dp():
    """The pure-SP CLIP train step (both towers token-sharded over a 4-way
    seq mesh; ViT 50 tokens and text 77 tokens both pad) matches the
    replicated DP pjit step from the same init."""
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.parallel.sp import create_seq_mesh, make_train_step_sp
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
    rep1 = jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec())
    p1 = jax.device_put(params, rep1)
    s1 = jax.device_put(state, rep1)
    b1 = jax.device_put(batch, {
        "images": jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec("data")),
        "texts": jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec("data")),
    })
    p1n, _, _, m1 = step_dp(p1, s1, tx.init(p1), b1)

    smesh = create_seq_mesh(4)
    step_sp = make_train_step_sp(model, tx, smesh, cfg)
    rep = jax.sharding.NamedSharding(smesh, jax.sharding.PartitionSpec())
    p2 = jax.device_put(params, rep)
    s2 = jax.device_put(state, rep)
    b2 = jax.device_put(batch, {"images": rep, "texts": rep})
    p2n, _, _, m2 = step_sp(p2, s2, tx.init(p2), b2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-5)
    # post-AdamW params: the normalized update (m/sqrt(v)) amplifies tiny
    # cross-schedule grad diffs to the lr scale — same tolerance as the PP
    # equivalence test
    for a, b in zip(jax.tree_util.tree_leaves(p1n), jax.tree_util.tree_leaves(p2n)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)
