"""Tensor-parallel (2D data x model mesh) step: correctness vs the DP step.

The TP path must be a pure re-layout: same math, same numbers. We run one
train step on a 2x4 mesh with megatron shardings and compare the loss and
the updated params against the replicated pjit step from the same init.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models.factory import create_model
from xclip_tpu.parallel.mesh import create_mesh
from xclip_tpu.parallel.tp import (
    MODEL_AXIS,
    create_mesh_2d,
    shard_params_tp,
    tp_param_sharding,
)
from xclip_tpu.train import optim, schedule
from xclip_tpu.train.step import TrainStepCfg
from xclip_tpu.train.step_pjit import make_train_step_pjit
from xclip_tpu.parallel.tp import make_train_step_tp

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _batch(n=8, size=224):
    rng = np.random.RandomState(0)
    return {
        "images": rng.randn(n, size, size, 3).astype(np.float32),
        "texts": rng.randint(1, 49000, size=(n, 77)).astype(np.int32),
    }


def test_tp_step_matches_dp():
    model, params, state = create_model("ViT-S-32", precision="fp32")
    tx = optim.adamw(schedule.cosine_lr(1e-3, 10, 100), weight_decay=0.2)
    cfg = TrainStepCfg(precision="fp32")
    batch = _batch()

    mesh1 = create_mesh()
    mesh2 = create_mesh_2d(2, 4)

    # host copies: both steps donate their inputs, and two device_puts with
    # equivalent (replicated) shardings can alias the same buffers — numpy
    # leaves guarantee each put creates fresh ones
    params = jax.tree_util.tree_map(np.asarray, params)
    state = jax.tree_util.tree_map(np.asarray, state)
    p2 = shard_params_tp(mesh2, params)
    o2 = tx.init(p2)
    b2 = jax.device_put(batch, {
        "images": jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec("data")),
        "texts": jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec("data")),
    })
    s2 = jax.device_put(
        state, jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec()))

    p1 = jax.device_put(params, jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec()))
    o1 = tx.init(p1)
    b1 = jax.device_put(batch, {
        "images": jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec("data")),
        "texts": jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec("data")),
    })
    s1 = jax.device_put(
        state, jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec()))

    # replicated-param pjit step (1D data mesh) = ground truth
    step_dp = make_train_step_pjit(model, tx, mesh1, cfg)
    p1n, _, _, m1 = step_dp(p1, s1, o1, b1)

    # TP step on the 2x4 (data, model) mesh
    step_tp = make_train_step_tp(model, tx, mesh2, cfg)
    p2n, _, _, m2 = step_tp(p2, s2, o2, b2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1n), jax.tree_util.tree_leaves(p2n)):
        # Adam's rsqrt amplifies fp32 reduction-order noise; a handful of
        # elements land ~1e-4 apart between the two layouts
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_tp_shardings_actually_shard():
    """The megatron rules place q/k/v + c_fc column-parallel, out + c_proj
    row-parallel, and vocab-shard the token embedding."""
    model, params, state = create_model("ViT-S-32", precision="fp32")
    mesh = create_mesh_2d(2, 4)
    sh = tp_param_sharding(mesh, params)
    blk = sh["text"]["blocks"][0]
    assert blk["attn"]["q"]["kernel"].spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert blk["attn"]["out"]["kernel"].spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    assert blk["mlp"]["c_fc"]["kernel"].spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert blk["mlp"]["c_proj"]["kernel"].spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    assert sh["text"]["token_embedding"].spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    # LN and odd-width leaves stay replicated
    assert blk["ln_1"]["scale"].spec == jax.sharding.PartitionSpec()
    assert sh["logit_scale"].spec == jax.sharding.PartitionSpec()

    p2 = shard_params_tp(mesh, params)
    k = p2["text"]["blocks"][0]["attn"]["q"]["kernel"]
    # committed, device-sharded: each addressable shard holds 1/4 of dim 1
    assert k.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert k.addressable_shards[0].data.shape[1] * 4 == k.shape[1]
