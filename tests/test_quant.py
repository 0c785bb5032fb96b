"""Int8 quantization (core/quant.py) — the TPU-native --use-bnb-linear.

Reference semantics pinned here: replace_linear targets only c_fc/c_proj
(open_clip/utils.py:65), SwitchBack = int8 forward + 16-bit straight-through
backward (arXiv:2304.13013), inference mode stores int8 weights
(utils.py:84-90, training/main.py:422-425).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.core import quant
from xclip_tpu.models import layers as L
from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

TINY_VIT = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 64,
                 "heads": 4, "layers": 2},
}


@pytest.fixture(autouse=True)
def _reset_switchback():
    yield
    quant.set_switchback(False)


def test_weight_quant_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(128, 64).astype(np.float32))
    q, scale = quant.quantize_weight(w)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * scale
    # symmetric 8-bit: error <= scale/2 per element, per output channel
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(scale)[None, :] * 0.5 + 1e-7).all()


def test_int8_linear_close_to_fp32():
    rng = np.random.RandomState(1)
    p = {"kernel": jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.05),
         "bias": jnp.asarray(rng.randn(128).astype(np.float32) * 0.01)}
    x = jnp.asarray(rng.randn(32, 256).astype(np.float32))
    ref = L.linear_apply(p, x)
    out = quant.int8_linear_apply(quant.quantize_linear_params(p), x)
    cos = np.sum(np.asarray(ref) * np.asarray(out), axis=1) / (
        np.linalg.norm(np.asarray(ref), axis=1)
        * np.linalg.norm(np.asarray(out), axis=1))
    assert cos.min() > 0.999
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02


def test_linear_apply_dispatches_on_int8_leaf():
    rng = np.random.RandomState(2)
    p = {"kernel": jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    qp = quant.quantize_linear_params(p)
    np.testing.assert_array_equal(
        np.asarray(L.linear_apply(qp, x)),
        np.asarray(quant.int8_linear_apply(qp, x)))


def test_quantize_params_scoped_to_include_modules():
    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, _ = model.init(jax.random.PRNGKey(0))
    qparams = quant.quantize_params(params)
    vblock = qparams["visual"]["blocks"][0]
    tblock = qparams["text"]["blocks"][0]
    for blk in (vblock, tblock):
        assert "kernel_int8" in blk["mlp"]["c_fc"]
        assert "kernel_int8" in blk["mlp"]["c_proj"]
        # attention linears stay fp (reference include_modules default)
        assert "kernel" in blk["attn"]["q"]
    # the projection (a raw array leaf) is untouched
    np.testing.assert_array_equal(np.asarray(qparams["visual"]["proj"]),
                                  np.asarray(params["visual"]["proj"]))


def test_quantized_model_features_close():
    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    txts = jnp.asarray(rng.randint(1, 128, (4, 16)).astype(np.int32))

    ref = model.forward(params, imgs, txts, state=state)
    out = model.forward(quant.quantize_params(params), imgs, txts, state=state)
    for k in ("image_features", "text_features"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        cos = (a * b).sum(1)  # features are L2-normalized
        assert cos.min() > 0.99, k


def test_switchback_matmul_matches_fp32_within_quant_error():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.05)
    y = quant.switchback_matmul(x, w)
    ref = x @ w
    rel = np.linalg.norm(np.asarray(y - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02


def test_switchback_backward_is_dequantized_weight_grad():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32) * 0.1)

    def loss_sb(x, w):
        return jnp.sum(quant.switchback_matmul(x, w) ** 2)

    def loss_fp(x, w):
        return jnp.sum((x @ w) ** 2)

    gx, gw = jax.grad(loss_sb, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_fp, argnums=(0, 1))(x, w)
    # straight-through: grads computed against the full-precision weight, so
    # they match fp32 grads up to the forward's quantization error in g
    assert np.linalg.norm(gx - rx) / np.linalg.norm(rx) < 0.05
    assert np.linalg.norm(gw - rw) / np.linalg.norm(rw) < 0.05
    assert np.isfinite(np.asarray(gx)).all() and np.isfinite(np.asarray(gw)).all()


def test_switchback_train_step_runs_and_descends():
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    quant.set_switchback(True)
    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, state = model.init(jax.random.PRNGKey(0))
    tx = optim.adamw(schedule.const_lr(1e-3, 0, 10), weight_decay=0.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, create_mesh(),
                           TrainStepCfg(precision="fp32", accum_freq=1))
    rng = np.random.RandomState(6)
    batch = {
        "images": rng.rand(8, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 128, (8, 16)).astype(np.int32),
    }
    losses = []
    for _ in range(4):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_switchback_composes_with_zero_pjit():
    """--use-bnb-linear under --parallelism zero: the SwitchBack matmuls
    trace inside the pjit global-math step and the sharded step matches the
    shard_map DP step bit-for-bit in loss."""
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step
    from xclip_tpu.train.step_pjit import make_train_step_pjit, zero_sharding

    quant.set_switchback(True)
    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.const_lr(1e-3, 0, 10), weight_decay=0.0)
    opt_state = tx.init(params)
    rng = np.random.RandomState(7)
    batch = {
        "images": rng.rand(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 128, (16, 16)).astype(np.int32),
    }

    ref_step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
    _, _, _, ref_metrics = ref_step(
        jax.tree_util.tree_map(lambda x: x.copy(), params), state,
        tx.init(params), dict(batch))

    params_sh = jax.device_put(params, zero_sharding(mesh, params))
    opt_sh = jax.device_put(opt_state, zero_sharding(mesh, opt_state))
    step = make_train_step_pjit(
        model, tx, mesh, TrainStepCfg(precision="fp32"),
        shard_params=True, example_params=params, example_opt_state=opt_state)
    _, _, _, metrics = step(params_sh, state, opt_sh, batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)


def test_cli_flag_surface():
    from xclip_tpu.train.params import parse_args

    args = parse_args(["--train-data", "x.tsv",
                       "--use-bnb-linear", "SwitchBackLinearGlobal"])
    assert args.use_bnb_linear == "SwitchBackLinearGlobal"
    assert parse_args(["--train-data", "x.tsv"]).use_bnb_linear is None
