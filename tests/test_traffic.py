"""xclip_tpu.utils.traffic: the jaxpr-walking perfect-fusion traffic floor
(tools/traffic_model.py + the bench roofline_attainment key)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xclip_tpu.utils.traffic import min_bytes_per_step, optimizer_traffic_bytes


def test_single_dot_exact_bytes():
    a = jnp.zeros((256, 512), jnp.bfloat16)
    b = jnp.zeros((512, 128), jnp.bfloat16)
    res = min_bytes_per_step(lambda a, b: a @ b, a, b)
    expected = 2 * (256 * 512 + 512 * 128 + 256 * 128)
    assert res["total"] == expected
    assert res["by_kind"] == {"dot": expected}


def test_elementwise_is_free_and_tiny_ignored():
    x = jnp.zeros((1024, 1024), jnp.float32)
    res = min_bytes_per_step(lambda x: jax.nn.relu(x * 2.0 + 1.0), x)
    assert res["total"] == 0
    # dots under the 16 KiB floor are scheduler noise, not traffic
    t = jnp.zeros((8, 8), jnp.float32)
    assert min_bytes_per_step(lambda t: t @ t, t)["total"] == 0


def test_scan_multiplies_body_traffic():
    w = jnp.zeros((256, 256), jnp.bfloat16)
    x = jnp.zeros((64, 256), jnp.bfloat16)

    def fn(w, x):
        def body(carry, _):
            return carry @ w, None
        y, _ = jax.lax.scan(body, x, None, length=5)
        return y

    res = min_bytes_per_step(fn, w, x)
    per_iter = 2 * (64 * 256 + 256 * 256 + 64 * 256)
    assert res["total"] == 5 * per_iter


def test_grad_charges_backward_dots():
    w = jnp.zeros((256, 512), jnp.bfloat16)
    x = jnp.zeros((128, 256), jnp.bfloat16)

    def loss(w):
        return jnp.sum((x @ w).astype(jnp.float32))

    fwd = min_bytes_per_step(loss, w)["total"]
    fwdbwd = min_bytes_per_step(jax.value_and_grad(loss), w)["total"]
    assert fwdbwd > fwd  # the wgrad contraction is charged too


def test_adamw_floor_is_seven_fp32_passes():
    params = {"a": jnp.zeros((1000,)), "b": jnp.zeros((24, 24))}
    assert optimizer_traffic_bytes(params) == (1000 + 24 * 24) * 4 * 7


def test_train_step_floor_sane():
    """The full tiny-CLIP train step floor is positive, conv+dot dominated,
    and well under the HLO bytes-accessed overcount."""
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step
    from tests.test_train import TINY_RN

    mesh = create_mesh()
    model = CLIPModel(clip_cfg_from_dict(TINY_RN))
    params, state = model.init(jax.random.PRNGKey(0))
    tx = optim.adamw(schedule.cosine_lr(1e-3, 5, 100), weight_decay=0.2)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="bf16"))
    batch = {
        "images": jnp.zeros((16, model.cfg.image_size, model.cfg.image_size, 3), jnp.float32),
        "texts": jnp.zeros((16, 12), jnp.int32),
    }
    res = min_bytes_per_step(lambda p, s, o, b: step(p, s, o, b),
                             params, state, opt_state, batch,
                             include_adamw_over=params)
    assert res["total"] > 0
    assert set(res["by_kind"]) <= {"conv", "dot", "gather", "scatter", "adamw"}
    assert res["by_kind"].get("conv", 0) + res["by_kind"].get("dot", 0) > 0


def test_two_class_bandwidth_roofline():
    from xclip_tpu.utils.traffic import bandwidth_roofline_seconds

    # 30 GB floor, 3 GB of it AdamW: 27/450 + 3/500 = 0.066 s
    s = bandwidth_roofline_seconds(30e9, 3e9, 450.0, 500.0)
    assert abs(s - (27 / 450 + 3 / 500)) < 1e-9
    # degenerate: no adamw bytes -> pure bf16-rate division
    assert abs(bandwidth_roofline_seconds(10e9, 0, 400.0, 500.0) - 10 / 400) < 1e-9
    # equal rates collapse to single-class
    assert abs(bandwidth_roofline_seconds(10e9, 4e9, 500.0, 500.0) - 10 / 500) < 1e-9
