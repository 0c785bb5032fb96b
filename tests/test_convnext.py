"""Native ConvNeXt vision towers: shape contract, open_clip/timm state-dict
naming, bridge round-trips, and CLIP integration.

No numerics oracle exists in this image (timm absent — the reference builds
these towers through timm, timm_model.py:60-107), so golden parity is
explicitly out of scope here; architecture/naming/round-trip are pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import convnext as CN

TINY = CN.ConvNeXtCfg(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                      output_dim=24, image_size=32, proj="linear")


def _x(n=2, size=32):
    return np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)


def test_forward_shapes_and_capture():
    params = CN.convnext_init(jax.random.PRNGKey(0), TINY)
    out, inters = CN.convnext_apply(params, _x(), TINY,
                                    capture=["stem", "stages.2.1", "head"])
    assert out.shape == (2, 24) and out.dtype == jnp.float32
    assert inters["stem"].shape == (2, 8, 8, 16)        # 4x4/s4 stem
    assert inters["stages.2.1"].shape == (2, 2, 2, 64)  # /16 at stage 3
    np.testing.assert_allclose(np.asarray(inters["head"]), np.asarray(out))
    assert CN.convnext_stage_names(TINY)[0] == "stem"
    assert CN.convnext_stage_names(TINY)[-1] == "head"


def test_state_dict_naming_and_roundtrip():
    """Exported keys use the open_clip TimmModel layout (trunk.* + head.*,
    timm convnext block naming) and the bridge round-trips exactly."""
    params = CN.convnext_init(jax.random.PRNGKey(1), TINY)
    sd = CN.convnext_params_to_state_dict(params, TINY)
    # timm convnext trunk naming (timm>=0.8 blocks: conv_dw/norm/mlp/gamma)
    for key, shape in (
        ("trunk.stem.0.weight", (16, 3, 4, 4)),
        ("trunk.stem.1.weight", (16,)),
        ("trunk.stages.1.downsample.0.weight", (16,)),
        ("trunk.stages.1.downsample.1.weight", (32, 16, 2, 2)),
        ("trunk.stages.2.blocks.1.conv_dw.weight", (64, 1, 7, 7)),
        ("trunk.stages.2.blocks.1.mlp.fc1.weight", (256, 64)),
        ("trunk.stages.2.blocks.1.gamma", (64,)),
        ("trunk.head.norm.weight", (128,)),
        ("head.proj.weight", (24, 128)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    assert "trunk.stages.0.downsample.0.weight" not in sd  # stage 0: no ds
    assert "head.proj.bias" not in sd  # open_clip proj_bias=False default

    params2 = CN.convnext_state_dict_to_params(sd, TINY)
    x = _x()
    out1, _ = CN.convnext_apply(params, x, TINY)
    out2, _ = CN.convnext_apply(params2, x, TINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_mlp_head_variant():
    """timm_proj 'mlp' (convnext_large_d family): Mlp head with hidden
    2*embed_dim (timm_model.py:105-106)."""
    cfg = CN.ConvNeXtCfg(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                         output_dim=24, image_size=32, proj="mlp")
    params = CN.convnext_init(jax.random.PRNGKey(0), cfg)
    assert params["head"]["mlp"]["fc1"]["kernel"].shape == (128, 48)
    out, _ = CN.convnext_apply(params, _x(), cfg)
    assert out.shape == (2, 24)
    sd = CN.convnext_params_to_state_dict(params, cfg)
    assert "head.mlp.fc1.weight" in sd and "head.mlp.fc1.bias" in sd
    assert "head.mlp.fc2.bias" not in sd  # second linear: proj_bias=False
    params2 = CN.convnext_state_dict_to_params(sd, cfg)
    out2, _ = CN.convnext_apply(params2, _x(), cfg)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


def test_drop_path_train_mode():
    cfg = CN.ConvNeXtCfg(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                         output_dim=24, image_size=32, drop_path_rate=0.5)
    params = CN.convnext_init(jax.random.PRNGKey(0), cfg)
    x = _x(8)
    base, _ = CN.convnext_apply(params, x, cfg, train=False)
    t1, _ = CN.convnext_apply(params, x, cfg, train=True, rng=jax.random.PRNGKey(1))
    t2, _ = CN.convnext_apply(params, x, cfg, train=True, rng=jax.random.PRNGKey(2))
    # stochastic depth changes outputs per rng; eval path is deterministic
    assert float(jnp.abs(t1 - t2).max()) > 0
    base2, _ = CN.convnext_apply(params, x, cfg, train=False)
    np.testing.assert_allclose(np.asarray(base2), np.asarray(base), atol=0)


CLIP_D = {
    "embed_dim": 24,
    "vision_cfg": {
        "timm_model_name": "convnext_test_tiny",
        "timm_pool": "",
        "timm_proj": "linear",
        "timm_drop_path": 0.1,
        "image_size": 32,
    },
    "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                 "heads": 4, "layers": 2},
}


@pytest.fixture()
def tiny_variant(monkeypatch):
    monkeypatch.setitem(CN.VARIANTS, "convnext_test_tiny",
                        ((1, 1, 2, 1), (16, 32, 64, 128)))


def test_clip_integration(tiny_variant):
    """CLIPModel dispatches timm_model_name vision_cfgs to the native
    ConvNeXt tower: init, joint forward, open_clip sd round-trip, and the
    shard_map train step."""
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    cfg = clip_cfg_from_dict(CLIP_D)
    assert cfg.is_convnext and not cfg.is_resnet
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert state == {"visual": {}}  # no BN state

    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)

    # open_clip-format export/import round-trip (visual.trunk.* naming)
    sd = pytrees_to_open_clip_state_dict(model, params, state)
    assert "visual.trunk.stem.0.weight" in sd and "visual.head.proj.weight" in sd
    params2, _ = open_clip_state_dict_to_pytrees(sd, model)
    f1, _, _ = model.encode_image(params, _x(), state=state, normalize=True)
    f2, _, _ = model.encode_image(params2, _x(), state=state, normalize=True)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-6)

    # trains through the real step (drop-path rng comes from batch["step"])
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.1)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
    n = jax.device_count()
    batch = shard_batch(mesh, {"images": np.tile(_x(), (n, 1, 1, 1)),
                               "texts": np.tile(ids, (n, 1))})
    assert step.needs_rng  # drop_path_rate 0.1 -> per-step rng plumbed
    batch["step"] = np.asarray(0, np.int32)
    params3, _, _, metrics = step(params, state, tx.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params3["visual"], params["visual"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_shipped_convnext_configs_parse():
    """All 11 shipped convnext_* configs parse into ConvNeXtCfg towers with
    the right variant table entries."""
    import json
    import os

    from xclip_tpu.models.clip import clip_cfg_from_dict

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "xclip_tpu", "models", "configs")
    names = sorted(f for f in os.listdir(cfg_dir) if f.startswith("convnext"))
    assert len(names) == 11
    for fname in names:
        with open(os.path.join(cfg_dir, fname)) as fh:
            d = json.load(fh)
        cfg = clip_cfg_from_dict(d)
        assert cfg.is_convnext
        assert cfg.vision.dims == CN.VARIANTS[cfg.vision.timm_name][1]
        assert cfg.vision.proj in ("linear", "mlp")
        assert cfg.vision.image_size == d["vision_cfg"]["image_size"]


def test_unknown_timm_tower_errors():
    from xclip_tpu.models.clip import clip_cfg_from_dict

    d = {"embed_dim": 8,
         "vision_cfg": {"timm_model_name": "eva02_base_patch16", "image_size": 224},
         "text_cfg": {"context_length": 8, "vocab_size": 16, "width": 8,
                      "heads": 2, "layers": 1}}
    with pytest.raises(NotImplementedError, match="not natively implemented"):
        clip_cfg_from_dict(d)
