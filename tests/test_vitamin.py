"""Native ViTamin towers: shape contract, timm/open_clip state-dict naming
(trunk.patch_embed.backbone.* hybrid layout), bridge round-trips, pos-embed
resampling, and CLIP integration.

No numerics oracle exists in this image (timm absent), so golden parity is
explicitly out of scope; architecture/naming/round-trip are pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import vitamin as V

TINY = V.ViTaminCfg(timm_name="vitamin_test", output_dim=24, image_size=32,
                    native_size=32, mb_dims=(8, 16), vit_dim=32, vit_depth=2,
                    heads=4)


def _x(n=2, size=32):
    return np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)


def test_forward_shapes_and_capture():
    params = V.vitamin_init(jax.random.PRNGKey(0), TINY)
    out, inters = V.vitamin_apply(
        params, _x(), TINY,
        capture=["stem", "stages.1.0", "embed", "blocks.1", "pool"])
    assert out.shape == (2, 24) and out.dtype == jnp.float32
    assert inters["stem"].shape == (2, 16, 16, 8)        # 1/2 res
    assert inters["stages.1.0"].shape == (2, 4, 4, 16)   # 1/8 res
    assert inters["embed"].shape == (2, 4, 32)           # 1/16: 2x2 tokens
    assert inters["blocks.1"].shape == (2, 4, 32)
    np.testing.assert_allclose(np.asarray(inters["pool"]), np.asarray(out))
    assert V.vitamin_stage_names(TINY) == [
        "stem", "stages.0.0", "stages.0.1", "stages.1.0", "stages.1.1",
        "stages.1.2", "stages.1.3", "embed", "blocks.0", "blocks.1", "pool"]


def test_avgpool_count_include_pad_false():
    # 1x1 input: the 3x3/s2/p1 window sees one real pixel -> mean == pixel
    x = jnp.full((1, 1, 1, 1), 5.0)
    np.testing.assert_allclose(np.asarray(V._avgpool_3x3s2(x)), 5.0)
    # interior pixels average exactly 9 neighbours
    y = V._avgpool_3x3s2(jnp.ones((1, 5, 5, 1)))
    np.testing.assert_allclose(np.asarray(y), 1.0)


def test_state_dict_naming_and_roundtrip():
    params = V.vitamin_init(jax.random.PRNGKey(1), TINY)
    sd = V.vitamin_params_to_state_dict(params, TINY)
    bb = "trunk.patch_embed.backbone"
    for key, shape in (
        (f"{bb}.stem.conv1.weight", (8, 3, 3, 3)),
        (f"{bb}.stem.norm1.weight", (8,)),
        (f"{bb}.stem.conv2.weight", (8, 8, 3, 3)),
        (f"{bb}.stages.0.0.pre_norm.weight", (8,)),
        (f"{bb}.stages.0.0.conv1_1x1.weight", (32, 8, 1, 1)),   # expand 4x
        (f"{bb}.stages.0.0.conv2_kxk.weight", (32, 1, 3, 3)),   # depthwise
        (f"{bb}.stages.0.0.conv3_1x1.weight", (8, 32, 1, 1)),
        (f"{bb}.stages.0.0.shortcut.expand.weight", (8, 8, 1, 1)),  # stride 2
        (f"{bb}.stages.1.0.shortcut.expand.weight", (16, 8, 1, 1)),
        (f"{bb}.pool.norm.weight", (16,)),
        (f"{bb}.pool.proj.weight", (32, 16, 3, 3)),
        ("trunk.pos_embed", (1, 4, 32)),
        ("trunk.blocks.0.attn.qkv.weight", (96, 32)),
        ("trunk.blocks.0.mlp.norm.weight", (32,)),
        ("trunk.blocks.0.mlp.w0.weight", (64, 32)),  # GeGLU ratio 2
        ("trunk.blocks.0.mlp.w2.weight", (32, 64)),
        ("trunk.fc_norm.weight", (32,)),
        ("head.proj.weight", (24, 32)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    # stride-1 same-width blocks carry no shortcut params; avg-pool head
    # layout means no trunk.norm
    assert f"{bb}.stages.0.1.shortcut.weight" not in sd
    assert "trunk.norm.weight" not in sd
    assert "trunk.cls_token" not in sd
    assert "head.proj.bias" not in sd

    params2 = V.vitamin_state_dict_to_params(sd, TINY)
    x = _x()
    out1, _ = V.vitamin_apply(params, x, TINY)
    out2, _ = V.vitamin_apply(params2, x, TINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_pos_embed_resample():
    """Native-grid pos-embed is resampled to the runtime grid (the reference
    ViTamin-XL-384 config feeds 256px into the 384-native trunk)."""
    cfg = V.ViTaminCfg(timm_name="vitamin_test", output_dim=24, image_size=64,
                       native_size=32, mb_dims=(8, 16), vit_dim=32,
                       vit_depth=2, heads=4)
    assert cfg.native_grid == 2 and cfg.grid == 4
    params = V.vitamin_init(jax.random.PRNGKey(0), cfg)
    assert params["pos_embed"].shape == (4, 32)  # stored at native grid
    out, inters = V.vitamin_apply(params, _x(size=64), cfg, capture=["embed"])
    assert inters["embed"].shape == (2, 16, 32)
    assert out.shape == (2, 24)
    # identity when grids match
    same = V._resample_pos_embed(params["pos_embed"], 2, 2)
    np.testing.assert_allclose(np.asarray(same), np.asarray(params["pos_embed"]))


def test_shipped_vitamin_configs_parse():
    from xclip_tpu.models.clip import clip_cfg_from_dict
    from xclip_tpu.models.factory import get_model_config

    expect = {
        "ViTamin-S": (384, 14, 6, (64, 128), 224, 224),
        "ViTamin-S-LTT": (384, 14, 6, (64, 128), 224, 224),
        "ViTamin-B": (768, 14, 12, (128, 256), 224, 224),
        "ViTamin-B-LTT": (768, 14, 12, (128, 256), 224, 224),
        "ViTamin-L": (1024, 31, 16, (160, 320), 224, 224),
        "ViTamin-L-256": (1024, 31, 16, (160, 320), 256, 256),
        "ViTamin-L-336": (1024, 31, 16, (160, 320), 336, 336),
        "ViTamin-L2": (1024, 31, 16, (160, 320), 224, 224),
        "ViTamin-L2-256": (1024, 31, 16, (160, 320), 256, 256),
        "ViTamin-L2-336": (1024, 31, 16, (160, 320), 336, 336),
        "ViTamin-XL-256": (1152, 32, 16, (192, 384), 256, 256),
        "ViTamin-XL-336": (1152, 32, 16, (192, 384), 336, 336),
        # the reference config literally says image_size 256 for XL-384;
        # the 384-native pos grid is resampled at runtime
        "ViTamin-XL-384": (1152, 32, 16, (192, 384), 256, 384),
    }
    for name, (dim, depth, heads, mb, img, native) in expect.items():
        cfg = clip_cfg_from_dict(get_model_config(name))
        assert cfg.is_native_timm, name
        v = cfg.vision
        assert isinstance(v, V.ViTaminCfg), name
        assert v.vit_dim == dim and v.vit_depth == depth and v.heads == heads, name
        assert v.mb_dims == mb and v.image_size == img and v.native_size == native, name
        assert v.proj == "linear" and v.drop_path_rate == 0.1, name
        assert v.mlp_hidden == 2 * dim, name


@pytest.fixture()
def tiny_variant(monkeypatch):
    monkeypatch.setitem(V.VARIANTS, "vitamin_test_tiny",
                        dict(mb_dims=(8, 16), vit_dim=32, vit_depth=2,
                             heads=4, native_size=32))


def test_clip_integration(tiny_variant):
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    d = {
        "embed_dim": 24,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "timm_model_name": "vitamin_test_tiny",
                       "timm_pool": "", "timm_proj": "linear",
                       "timm_drop_path": 0.1},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                     "heads": 4, "layers": 2},
    }
    cfg = clip_cfg_from_dict(d)
    assert cfg.is_native_timm and cfg.vision.drop_path_rate == 0.1
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)

    # stochastic depth actually fires in train mode
    r1 = model.encode_image(params, _x(), state=state, train=True,
                            rng=jax.random.PRNGKey(1))[0]
    r2 = model.encode_image(params, _x(), state=state, train=True,
                            rng=jax.random.PRNGKey(2))[0]
    assert float(jnp.abs(r1 - r2).max()) > 0

    sd = pytrees_to_open_clip_state_dict(model, params, state)
    assert "visual.trunk.patch_embed.backbone.stem.conv1.weight" in sd
    assert "visual.head.proj.weight" in sd
    params2, _ = open_clip_state_dict_to_pytrees(sd, model)
    g1, _, _ = model.encode_image(params, _x(), state=state, normalize=True)
    g2, _, _ = model.encode_image(params2, _x(), state=state, normalize=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)
