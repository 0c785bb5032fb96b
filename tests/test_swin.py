"""Native Swin towers: shape contract, open_clip TimmModel state-dict
naming, bridge round-trips, window/shift machinery, and CLIP integration.

No numerics oracle exists in this image (timm absent), so golden parity is
explicitly out of scope; architecture/naming/round-trip are pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import swin as S

TINY = S.SwinCfg(timm_name="swin_test", output_dim=24, image_size=32,
                 patch_size=2, window=4, embed_dim=16, depths=(2, 2),
                 heads=(2, 4))


def _x(n=2, size=32):
    return np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)


def test_forward_shapes_and_capture():
    params = S.swin_init(jax.random.PRNGKey(0), TINY)
    out, inters = S.swin_apply(params, _x(), TINY,
                               capture=["embed", "layers.1.1", "pool"])
    assert out.shape == (2, 24) and out.dtype == jnp.float32
    assert inters["embed"].shape == (2, 16, 16, 16)       # 32/2 grid
    assert inters["layers.1.1"].shape == (2, 8, 8, 32)    # merged, 2x dim
    np.testing.assert_allclose(np.asarray(inters["pool"]), np.asarray(out))
    assert S.swin_stage_names(TINY) == [
        "embed", "layers.0.0", "layers.0.1", "layers.1.0", "layers.1.1", "pool"]


def test_window_partition_roundtrip_and_merge_order():
    x = np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32)
    wins = S._window_partition(jnp.asarray(x), 4)
    assert wins.shape == (2, 4, 16, 4)
    back = S._window_reverse(wins, 4, 8)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)

    # PatchMerging concat order: [(dh,dw)] = [(0,0),(1,0),(0,1),(1,1)]
    grid = np.zeros((1, 4, 4, 1), np.float32)
    grid[0, 0::2, 0::2, 0] = 0.0
    grid[0, 1::2, 0::2, 0] = 1.0
    grid[0, 0::2, 1::2, 0] = 2.0
    grid[0, 1::2, 1::2, 0] = 3.0
    merged = np.asarray(jnp.asarray(grid).reshape(1, 2, 2, 2, 2, 1)
                        .transpose(0, 1, 3, 4, 2, 5).reshape(1, 2, 2, 4))
    np.testing.assert_allclose(merged[0, 0, 0], [0.0, 1.0, 2.0, 3.0])


def test_relative_position_tables_and_shift_mask():
    idx = S._relative_position_index(4)
    assert idx.shape == (16, 16)
    # zero offset maps to the table center row for every query
    center = (2 * 4 - 1) * 3 + 3  # rel (0,0) + (w-1) offsets
    assert (np.diag(idx) == center).all()
    assert idx.max() < (2 * 4 - 1) ** 2

    mask = S._shift_attn_mask(8, 4, 2)
    assert mask.shape == (4, 16, 16)
    np.testing.assert_allclose(mask[0], 0.0)  # interior window: one region
    assert (mask[-1] == -100.0).any()         # corner window: 4 regions
    assert (np.diag(mask[-1]) == 0.0).all()   # same-token always visible


def test_state_dict_naming_and_roundtrip():
    params = S.swin_init(jax.random.PRNGKey(1), TINY)
    sd = S.swin_params_to_state_dict(params, TINY)
    for key, shape in (
        ("trunk.patch_embed.proj.weight", (16, 3, 2, 2)),
        ("trunk.patch_embed.norm.weight", (16,)),
        ("trunk.layers.0.blocks.0.attn.qkv.weight", (48, 16)),
        ("trunk.layers.0.blocks.0.attn.relative_position_bias_table", (49, 2)),
        ("trunk.layers.0.blocks.0.attn.relative_position_index", (16, 16)),
        ("trunk.layers.0.blocks.0.mlp.fc1.weight", (64, 16)),
        ("trunk.layers.1.downsample.norm.weight", (64,)),
        ("trunk.layers.1.downsample.reduction.weight", (32, 64)),
        ("trunk.layers.1.blocks.0.attn.qkv.weight", (96, 32)),
        ("trunk.norm.weight", (32,)),
        ("head.proj.weight", (24, 32)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    assert "trunk.layers.0.downsample.norm.weight" not in sd  # stage 0: none
    assert "trunk.layers.1.downsample.reduction.bias" not in sd
    assert "head.proj.bias" not in sd  # open_clip proj_bias=False

    params2 = S.swin_state_dict_to_params(sd, TINY)
    x = _x()
    out1, _ = S.swin_apply(params, x, TINY)
    out2, _ = S.swin_apply(params2, x, TINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_shipped_swin_configs_parse():
    from xclip_tpu.models.clip import clip_cfg_from_dict
    from xclip_tpu.models.factory import get_model_config

    for name, (dim, depths, feats, embed) in {
        "swin_tiny_patch4_window7_224": (96, (2, 2, 6, 2), 768, 512),
        "swin_base_patch4_window7_224": (128, (2, 2, 18, 2), 1024, 640),
    }.items():
        cfg = clip_cfg_from_dict(get_model_config(name))
        assert cfg.is_native_timm and not cfg.is_convnext, name
        v = cfg.vision
        assert isinstance(v, S.SwinCfg), name
        assert v.embed_dim == dim and v.depths == depths, name
        assert v.width == feats and v.output_dim == embed, name
        assert v.proj == "linear", name
        # 224/4 = 56 -> per-stage grids all divide the 7x7 window
        assert all((56 // 2 ** s) % 7 == 0 for s in range(4))


@pytest.fixture()
def tiny_variant(monkeypatch):
    monkeypatch.setitem(S.VARIANTS, "swin_test_tiny",
                        dict(embed_dim=16, depths=(2, 2), heads=(2, 4)))


def test_clip_integration(tiny_variant):
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    d = {
        "embed_dim": 24,
        "vision_cfg": {"image_size": 32, "timm_model_name": "swin_test_tiny",
                       "timm_pool": "", "timm_proj": "linear"},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 24,
                     "heads": 4, "layers": 2},
    }
    # patch the tiny variant's window/patch into the parsed cfg
    cfg = clip_cfg_from_dict(d)
    object.__setattr__(cfg, "vision", TINY)
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)

    sd = pytrees_to_open_clip_state_dict(model, params, state)
    assert "visual.trunk.layers.1.downsample.reduction.weight" in sd
    assert "visual.head.proj.weight" in sd
    params2, _ = open_clip_state_dict_to_pytrees(sd, model)
    g1, _, _ = model.encode_image(params, _x(), state=state, normalize=True)
    g2, _, _ = model.encode_image(params2, _x(), state=state, normalize=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)
