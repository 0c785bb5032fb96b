"""Native EVA01/EVA02 vision towers: shape contract, open_clip TimmModel
state-dict naming (visual.trunk.*, trunk classifier head == CLIP projection),
bridge round-trips, RoPE structure, and CLIP integration.

No numerics oracle exists in this image (timm absent — the reference builds
these towers through timm, timm_model.py:57-89), so golden parity is
explicitly out of scope here; architecture/naming/round-trip are pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import eva as E

EVA01 = E.EvaCfg(timm_name="eva01_test", output_dim=24, image_size=32,
                 patch_size=8, width=32, layers=2, heads=4, mlp_ratio=6144 / 1408,
                 qkv_fused=True, swiglu=False, rope=False)

EVA02 = E.EvaCfg(timm_name="eva02_test", output_dim=24, image_size=32,
                 patch_size=8, width=32, layers=2, heads=4, mlp_ratio=4 * 2 / 3,
                 qkv_fused=False, swiglu=True, rope=True, ref_grid=4)

EVA02E = E.EvaCfg(timm_name="eva02e_test", output_dim=24, image_size=32,
                  patch_size=8, width=32, layers=2, heads=4, mlp_ratio=4.0,
                  qkv_fused=True, swiglu=False, rope=False, post_norm=True)


def _x(n=2, size=32):
    return np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)


def test_eva01_forward_shapes_and_capture():
    params = E.eva_init(jax.random.PRNGKey(0), EVA01)
    out, inters = E.eva_apply(params, _x(), EVA01,
                              capture=["embed", "blocks.1", "pool"])
    assert out.shape == (2, 24) and out.dtype == jnp.float32
    assert inters["embed"].shape == (2, 17, 32)  # 4x4/s8 patches + cls
    assert inters["blocks.1"].shape == (2, 17, 32)
    np.testing.assert_allclose(np.asarray(inters["pool"]), np.asarray(out))
    assert E.eva_stage_names(EVA01) == ["embed", "blocks.0", "blocks.1", "pool"]
    # BEiT fused qkv: bias-free matmul + explicit q/v bias vectors
    a = params["blocks"][0]["attn"]
    assert "bias" not in a["qkv"] and a["q_bias"].shape == (32,)


def test_eva01_state_dict_naming_and_roundtrip():
    """timm Eva naming under the open_clip TimmModel prefix: fused qkv with
    q_bias/v_bias (zero k bias is implicit), trunk.head Linear IS the CLIP
    projection (timm_proj=null + timm_pool='token', num_classes=embed_dim)."""
    params = E.eva_init(jax.random.PRNGKey(1), EVA01)
    sd = E.eva_params_to_state_dict(params, EVA01)
    hidden = EVA01.mlp_hidden
    for key, shape in (
        ("trunk.patch_embed.proj.weight", (32, 3, 8, 8)),
        ("trunk.cls_token", (1, 1, 32)),
        ("trunk.pos_embed", (1, 17, 32)),
        ("trunk.blocks.1.attn.qkv.weight", (96, 32)),
        ("trunk.blocks.1.attn.q_bias", (32,)),
        ("trunk.blocks.1.attn.v_bias", (32,)),
        ("trunk.blocks.1.attn.proj.weight", (32, 32)),
        ("trunk.blocks.1.mlp.fc1.weight", (hidden, 32)),
        ("trunk.blocks.1.mlp.fc2.weight", (32, hidden)),
        ("trunk.norm.weight", (32,)),
        ("trunk.head.weight", (24, 32)),
        ("trunk.head.bias", (24,)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    assert "trunk.blocks.0.attn.qkv.bias" not in sd
    assert "trunk.blocks.0.attn.k_bias" not in sd
    assert not any(k.startswith("head.") for k in sd)  # no open_clip head

    params2 = E.eva_state_dict_to_params(sd, EVA01)
    x = _x()
    out1, _ = E.eva_apply(params, x, EVA01)
    out2, _ = E.eva_apply(params2, x, EVA01)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_eva02_swiglu_rope_and_roundtrip():
    """EVA02 blocks: separate q/k/v (k bias-free), SwiGLU MLP with inner LN
    (fc1_g/fc1_x/norm/fc2), 2D axial RoPE on the patch tokens."""
    params = E.eva_init(jax.random.PRNGKey(0), EVA02)
    a = params["blocks"][0]["attn"]
    assert "bias" in a["q_proj"] and "bias" not in a["k_proj"] and "bias" in a["v_proj"]
    out, _ = E.eva_apply(params, _x(), EVA02)
    assert out.shape == (2, 24)

    sd = E.eva_params_to_state_dict(params, EVA02)
    hidden = EVA02.mlp_hidden
    assert sd["trunk.blocks.0.attn.q_proj.weight"].shape == (32, 32)
    assert "trunk.blocks.0.attn.k_proj.bias" not in sd
    assert sd["trunk.blocks.0.mlp.fc1_g.weight"].shape == (hidden, 32)
    assert sd["trunk.blocks.0.mlp.fc1_x.weight"].shape == (hidden, 32)
    assert sd["trunk.blocks.0.mlp.norm.weight"].shape == (hidden,)
    assert sd["trunk.blocks.0.mlp.fc2.weight"].shape == (32, hidden)
    assert "trunk.blocks.0.mlp.fc1.weight" not in sd
    params2 = E.eva_state_dict_to_params(sd, EVA02)
    out2, _ = E.eva_apply(params2, _x(), EVA02)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


def test_rope_structure():
    """RoPE tables: head_dim/4 bands per axis duplicated over channel pairs;
    rotation preserves per-pair norms and passes the cls token through."""
    grid, hd = 4, 8
    sin, cos = E._rope_tables(grid, grid, hd)
    assert sin.shape == cos.shape == (16, hd)
    np.testing.assert_allclose(sin**2 + cos**2, 1.0, atol=1e-6)
    # position scaling: grid==ref_grid -> angle of band 0 equals raw coord
    np.testing.assert_allclose(cos[0], 1.0, atol=1e-6)  # (0,0) -> no rotation

    x = np.random.RandomState(0).randn(2, 17, 32).astype(np.float32)
    y = np.asarray(E._apply_rope(jnp.asarray(x), jnp.asarray(sin), jnp.asarray(cos), 4))
    np.testing.assert_allclose(y[:, 0], x[:, 0], atol=0)  # cls untouched
    # rotation preserves the norm of each adjacent channel pair
    xp = x[:, 1:].reshape(2, 16, 4, hd // 2, 2)
    yp = y[:, 1:].reshape(2, 16, 4, hd // 2, 2)
    np.testing.assert_allclose(np.linalg.norm(yp, axis=-1),
                               np.linalg.norm(xp, axis=-1), atol=1e-4)


def test_eva02e_post_norm():
    """EVA02-E blocks norm the sublayer output before the residual add."""
    params = E.eva_init(jax.random.PRNGKey(0), EVA02E)
    out, _ = E.eva_apply(params, _x(), EVA02E)
    assert out.shape == (2, 24)
    sd = E.eva_params_to_state_dict(params, EVA02E)
    params2 = E.eva_state_dict_to_params(sd, EVA02E)
    out2, _ = E.eva_apply(params2, _x(), EVA02E)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)
    # post-norm means the sublayer output (not the input) is normed: zeroing
    # the norm scales must therefore make every block the identity
    for bp in params["blocks"]:
        bp["norm1"]["scale"] = jnp.zeros_like(bp["norm1"]["scale"])
        bp["norm2"]["scale"] = jnp.zeros_like(bp["norm2"]["scale"])
    _, inters = E.eva_apply(params, _x(), EVA02E, capture=["embed", "blocks.1"])
    np.testing.assert_allclose(np.asarray(inters["blocks.1"]),
                               np.asarray(inters["embed"]), atol=1e-5)


def test_shipped_eva_configs_parse():
    """The 7 EVA configs parse into EvaCfg towers with the reference
    custom_text routing and the trunk-head projection (width -> embed_dim)."""
    from xclip_tpu.models.clip import clip_cfg_from_dict
    from xclip_tpu.models.factory import get_model_config

    expect = {
        "EVA01-g-14": ("eva_giant_patch14_224", 1024, 1408, 40),
        "EVA01-g-14-plus": ("eva_giant_patch14_224", 1024, 1408, 40),
        "EVA02-B-16": ("eva02_base_patch16_clip_224", 512, 768, 12),
        "EVA02-L-14": ("eva02_large_patch14_clip_224", 768, 1024, 24),
        "EVA02-L-14-336": ("eva02_large_patch14_clip_336", 768, 1024, 24),
        "EVA02-E-14": ("eva02_enormous_patch14_clip_224", 1024, 1792, 64),
        "EVA02-E-14-plus": ("eva02_enormous_patch14_clip_224", 1024, 1792, 64),
    }
    for name, (timm_name, embed_dim, width, layers) in expect.items():
        cfg = clip_cfg_from_dict(get_model_config(name))
        assert cfg.is_eva and cfg.custom_text, name
        v = cfg.vision
        assert v.timm_name == timm_name and v.output_dim == embed_dim, name
        assert v.width == width and v.layers == layers, name
    # EVA02-L-14-336 runs the 224-trained RoPE grid scaling (ref_feat_shape)
    c336 = clip_cfg_from_dict(get_model_config("EVA02-L-14-336")).vision
    assert c336.image_size == 336 and c336.grid == 24 and c336.ref_grid == 16
    # EVA02-E: plain MLP ratio 15360/1792, post-norm blocks
    ce = clip_cfg_from_dict(get_model_config("EVA02-E-14")).vision
    assert ce.mlp_hidden == 15360 and ce.post_norm and not ce.swiglu


@pytest.fixture()
def tiny_variant(monkeypatch):
    monkeypatch.setitem(E.VARIANTS, "eva02_test_tiny",
                        dict(patch_size=8, width=32, layers=2, heads=4,
                             mlp_ratio=4 * 2 / 3, qkv_fused=False, swiglu=True,
                             rope=True, ref_grid=4))


def test_clip_integration(tiny_variant):
    """CLIPModel dispatches EVA vision_cfgs to the native tower; checkpoints
    export/import through the open_clip visual.trunk.* layout."""
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    d = {
        "embed_dim": 24,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "timm_model_name": "eva02_test_tiny",
                       "timm_pool": "token", "timm_proj": None},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                     "heads": 4, "layers": 2},
    }
    cfg = clip_cfg_from_dict(d)
    assert cfg.is_eva and not cfg.is_timm_vit and cfg.custom_text
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)

    sd = pytrees_to_open_clip_state_dict(model, params, state)
    assert "visual.trunk.head.weight" in sd
    assert "visual.trunk.blocks.0.mlp.fc1_g.weight" in sd
    assert "text.token_embedding.weight" in sd  # CustomTextCLIP layout
    params2, _ = open_clip_state_dict_to_pytrees(sd, model)
    g1, _, _ = model.encode_image(params, _x(), state=state, normalize=True)
    g2, _, _ = model.encode_image(params2, _x(), state=state, normalize=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)
