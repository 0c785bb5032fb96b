"""Native timm-ViT vision towers (SigLIP ViTs / gap / relpos): shape
contract, open_clip TimmModel state-dict naming, bridge round-trips, and
CLIP integration incl. the CustomTextCLIP text layout (proj_bias + "text."
prefix).

No numerics oracle exists in this image (timm absent — the reference builds
these towers through timm, timm_model.py:57-89), so golden parity is
explicitly out of scope here; architecture/naming/round-trip are pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import timm_vit as TV

TINY = TV.TimmViTCfg(timm_name="vit_test", output_dim=32, image_size=32,
                     patch_size=8, width=32, layers=2, heads=4, pool="map",
                     proj="none")


def _x(n=2, size=32):
    return np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)


def test_siglip_forward_shapes_and_capture():
    params = TV.timm_vit_init(jax.random.PRNGKey(0), TINY)
    out, inters = TV.timm_vit_apply(params, _x(), TINY,
                                    capture=["embed", "blocks.1", "pool"])
    assert out.shape == (2, 32) and out.dtype == jnp.float32
    assert inters["embed"].shape == (2, 16, 32)    # 8x8/s8 patches, no cls
    assert inters["blocks.1"].shape == (2, 16, 32)
    np.testing.assert_allclose(np.asarray(inters["pool"]), np.asarray(out))
    assert TV.timm_vit_stage_names(TINY) == ["embed", "blocks.0", "blocks.1", "pool"]


def test_siglip_state_dict_naming_and_roundtrip():
    """Exported keys use the open_clip TimmModel layout: the 'map' attention
    pool lives inside the trunk (trunk.attn_pool.*, timm_model.py:57-71) and
    there is no open_clip head for timm_proj='none'."""
    params = TV.timm_vit_init(jax.random.PRNGKey(1), TINY)
    sd = TV.timm_vit_params_to_state_dict(params, TINY)
    for key, shape in (
        ("trunk.patch_embed.proj.weight", (32, 3, 8, 8)),
        ("trunk.pos_embed", (1, 16, 32)),
        ("trunk.blocks.1.attn.qkv.weight", (96, 32)),
        ("trunk.blocks.1.attn.proj.weight", (32, 32)),
        ("trunk.blocks.1.mlp.fc1.weight", (128, 32)),
        ("trunk.norm.weight", (32,)),
        ("trunk.attn_pool.latent", (1, 1, 32)),
        ("trunk.attn_pool.kv.weight", (64, 32)),
        ("trunk.attn_pool.mlp.fc1.weight", (128, 32)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    assert "trunk.cls_token" not in sd          # siglip ViTs: no class token
    assert not any(k.startswith("head.") for k in sd)  # timm_proj='none'
    assert "trunk.blocks.0.ls1.gamma" not in sd  # no LayerScale

    params2 = TV.timm_vit_state_dict_to_params(sd, TINY)
    x = _x()
    out1, _ = TV.timm_vit_apply(params, x, TINY)
    out2, _ = TV.timm_vit_apply(params2, x, TINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


GAP = TV.TimmViTCfg(timm_name="vit_test_gap", output_dim=24, image_size=32,
                    patch_size=8, width=32, layers=2, heads=4, pool="avg",
                    proj="linear", qkv_bias=False, init_values=1e-6)


def test_gap_variant_layerscale_and_head():
    """vit_medium_patch16_gap-style tower: avg pooling, LayerScale
    (ls1/ls2.gamma), bias-free qkv, open_clip head.proj linear."""
    params = TV.timm_vit_init(jax.random.PRNGKey(0), GAP)
    assert "bias" not in params["blocks"][0]["attn"]["qkv"]
    out, _ = TV.timm_vit_apply(params, _x(), GAP)
    assert out.shape == (2, 24)
    sd = TV.timm_vit_params_to_state_dict(params, GAP)
    assert sd["trunk.blocks.0.ls1.gamma"].shape == (32,)
    assert "trunk.blocks.0.attn.qkv.bias" not in sd
    assert sd["head.proj.weight"].shape == (24, 32)
    assert "head.proj.bias" not in sd  # open_clip proj_bias=False default
    assert "trunk.attn_pool.latent" not in sd
    params2 = TV.timm_vit_state_dict_to_params(sd, GAP)
    out2, _ = TV.timm_vit_apply(params2, _x(), GAP)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


RELPOS = TV.TimmViTCfg(timm_name="vit_test_relpos", output_dim=24,
                       image_size=32, patch_size=8, width=32, layers=2,
                       heads=4, pool="token", proj="linear", qkv_bias=False,
                       init_values=1e-6, class_token=True, rel_pos=True,
                       rel_pos_dim=16)


def test_relpos_variant():
    """vit_relpos_*_cls-style tower: no absolute pos-embed, per-block
    rel-pos MLP bias (timm RelPosMlp mode='cr'), cls token pooling."""
    params = TV.timm_vit_init(jax.random.PRNGKey(0), RELPOS)
    assert "pos_embed" not in params and "cls_token" in params
    out, _ = TV.timm_vit_apply(params, _x(), RELPOS)
    assert out.shape == (2, 24)

    # static tables: (i, i) pairs hit the zero-offset row -> log coords 0
    coords, index = TV._relpos_tables(RELPOS.grid)
    g = RELPOS.grid
    assert coords.shape == ((2 * g - 1) ** 2, 2) and index.shape == (g ** 4,)
    center = index.reshape(g * g, g * g)[3, 3]
    np.testing.assert_allclose(coords[center], [0.0, 0.0])
    # bias is zero-padded on the cls prefix row/col
    bias = TV._relpos_bias(params["blocks"][0]["attn"]["rel_pos"], RELPOS)
    assert bias.shape == (4, 17, 17)
    np.testing.assert_allclose(np.asarray(bias[:, 0, :]), 0.0)
    np.testing.assert_allclose(np.asarray(bias[:, :, 0]), 0.0)

    sd = TV.timm_vit_params_to_state_dict(params, RELPOS)
    assert sd["trunk.cls_token"].shape == (1, 1, 32)
    assert sd["trunk.blocks.0.attn.rel_pos.mlp.fc1.weight"].shape == (16, 2)
    assert sd["trunk.blocks.0.attn.rel_pos.mlp.fc2.weight"].shape == (4, 16)
    assert "trunk.blocks.0.attn.rel_pos.mlp.fc2.bias" not in sd
    assert "trunk.pos_embed" not in sd
    params2 = TV.timm_vit_state_dict_to_params(sd, RELPOS)
    out2, _ = TV.timm_vit_apply(params2, _x(), RELPOS)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


SIGLIP_D = {
    "embed_dim": 32,
    "init_logit_bias": -10,
    "custom_text": True,
    "vision_cfg": {"image_size": 32, "timm_model_name": "vit_test_siglip",
                   "timm_pool": "map", "timm_proj": "none"},
    "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                 "heads": 4, "layers": 2, "no_causal_mask": True,
                 "proj_bias": True, "pool_type": "last",
                 "norm_kwargs": {"eps": 1e-6}},
}


@pytest.fixture()
def tiny_variant(monkeypatch):
    monkeypatch.setitem(TV.VARIANTS, "vit_test_siglip",
                        dict(patch_size=8, width=32, layers=2, heads=4))


def test_clip_integration_siglip(tiny_variant):
    """CLIPModel dispatches SigLIP vision_cfgs to the native timm-ViT tower;
    the text side honors proj_bias/norm_eps and exports the reference
    CustomTextCLIP layout ("text."-prefixed keys, text_projection Linear)."""
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    cfg = clip_cfg_from_dict(SIGLIP_D)
    assert cfg.is_timm_vit and not cfg.is_convnext and cfg.custom_text
    assert cfg.text.proj_bias and cfg.text.norm_eps == 1e-6
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert float(params["logit_bias"]) == -10.0
    assert "bias" in params["text"]["text_projection"]

    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 32)

    sd = pytrees_to_open_clip_state_dict(model, params, state)
    assert "visual.trunk.attn_pool.latent" in sd
    assert "text.text_projection.weight" in sd and "text.text_projection.bias" in sd
    assert "text.transformer.resblocks.0.attn.in_proj_weight" in sd
    assert "text.token_embedding.weight" in sd and "logit_bias" in sd
    assert "text_projection" not in sd  # no inline-CLIP text keys
    params2, _ = open_clip_state_dict_to_pytrees(sd, model)
    f1, _ = model.encode_text(params, ids, normalize=True)
    f2, _ = model.encode_text(params2, ids, normalize=True)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-6)
    g1, _, _ = model.encode_image(params, _x(), state=state, normalize=True)
    g2, _, _ = model.encode_image(params2, _x(), state=state, normalize=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)

    # trains through the real step with the SigLIP loss
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.1)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32", siglip=True))
    n = jax.device_count()
    batch = shard_batch(mesh, {"images": np.tile(_x(), (n, 1, 1, 1)),
                               "texts": np.tile(ids, (n, 1))})
    params3, _, _, metrics = step(params, state, tx.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params3["visual"], params["visual"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_shipped_timm_vit_configs_parse():
    """The 9 SigLIP + 2 plain timm-ViT + 2 nllb-siglip configs parse into
    TimmViTCfg towers with the reference pool/proj routing."""
    from xclip_tpu.models.factory import get_model_config
    from xclip_tpu.models.clip import clip_cfg_from_dict

    siglip = ["ViT-B-16-SigLIP", "ViT-B-16-SigLIP-256", "ViT-B-16-SigLIP-384",
              "ViT-B-16-SigLIP-512", "ViT-B-16-SigLIP-i18n-256",
              "ViT-L-16-SigLIP-256", "ViT-L-16-SigLIP-384",
              "ViT-SO400M-14-SigLIP", "ViT-SO400M-14-SigLIP-384"]
    for name in siglip:
        d = get_model_config(name)
        cfg = clip_cfg_from_dict(d)
        assert cfg.is_timm_vit and cfg.custom_text, name
        assert cfg.vision.pool == "map" and cfg.vision.proj == "none", name
        assert cfg.vision.width == cfg.embed_dim, name  # map+none: trunk out
        assert cfg.text.proj_bias and cfg.text.pool_type == "last", name
        assert cfg.init_logit_bias == -10, name
        assert cfg.vision.image_size == d["vision_cfg"]["image_size"], name

    for name, pool in (("vit_medium_patch16_gap_256", "avg"),
                       ("vit_relpos_medium_patch16_cls_224", "token")):
        cfg = clip_cfg_from_dict(get_model_config(name))
        assert cfg.is_timm_vit and cfg.vision.pool == pool, name
        assert cfg.vision.proj == "linear" and cfg.vision.width == 512, name
        assert cfg.vision.init_values == 1e-6, name

    for name in ("nllb-clip-base-siglip", "nllb-clip-large-siglip"):
        cfg = clip_cfg_from_dict(get_model_config(name))
        assert cfg.is_timm_vit and cfg.is_hf_text, name
        assert cfg.vision.pool == "map", name

    # SO400M: timm mlp_hidden = int(1152 * 3.7362) = 4304
    so = clip_cfg_from_dict(get_model_config("ViT-SO400M-14-SigLIP"))
    assert so.vision.mlp_hidden == 4304


def test_siglip_i18n_shares_tower_with_256():
    """ViT-B-16-SigLIP-i18n-256 reuses the vit_base_patch16_siglip_256
    trunk; only the text vocab differs (250k multilingual)."""
    from xclip_tpu.models.factory import get_model_config

    base = get_model_config("ViT-B-16-SigLIP-256")
    i18n = get_model_config("ViT-B-16-SigLIP-i18n-256")
    assert i18n["vision_cfg"]["timm_model_name"] == base["vision_cfg"]["timm_model_name"]
    assert i18n["text_cfg"]["vocab_size"] == 250000
