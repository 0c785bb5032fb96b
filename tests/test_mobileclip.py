"""Native MobileCLIP towers (vit_base_mci_224 hybrid ViT + FastViT MCi):
shape contract, open_clip TimmModel state-dict naming with BatchNorm
running stats, stateful bridge round-trips, and CLIP integration.

No numerics oracle exists in this image (timm absent), so golden parity is
explicitly out of scope; architecture/naming/round-trip are pinned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models import mci_vit as M

TINY = M.MciViTCfg(timm_name="mci_test", output_dim=24, image_size=32,
                   width=32, layers=2, heads=4, stem_chs=(8, 16),
                   stem_ks=(4, 2, 2), stem_strides=(4, 2, 2))


def _x(n=2, size=32):
    return np.random.RandomState(0).randn(n, size, size, 3).astype(np.float32)


def test_forward_shapes_and_state():
    params, state = M.mci_vit_init(jax.random.PRNGKey(0), TINY)
    out, new_state, inters = M.mci_vit_apply(params, state, _x(), TINY,
                                             capture=["embed", "pool"])
    assert out.shape == (2, 24)
    assert inters["embed"].shape == (2, 5, 32)  # 2x2 grid + cls
    np.testing.assert_allclose(np.asarray(inters["pool"]), np.asarray(out))
    # eval mode: running stats untouched
    np.testing.assert_allclose(
        np.asarray(new_state["backbone"]["0"]["bn"]["mean"]),
        np.asarray(state["backbone"]["0"]["bn"]["mean"]))
    # train mode: running stats move
    _, tstate, _ = M.mci_vit_apply(params, state, _x(), TINY, train=True)
    moved = np.abs(np.asarray(tstate["backbone"]["0"]["bn"]["mean"]) -
                   np.asarray(state["backbone"]["0"]["bn"]["mean"])).max()
    assert moved > 0


def test_state_dict_naming_and_roundtrip():
    """Hybrid-stem naming: patch_embed.backbone.{0,1} are conv+BN (running
    stats exported), .2 is a bias conv; pos_embed excludes the cls position
    (no_embed_class); trunk.head Linear is the CLIP projection."""
    params, state = M.mci_vit_init(jax.random.PRNGKey(1), TINY)
    sd = M.mci_vit_pytrees_to_state_dict(params, state, TINY)
    bb = "trunk.patch_embed.backbone"
    for key, shape in (
        (f"{bb}.0.conv.weight", (8, 3, 4, 4)),
        (f"{bb}.0.bn.weight", (8,)),
        (f"{bb}.0.bn.running_mean", (8,)),
        (f"{bb}.1.conv.weight", (16, 8, 2, 2)),
        (f"{bb}.1.bn.running_var", (16,)),
        (f"{bb}.2.conv.weight", (32, 16, 2, 2)),
        (f"{bb}.2.conv.bias", (32,)),
        ("trunk.cls_token", (1, 1, 32)),
        ("trunk.pos_embed", (1, 4, 32)),  # patch tokens only, no cls slot
        ("trunk.blocks.1.attn.qkv.weight", (96, 32)),
        ("trunk.norm.weight", (32,)),
        ("trunk.head.weight", (24, 32)),
        ("trunk.head.bias", (24,)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    assert f"{bb}.0.conv.bias" not in sd  # BN convs are bias-free
    assert f"{bb}.2.bn.weight" not in sd
    assert not any(k.startswith("head.") for k in sd)

    params2, state2 = M.mci_vit_state_dict_to_pytrees(sd, TINY)
    x = _x()
    out1, _, _ = M.mci_vit_apply(params, state, x, TINY)
    out2, _, _ = M.mci_vit_apply(params2, state2, x, TINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_shipped_mobileclip_b_config_parses():
    from xclip_tpu.models.clip import clip_cfg_from_dict
    from xclip_tpu.models.factory import get_model_config

    cfg = clip_cfg_from_dict(get_model_config("MobileCLIP-B"))
    assert cfg.is_native_timm and cfg.custom_text
    v = cfg.vision
    assert isinstance(v, M.MciViTCfg)
    assert v.width == 768 and v.layers == 12 and v.heads == 12
    assert v.stem_chs == (192, 384) and v.grid == 14
    assert v.output_dim == 512
    assert not cfg.text.no_causal_mask  # B keeps the causal text tower


@pytest.fixture()
def tiny_variant(monkeypatch):
    monkeypatch.setitem(M.VARIANTS, "mci_test_tiny",
                        dict(width=32, layers=2, heads=4, stem_chs=(8, 16),
                             stem_ks=(4, 2, 2), stem_strides=(4, 2, 2)))


def test_clip_integration_stateful(tiny_variant):
    """The registry's stateful protocol: BN state flows through CLIPModel
    encode_image and both checkpoint bridge directions."""
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    d = {
        "embed_dim": 24,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "timm_model_name": "mci_test_tiny",
                       "timm_pool": "token", "timm_proj": None},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                     "heads": 4, "layers": 2},
    }
    cfg = clip_cfg_from_dict(d)
    assert cfg.is_native_timm
    from xclip_tpu.models import native_timm
    assert native_timm.has_state(cfg.vision)
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert "bn" in state["visual"]["backbone"]["0"]

    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)

    # train=True updates the visual state through the model interface
    feats, new_state, _ = model.encode_image(params, _x(), state=state, train=True)
    delta = np.abs(np.asarray(new_state["visual"]["backbone"]["0"]["bn"]["mean"]) -
                   np.asarray(state["visual"]["backbone"]["0"]["bn"]["mean"])).max()
    assert delta > 0

    # perturb the running stats so the round-trip must carry real state
    state = {"visual": new_state["visual"]}
    sd = pytrees_to_open_clip_state_dict(model, params, state)
    assert "visual.trunk.patch_embed.backbone.0.bn.running_mean" in sd
    params2, state2 = open_clip_state_dict_to_pytrees(sd, model)
    np.testing.assert_allclose(
        np.asarray(state2["visual"]["backbone"]["0"]["bn"]["mean"]),
        np.asarray(state["visual"]["backbone"]["0"]["bn"]["mean"]), atol=1e-7)
    g1, _, _ = model.encode_image(params, _x(), state=state, normalize=True)
    g2, _, _ = model.encode_image(params2, _x(), state=state2, normalize=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)


# ---------------------------------------------------------------------------
# FastViT MCi (MobileCLIP-S1/S2)

from xclip_tpu.models import fastvit as F

FTINY = F.FastViTCfg(timm_name="fastvit_test", output_dim=24, image_size=32,
                     depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))


def test_fastvit_forward_shapes_and_state():
    params, state = F.fastvit_init(jax.random.PRNGKey(0), FTINY)
    out, new_state, inters = F.fastvit_apply(
        params, state, _x(), FTINY,
        capture=["stem", "stages.0.0", "stages.3.0", "final", "pool"])
    assert out.shape == (2, 24)
    assert inters["stem"].shape == (2, 8, 8, 8)          # /4 after stem
    assert inters["stages.0.0"].shape == (2, 8, 8, 8)    # stage 0: no down
    assert inters["stages.3.0"].shape == (2, 1, 1, 64)   # /32
    assert inters["final"].shape == (2, 1, 1, 128)       # cls_ratio 2x
    np.testing.assert_allclose(np.asarray(inters["pool"]), np.asarray(out))
    assert F.fastvit_stage_names(FTINY) == [
        "stem", "stages.0.0", "stages.1.0", "stages.2.0", "stages.3.0",
        "final", "pool"]
    # train mode moves BN running stats in a RepMixer branch
    _, tstate, _ = F.fastvit_apply(params, state, _x(), FTINY, train=True)
    before = np.asarray(state["stem"][0]["conv_kxk"][0]["bn"]["mean"])
    after = np.asarray(tstate["stem"][0]["conv_kxk"][0]["bn"]["mean"])
    assert np.abs(after - before).max() > 0


def test_fastvit_state_dict_naming_and_roundtrip():
    """timm fastvit naming: MobileOne branches (conv_kxk.0/conv_scale/
    identity BNs), RepMixer norm/mixer difference form, reparam LKC
    downsamples with SE on stages 2-3, RepCPE at stage 3, final_conv,
    head.fc as the CLIP projection."""
    params, state = F.fastvit_init(jax.random.PRNGKey(1), FTINY)
    sd = F.fastvit_pytrees_to_state_dict(params, state, FTINY)
    for key, shape in (
        ("trunk.stem.0.conv_kxk.0.conv.weight", (8, 3, 3, 3)),
        ("trunk.stem.0.conv_scale.conv.weight", (8, 3, 1, 1)),
        ("trunk.stem.1.conv_kxk.0.conv.weight", (8, 1, 3, 3)),   # depthwise
        ("trunk.stem.1.conv_kxk.0.bn.running_mean", (8,)),
        ("trunk.stem.2.identity.weight", (8,)),                  # 1x1 same-ch
        ("trunk.stages.0.blocks.0.token_mixer.norm.identity.running_var", (8,)),
        ("trunk.stages.0.blocks.0.token_mixer.mixer.conv_kxk.0.conv.weight", (8, 1, 3, 3)),
        ("trunk.stages.0.blocks.0.token_mixer.layer_scale.gamma", (8,)),
        ("trunk.stages.0.blocks.0.mlp.conv.conv.weight", (8, 1, 7, 7)),
        ("trunk.stages.0.blocks.0.mlp.fc1.weight", (24, 8, 1, 1)),  # ratio 3
        ("trunk.stages.1.downsample.proj.0.large_conv.conv.weight", (16, 1, 7, 7)),
        ("trunk.stages.1.downsample.proj.0.small_conv.conv.weight", (16, 1, 3, 3)),
        ("trunk.stages.2.downsample.proj.0.se.fc1.weight", (8, 32, 1, 1)),  # lkc rd 0.25
        ("trunk.stages.3.pos_emb.pos_enc.weight", (64, 1, 7, 7)),
        ("trunk.stages.3.blocks.0.norm.running_mean", (64,)),
        ("trunk.stages.3.blocks.0.token_mixer.qkv.weight", (192, 64)),
        ("trunk.stages.3.blocks.0.layer_scale_1.gamma", (64,)),
        ("trunk.final_conv.conv_kxk.0.conv.weight", (128, 1, 3, 3)),
        ("trunk.final_conv.se.fc1.weight", (8, 128, 1, 1)),
        ("trunk.head.fc.weight", (24, 128)),
    ):
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape)
    # SE only on stage 2-3 downsamples; qkv is bias-free; stage-0 blocks
    # carry no attention keys
    assert "trunk.stages.1.downsample.proj.0.se.fc1.weight" not in sd
    assert "trunk.stages.3.blocks.0.token_mixer.qkv.bias" not in sd
    assert "trunk.stages.0.blocks.0.norm.weight" not in sd
    assert "trunk.stem.0.identity.weight" not in sd  # stride 2: no id branch

    params2, state2 = F.fastvit_state_dict_to_pytrees(sd, FTINY)
    x = _x()
    out1, _, _ = F.fastvit_apply(params, state, x, FTINY)
    out2, _, _ = F.fastvit_apply(params2, state2, x, FTINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_repmixer_identity_property():
    """With mixer == norm (same BN branch params), the RepMixer update is
    exactly zero: x + gamma*(mixer(x) - norm(x)) == x."""
    params, state = F.fastvit_init(jax.random.PRNGKey(2), FTINY)
    blk_p = params["stages"][0]["blocks"][0]
    blk_s = state["stages"][0]["blocks"][0]
    import copy
    tm = blk_p["token_mixer"]
    # silence the mixer's conv branches (BN scale 0 -> contribution 0, the
    # zero-init BN bias adds nothing) and copy the norm branch's identity
    # BN into the mixer's identity BN: then mixer(x) == norm(x) exactly
    tm["mixer"]["conv_kxk"][0]["bn"]["scale"] = jnp.zeros((8,))
    tm["mixer"]["conv_scale"]["bn"]["scale"] = jnp.zeros((8,))
    tm["mixer"]["identity"] = copy.deepcopy(tm["norm"]["identity"])
    blk_s["token_mixer"]["mixer"]["identity"] = copy.deepcopy(
        blk_s["token_mixer"]["norm"]["identity"])
    x = np.random.RandomState(0).randn(2, 8, 8, 8).astype(np.float32)
    y, _ = F._repmixer_block(blk_p, blk_s, jnp.asarray(x))
    # token-mixer delta is zero -> only the ConvMlp residual remains; undo it
    mlp_y, _ = F._convmlp(blk_p["mlp"], blk_s["mlp"], jnp.asarray(x))
    resid = np.asarray(y) - (x + np.asarray(F._gamma(blk_p["layer_scale"], mlp_y)))
    np.testing.assert_allclose(resid, 0.0, atol=1e-5)


def test_shipped_mobileclip_s_configs_parse():
    from xclip_tpu.models.clip import clip_cfg_from_dict
    from xclip_tpu.models.factory import get_model_config

    for name, (depths, dims) in {
        "MobileCLIP-S1": ((4, 12, 20, 4), (64, 128, 256, 512)),
        "MobileCLIP-S2": ((4, 12, 24, 4), (80, 160, 320, 640)),
    }.items():
        cfg = clip_cfg_from_dict(get_model_config(name))
        assert cfg.is_native_timm and cfg.custom_text, name
        v = cfg.vision
        assert isinstance(v, F.FastViTCfg), name
        assert v.depths == depths and v.dims == dims, name
        assert v.num_features == 2 * dims[-1], name
        assert v.output_dim == 512 and v.image_size == 256, name
        assert cfg.text.no_causal_mask, name  # S1/S2: non-causal text


@pytest.fixture()
def fastvit_tiny_variant(monkeypatch):
    monkeypatch.setitem(F.VARIANTS, "fastvit_test_tiny",
                        dict(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)))


def test_fastvit_clip_integration(fastvit_tiny_variant):
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    d = {
        "embed_dim": 24,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "timm_model_name": "fastvit_test_tiny",
                       "timm_pool": "avg", "timm_proj": None},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 24,
                     "heads": 4, "layers": 2, "no_causal_mask": True},
    }
    cfg = clip_cfg_from_dict(d)
    model = CLIPModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    out = model.forward(params, _x(), ids, state=state)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)

    _, tstate, _ = model.encode_image(params, _x(), state=state, train=True)
    sd = pytrees_to_open_clip_state_dict(model, params, {"visual": tstate["visual"]})
    assert "visual.trunk.stem.0.conv_kxk.0.bn.running_mean" in sd
    params2, state2 = open_clip_state_dict_to_pytrees(sd, model)
    g1, _, _ = model.encode_image(params, _x(), state=tstate, normalize=True)
    g2, _, _ = model.encode_image(params2, _x(), state=state2, normalize=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)


def test_fastvit_trains_through_step(fastvit_tiny_variant):
    """Stateful BN towers train through the real step: params move AND the
    pmean'd BN running stats advance (reference trains BN unsynced per
    device; our step pmeans the stats — documented SyncBN-like choice)."""
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    d = {
        "embed_dim": 24,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "timm_model_name": "fastvit_test_tiny",
                       "timm_pool": "avg", "timm_proj": None},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 24,
                     "heads": 4, "layers": 2, "no_causal_mask": True},
    }
    model = CLIPModel(clip_cfg_from_dict(d))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.1)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
    n = jax.device_count()
    ids = np.random.RandomState(0).randint(1, 63, size=(2, 16)).astype(np.int32)
    batch = shard_batch(mesh, {"images": np.tile(_x(), (n, 1, 1, 1)),
                               "texts": np.tile(ids, (n, 1))})
    # snapshot before the step: its buffers are donated to the jit
    params0 = jax.tree_util.tree_map(np.asarray, params)
    bn_before = np.asarray(state["visual"]["stem"][0]["conv_kxk"][0]["bn"]["mean"])
    params2, state2, _, metrics = step(params, state, tx.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - jnp.asarray(b)).max()),
        params2["visual"], params0["visual"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    bn_moved = np.abs(
        np.asarray(state2["visual"]["stem"][0]["conv_kxk"][0]["bn"]["mean"]) -
        bn_before).max()
    assert bn_moved > 0
