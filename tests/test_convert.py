"""3rd-party checkpoint converters (core/convert.py).

The big_vision mapping is pinned by an exact round trip: a native SigLIP
model's open_clip state dict -> big_vision npz layout -> back, every array
bitwise equal; the converted dict also loads into the model through the
normal checkpoint bridge and reproduces the original forward outputs.
Reference: deps/open_clip/src/open_clip/convert.py.
"""

import numpy as np
import pytest

import jax

from xclip_tpu.core.convert import (
    convert_mobile_clip_text_state_dict,
    convert_state_dict,
    is_big_vision_npz,
    load_big_vision_weights,
    state_dict_to_big_vision,
)

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
HEADS = 4


@pytest.fixture()
def tiny_siglip(monkeypatch):
    from xclip_tpu.models import timm_vit as TV
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    monkeypatch.setitem(TV.VARIANTS, "vit_test_siglip",
                        dict(patch_size=8, width=32, layers=2, heads=HEADS))
    model = CLIPModel(clip_cfg_from_dict(SIGLIP_D))
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_big_vision_roundtrip_exact(tiny_siglip):
    from xclip_tpu.core.checkpoint import pytrees_to_open_clip_state_dict

    model, params, state = tiny_siglip
    sd = pytrees_to_open_clip_state_dict(model, params, state)
    w = state_dict_to_big_vision(sd, img_heads=HEADS, txt_heads=HEADS)
    assert is_big_vision_npz(w.keys())
    sd2 = load_big_vision_weights(w)
    assert set(sd2) == set(sd), (set(sd) ^ set(sd2))
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(sd2[k]), np.asarray(sd[k]), err_msg=k)


def test_big_vision_npz_loads_through_checkpoint_bridge(tiny_siglip, tmp_path):
    """An on-disk big_vision .npz loads via load_checkpoint (the reference's
    factory.py:148-151 dispatch) and reproduces the original forward."""
    from xclip_tpu.core.checkpoint import (
        load_checkpoint,
        pytrees_to_open_clip_state_dict,
    )

    model, params, state = tiny_siglip
    sd = pytrees_to_open_clip_state_dict(model, params, state)
    w = state_dict_to_big_vision(sd, img_heads=HEADS, txt_heads=HEADS)
    path = str(tmp_path / "siglip_bv.npz")
    np.savez(path, **w)

    params2, state2 = model.init(jax.random.PRNGKey(1))  # different init
    params2, state2 = load_checkpoint(path, model, params2, state2)

    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    ids = np.random.RandomState(1).randint(1, 63, size=(2, 16)).astype(np.int32)
    ref = model.forward(params, x, ids, state=state)
    got = model.forward(params2, x, ids, state=state2)
    np.testing.assert_allclose(np.asarray(got["image_features"]),
                               np.asarray(ref["image_features"]), atol=0)
    np.testing.assert_allclose(np.asarray(got["text_features"]),
                               np.asarray(ref["text_features"]), atol=0)


def test_native_npz_not_misdetected(tmp_path, tiny_siglip):
    """This stack's own native .npz checkpoints keep loading (the big_vision
    detector must not claim them)."""
    from xclip_tpu.core.checkpoint import load_checkpoint, save_native

    model, params, state = tiny_siglip
    path = str(tmp_path / "native.npz")
    save_native(path, params, state)
    with np.load(path) as probe:
        assert not is_big_vision_npz(probe.files)
    params2, state2 = model.init(jax.random.PRNGKey(1))
    params2, _ = load_checkpoint(path, model, params2, state2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mobile_clip_text_rename_table():
    """Exact rename table from reference convert.py:153-180."""
    sd = {
        "text_encoder.projection_layer.weight": np.zeros((4, 8)),
        "text_encoder.embedding_layer.weight": np.zeros((16, 8)),
        "text_encoder.positional_embedding.pos_embed.pos_embed": np.zeros((1, 10, 8)),
        "text_encoder.final_layer_norm.weight": np.zeros((8,)),
        "text_encoder.transformer.0.pre_norm_mha.0.weight": np.zeros((8,)),
        "text_encoder.transformer.0.pre_norm_mha.1.qkv_proj.weight": np.zeros((24, 8)),
        "text_encoder.transformer.0.pre_norm_mha.1.qkv_proj.bias": np.zeros((24,)),
        "text_encoder.transformer.0.pre_norm_mha.1.out_proj.weight": np.zeros((8, 8)),
        "text_encoder.transformer.0.pre_norm_ffn.0.weight": np.zeros((8,)),
        "text_encoder.transformer.0.pre_norm_ffn.1.weight": np.zeros((32, 8)),
        "text_encoder.transformer.0.pre_norm_ffn.4.weight": np.zeros((8, 32)),
        "image_encoder.ignored": np.zeros(1),
    }
    out = convert_mobile_clip_text_state_dict(sd)
    assert set(out) == {
        "text.text_projection.weight",
        "text.token_embedding.weight",
        "text.positional_embedding",
        "text.ln_final.weight",
        "text.transformer.resblocks.0.ln_1.weight",
        "text.transformer.resblocks.0.attn.in_proj_weight",
        "text.transformer.resblocks.0.attn.in_proj_bias",
        "text.transformer.resblocks.0.attn.out_proj.weight",
        "text.transformer.resblocks.0.ln_2.weight",
        "text.transformer.resblocks.0.mlp.c_fc.weight",
        "text.transformer.resblocks.0.mlp.c_proj.weight",
    }
    assert out["text.positional_embedding"].shape == (10, 8)  # squeezed


def test_text_pos_embed_resize_matches_torch_interpolate():
    """The text pos-embed resample (checkpoint.py) must match the
    reference's F.interpolate(mode='linear', align_corners=False) exactly
    (open_clip model.py:575-583) — torch is the oracle."""
    import torch
    import torch.nn.functional as F

    from xclip_tpu.core.checkpoint import _resize_text_pos_embed

    pe = np.random.RandomState(0).randn(77, 16).astype(np.float32)
    for target in (32, 64, 77, 120):
        ours = _resize_text_pos_embed(pe, target)
        ref = F.interpolate(
            torch.from_numpy(pe).reshape(1, 77, 16).permute(0, 2, 1),
            size=target, mode="linear", align_corners=False,
        ).permute(0, 2, 1)[0].numpy()
        # fp32 rounding-order only: ours computes a(1-f)+bf, torch a+f(b-a)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=0)
    np.testing.assert_array_equal(_resize_text_pos_embed(pe, 77), pe)


def test_load_77_token_checkpoint_into_short_context_model():
    """A 77-context checkpoint loads into a context-16 model (the CLIPA
    pattern) with the pos embed resampled, not shape-errored."""
    from xclip_tpu.core.checkpoint import (
        open_clip_state_dict_to_pytrees,
        pytrees_to_open_clip_state_dict,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    base = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                       "patch_size": 16, "head_width": 8},
        "text_cfg": {"context_length": 77, "vocab_size": 64, "width": 32,
                     "heads": 4, "layers": 2},
    }
    m77 = CLIPModel(clip_cfg_from_dict(base))
    p77, s77 = m77.init(jax.random.PRNGKey(0))
    sd = pytrees_to_open_clip_state_dict(m77, p77, s77)

    short = dict(base, text_cfg=dict(base["text_cfg"], context_length=16))
    m16 = CLIPModel(clip_cfg_from_dict(short))
    p16, _ = open_clip_state_dict_to_pytrees(sd, m16)
    assert p16["text"]["positional_embedding"].shape == (16, 32)


def test_apple_image_trunk_raises_documented():
    sd = {"image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight": np.zeros(1)}
    with pytest.raises(NotImplementedError, match="timm"):
        convert_state_dict(sd)
    assert convert_state_dict({"visual.ok": np.zeros(1)}) is not None


def test_sincos_pos_embed_matches_reference():
    """get_2d_sincos_pos_embed is value-identical to the reference's
    (pos_embed.py:20-67), and a sin_cos_2d ViT initializes with it."""
    import importlib.util
    import os

    from xclip_tpu.models.transformer import get_2d_sincos_pos_embed

    ref_path = "/root/reference/deps/open_clip/src/open_clip/pos_embed.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree absent")
    spec = importlib.util.spec_from_file_location("ref_pos_embed", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    for dim, grid, cls in ((16, 4, False), (32, 7, True), (64, 14, True)):
        ours = get_2d_sincos_pos_embed(dim, grid, cls_token=cls)
        theirs = ref.get_2d_sincos_pos_embed(dim, grid, cls_token=cls)
        np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)

    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    d = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                       "patch_size": 8, "head_width": 8,
                       "pos_embed_type": "sin_cos_2d"},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                     "heads": 4, "layers": 2},
    }
    model = CLIPModel(clip_cfg_from_dict(d))
    params, _ = model.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(params["visual"]["positional_embedding"]),
        get_2d_sincos_pos_embed(32, 4, cls_token=True), atol=0)


def test_sincos_pos_embed_frozen_in_training():
    """With pos_embed_type='sin_cos_2d' the pos embed never updates while
    other params do (reference requires_grad=False semantics)."""
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    d = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                       "patch_size": 8, "head_width": 8,
                       "pos_embed_type": "sin_cos_2d"},
        "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32,
                     "heads": 4, "layers": 2},
    }
    model = CLIPModel(clip_cfg_from_dict(d))
    params, state = model.init(jax.random.PRNGKey(0))
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.2)
    tx = optim.with_frozen(tx, optim.sincos_freeze_mask(params))
    mesh = create_mesh()
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "images": rng.randn(8, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 63, size=(8, 16)).astype(np.int32),
    })
    pe0 = np.asarray(params["visual"]["positional_embedding"])
    conv0 = np.asarray(params["visual"]["conv1"]["kernel"])
    params2, _, _, _ = step(params, state, tx.init(params), batch)
    np.testing.assert_array_equal(
        np.asarray(params2["visual"]["positional_embedding"]), pe0)
    assert np.abs(np.asarray(params2["visual"]["conv1"]["kernel"]) - conv0).max() > 0
