"""Golden parity: our JAX encoders must reproduce the reference torch
open_clip model bit-for-bit (float tolerance) when loaded with the same
weights through the checkpoint bridge. This is the correctness anchor for
everything downstream (zero-shot eval, training loss, SAE features)."""

import os

import numpy as np
import pytest

import jax

from xclip_tpu.core.checkpoint import (
    open_clip_state_dict_to_pytrees,
    pytrees_to_open_clip_state_dict,
)
from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

HAS_REFERENCE = os.path.exists("/root/reference")
pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")

SMALL_RN = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16, "patch_size": None},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
}
SMALL_VIT = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 64, "layers": 2, "width": 64, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
}


def _build_ref_model(cfg_dict, quick_gelu=False):
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch

    torch.manual_seed(0)
    model = open_clip.CLIP(
        embed_dim=cfg_dict["embed_dim"],
        vision_cfg=cfg_dict["vision_cfg"],
        text_cfg=cfg_dict["text_cfg"],
        quick_gelu=quick_gelu,
    )
    model.eval()
    return model


def _parity_case(cfg_dict, quick_gelu, img_tol=2e-4, txt_tol=2e-4):
    import torch

    ref = _build_ref_model(cfg_dict, quick_gelu)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = CLIPModel(clip_cfg_from_dict(cfg_dict, quick_gelu=quick_gelu))
    params, state = open_clip_state_dict_to_pytrees(sd, model)

    rng = np.random.RandomState(0)
    size = cfg_dict["vision_cfg"]["image_size"]
    img = rng.randn(2, size, size, 3).astype(np.float32)
    text = np.zeros((3, 77), dtype=np.int64)
    text[:, 0] = 49406
    text[0, 1:5] = [320, 1125, 539, 320]
    text[:, 5] = 49407
    text[1, 1:3] = [1000, 2000]
    text[2, 1:7] = [5, 6, 7, 8, 9, 10]

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(text)).numpy()

    got_img, _, _ = model.encode_image(params, img, state=state)
    got_txt, _ = model.encode_text(params, text)
    got_img, got_txt = np.asarray(got_img), np.asarray(got_txt)

    np.testing.assert_allclose(ref_img, got_img, atol=img_tol, rtol=1e-3)
    np.testing.assert_allclose(ref_txt, got_txt, atol=txt_tol, rtol=1e-3)
    return ref, model, params, state


class TestSmallModels:
    def test_resnet_parity(self):
        _parity_case(SMALL_RN, quick_gelu=False)

    def test_resnet_quickgelu_parity(self):
        _parity_case(SMALL_RN, quick_gelu=True)

    def test_vit_parity(self):
        _parity_case(SMALL_VIT, quick_gelu=False)

    def test_roundtrip_export(self):
        """params -> open_clip state dict -> params must be exact."""
        import torch

        ref = _build_ref_model(SMALL_RN)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        model = CLIPModel(clip_cfg_from_dict(SMALL_RN))
        params, state = open_clip_state_dict_to_pytrees(sd, model)
        sd2 = pytrees_to_open_clip_state_dict(model, params, state)
        ref2 = _build_ref_model(SMALL_RN)
        missing, unexpected = ref2.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd2.items()}, strict=False
        )
        assert not missing, missing
        assert not unexpected, unexpected
        for k, v in ref2.state_dict().items():
            if k == "attn_mask" or k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(v.numpy(), sd[k], err_msg=k)


SMALL_CLIPA = {
    # CLIPA-style tower flags at toy scale (ViT-*-CLIPA configs:
    # no_ln_pre + avg pool + final_ln_after_pool, text last-pool without
    # causal mask — reference model_configs/ViT-L-14-CLIPA.json)
    "embed_dim": 64,
    "vision_cfg": {
        "image_size": 64, "layers": 2, "width": 64, "patch_size": 16, "head_width": 16,
        "no_ln_pre": True, "pool_type": "avg", "final_ln_after_pool": True,
    },
    "text_cfg": {
        "context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2,
        "pool_type": "last", "no_causal_mask": True,
    },
}
SMALL_LS = {
    # LayerScale towers (ViT-M-16-alt.json ls_init_value)
    "embed_dim": 64,
    "vision_cfg": {
        "image_size": 64, "layers": 2, "width": 64, "patch_size": 16, "head_width": 16,
        "ls_init_value": 1e-4,
    },
    "text_cfg": {
        "context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2,
        "ls_init_value": 1e-4,
    },
}


class TestTowerVariants:
    def test_clipa_style_parity(self):
        _parity_case(SMALL_CLIPA, quick_gelu=False)

    def test_layerscale_parity(self):
        ref, model, params, state = _parity_case(SMALL_LS, quick_gelu=False)
        # gamma actually present in the mapped pytree (not silently dropped)
        assert "ls_1" in params["visual"]["blocks"][0]
        assert "ls_2" in params["text"]["blocks"][0]

    def test_variant_roundtrip_export(self):
        """CLIPA + LayerScale params -> open_clip sd -> strict-compatible load."""
        import torch

        for cfg_dict in (SMALL_CLIPA, SMALL_LS):
            ref = _build_ref_model(cfg_dict)
            sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
            model = CLIPModel(clip_cfg_from_dict(cfg_dict))
            params, state = open_clip_state_dict_to_pytrees(sd, model)
            sd2 = pytrees_to_open_clip_state_dict(model, params, state)
            ref2 = _build_ref_model(cfg_dict)
            missing, unexpected = ref2.load_state_dict(
                {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd2.items()},
                strict=False,
            )
            missing = [k for k in missing if k == "attn_mask" or "num_batches_tracked" in k]
            assert not missing, missing
            assert not unexpected, unexpected


def test_config_zoo_matches_reference():
    """Every shipped model config parses, and any same-named reference config
    must agree field-for-field (reference pattern: tests/util_test.py's
    per-config model coverage). Architecture substitutions must NOT squat on
    reference names: e.g. the SigLIP-style plain-ViT config is shipped as
    ViT-B-16-SigLIP-xclip, not ViT-B-16-SigLIP (whose reference definition
    is a timm tower)."""
    import json

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "xclip_tpu", "models", "configs")
    ref_dir = "/root/reference/deps/open_clip/src/open_clip/model_configs"
    names = sorted(f for f in os.listdir(cfg_dir) if f.endswith(".json"))
    assert len(names) >= 45
    for fname in names:
        with open(os.path.join(cfg_dir, fname)) as fh:
            d = json.load(fh)
        if "multimodal_cfg" not in d:  # CoCa configs parse via the coca factory
            cfg = clip_cfg_from_dict(d, quick_gelu=bool(d.get("quick_gelu", False)))
            assert cfg.embed_dim == d["embed_dim"]
        ref_path = os.path.join(ref_dir, fname)
        if os.path.exists(ref_path):
            with open(ref_path) as fh:
                assert d == json.load(fh), fname

    # complete zoo: every reference config ships here (104/104)
    if os.path.isdir(ref_dir):
        missing = sorted(set(os.listdir(ref_dir)) - set(names))
        assert not missing, f"reference configs not shipped: {missing}"


@pytest.mark.slow
def test_full_rn50_parity():
    _parity_case(
        {
            "embed_dim": 1024,
            "vision_cfg": {"image_size": 224, "layers": [3, 4, 6, 3], "width": 64, "patch_size": None},
            "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512, "heads": 8, "layers": 12},
        },
        quick_gelu=True,
        img_tol=5e-3,
        txt_tol=2e-3,
    )


@pytest.mark.slow
def test_full_vit_b32_parity():
    _parity_case(
        {
            "embed_dim": 512,
            "vision_cfg": {"image_size": 224, "layers": 12, "width": 768, "patch_size": 32},
            "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512, "heads": 8, "layers": 12},
        },
        quick_gelu=False,
        img_tol=2e-3,
        txt_tol=2e-3,
    )


def test_intermediates_capture():
    model = CLIPModel(clip_cfg_from_dict(SMALL_RN))
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.zeros((1, 64, 64, 3), np.float32)
    names = model.visual_stage_names()
    feats, _, inters = model.encode_image(params, x, state=state, capture=names)
    assert set(inters) == set(names)
    assert inters["attnpool"].shape == (1, 64)


def test_build_model_from_state_dict_inference():
    """Config inference from state-dict shapes (the reference build_model
    path) reconstructs the right architecture for both tower families."""
    from xclip_tpu.core.checkpoint import (
        build_model_from_state_dict,
        infer_clip_cfg_from_state_dict,
    )

    # head_width must be the conventional 64 — shape inference cannot
    # recover nonstandard head counts (same limitation as the reference)
    small_vit_hw64 = dict(SMALL_VIT)
    small_vit_hw64["vision_cfg"] = dict(SMALL_VIT["vision_cfg"], head_width=64)
    for cfg_dict in (SMALL_RN, small_vit_hw64):
        model = CLIPModel(clip_cfg_from_dict(cfg_dict))
        params, state = model.init(jax.random.PRNGKey(0))
        sd = pytrees_to_open_clip_state_dict(model, params, state)
        inferred = infer_clip_cfg_from_state_dict(sd)
        assert inferred["embed_dim"] == cfg_dict["embed_dim"]
        assert inferred["text_cfg"]["layers"] == cfg_dict["text_cfg"]["layers"]
        v = inferred["vision_cfg"]
        if isinstance(cfg_dict["vision_cfg"]["layers"], list):
            assert v["layers"] == cfg_dict["vision_cfg"]["layers"]
        else:
            assert v["patch_size"] == cfg_dict["vision_cfg"]["patch_size"]
        model2, params2, state2 = build_model_from_state_dict(sd, quick_gelu=False)
        x = np.zeros((1, cfg_dict["vision_cfg"]["image_size"],
                      cfg_dict["vision_cfg"]["image_size"], 3), np.float32)
        f1, _, _ = model.encode_image(params, x, state=state)
        f2, _, _ = model2.encode_image(params2, x, state=state2)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_orbax_roundtrip_sync_and_async(tmp_path):
    """save_orbax/load_orbax roundtrip; async_save overlaps and defers the
    extras.json sidecar until wait_until_finished()."""
    from xclip_tpu.core.checkpoint import load_orbax, save_orbax

    model = CLIPModel(clip_cfg_from_dict(SMALL_RN))
    params, state = model.init(jax.random.PRNGKey(0))

    sync_dir = str(tmp_path / "sync_ckpt")
    save_orbax(sync_dir, params, state, extras={"epoch": 3})
    p2, s2, extras = load_orbax(sync_dir, params, state)
    assert extras == {"epoch": 3}
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(np.array_equal(a, b)), params, p2)
    )

    async_dir = str(tmp_path / "async_ckpt")
    handle = save_orbax(async_dir, params, state, extras={"epoch": 7}, async_save=True)
    assert handle is not None
    handle.wait_until_finished()
    handle.wait_until_finished()  # idempotent
    p3, _, extras3 = load_orbax(async_dir, params, state)
    assert extras3 == {"epoch": 7}
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(np.array_equal(a, b)), params, p3)
    )


def test_vit_attentional_pool_parity():
    """Plain-ViT attentional_pool (reference transformer.py:514-529, 625-629:
    attn_pool -> ln_post -> tok pool -> proj): golden forward parity and
    exact state-dict roundtrip through the bridge."""
    import torch

    cfg_dict = {
        **SMALL_VIT,
        "vision_cfg": {
            **SMALL_VIT["vision_cfg"],
            "attentional_pool": True, "attn_pooler_queries": 4, "attn_pooler_heads": 4,
        },
    }
    ref = _build_ref_model(cfg_dict)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = CLIPModel(clip_cfg_from_dict(cfg_dict))
    params, state = open_clip_state_dict_to_pytrees(sd, model)

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        f_ref = ref.encode_image(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    f, _, _ = model.encode_image(params, x, state=state)
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=5e-4, rtol=1e-3)

    sd2 = pytrees_to_open_clip_state_dict(model, params, state)
    for k in sd:
        if k == "attn_mask":
            continue
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-6, err_msg=k)


def test_force_image_size_pos_embed_resize():
    """--force-image-size: loading a ViT checkpoint at a different image size
    bicubic-resizes the positional-embedding grid; matches the reference's
    resize_pos_embed (open_clip/model.py:523-553) on the same weights."""
    import torch

    from xclip_tpu.models.factory import create_model, get_clip_cfg, get_model_config

    m224, p224, s224 = create_model("ViT-S-32")
    sd = pytrees_to_open_clip_state_dict(m224, p224, s224)

    m160 = CLIPModel(get_clip_cfg("ViT-S-32", force_image_size=160))
    p160, s160 = open_clip_state_dict_to_pytrees(sd, m160)
    pe = np.asarray(p160["visual"]["positional_embedding"])
    assert pe.shape[0] == (160 // 32) ** 2 + 1

    x = np.random.RandomState(0).randn(2, 160, 160, 3).astype(np.float32)
    f, _, _ = m160.encode_image(p160, x, state=s160, normalize=True)
    assert np.isfinite(np.asarray(f)).all()

    from ref_compat import import_reference_open_clip

    oc = import_reference_open_clip()
    c = get_model_config("ViT-S-32")
    c["vision_cfg"]["image_size"] = 160
    ref = oc.CLIP(embed_dim=c["embed_dim"], vision_cfg=c["vision_cfg"], text_cfg=c["text_cfg"])
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in sd.items()}
    oc.model.resize_pos_embed(sd_t, ref)
    np.testing.assert_allclose(pe, sd_t["visual.positional_embedding"].numpy(), atol=1e-6)

    assert get_clip_cfg("ViT-S-32", force_patch_dropout=0.5).vision.patch_dropout == 0.5


def test_stage_scan_parity(monkeypatch):
    """XCLIP_STAGE_SCAN=1 (stage-tail blocks as one lax.scan over stacked
    params — the cross-block wgrad-batching A/B) is bit-identical to the
    per-block Python loop: outputs, BN state updates, and grads."""
    from xclip_tpu.models import resnet as R

    cfg = R.ResNetCfg(layers=(2, 3, 2, 2), width=16, output_dim=64, heads=4, image_size=64)
    params, state = R.resnet_init(jax.random.PRNGKey(0), cfg)
    x = jax.numpy.asarray(np.random.RandomState(0).randn(4, 64, 64, 3), jax.numpy.float32)

    def run(flag):
        monkeypatch.setenv("XCLIP_STAGE_SCAN", flag)
        y, ns, _ = jax.jit(lambda p, s, xx: R.resnet_apply(p, s, xx, cfg, train=True))(
            params, state, x)
        g = jax.jit(jax.grad(
            lambda p: jax.numpy.sum(R.resnet_apply(p, state, x, cfg, train=True)[0] ** 2)
        ))(params)
        return y, ns, g

    y0, ns0, g0 = run("0")
    y1, ns1, g1 = run("1")
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ns0), jax.tree_util.tree_leaves(ns1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3)
