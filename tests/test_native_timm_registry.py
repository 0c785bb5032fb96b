"""The native-timm dispatch registry (models/native_timm.py): every family
satisfies the uniform module surface, timm_model_name routing is unambiguous,
and the stateful (HAS_STATE) protocol wraps stateless families transparently.
"""

import numpy as np

import jax

from xclip_tpu.models import native_timm


def test_family_surface_contract():
    fams = native_timm._families()
    assert len(fams) == 7
    seen_names = {}
    for cls, mod, prefix in fams:
        assert isinstance(mod.VARIANTS, dict) and mod.VARIANTS, prefix
        for name in mod.VARIANTS:
            assert name not in seen_names, f"{name} in {prefix} and {seen_names.get(name)}"
            seen_names[name] = prefix
        for fn in ("cfg_from_vision_dict", "init", "apply", "stage_names"):
            assert callable(getattr(mod, f"{prefix}_{fn}")), (prefix, fn)
        if getattr(mod, "HAS_STATE", False):
            bridge = ("pytrees_to_state_dict", "state_dict_to_pytrees")
        else:
            bridge = ("params_to_state_dict", "state_dict_to_params")
        for fn in bridge:
            assert callable(getattr(mod, f"{prefix}_{fn}")), (prefix, fn)
    # all 37 reference timm_model_names are routed (11 convnext + 13 timm-vit
    # + 4 eva + 2 swin + 9 vitamin + 1 mci + 2 fastvit - shared names)
    assert len(seen_names) >= 37


def test_unknown_timm_name_raises_with_catalog():
    import pytest

    with pytest.raises(NotImplementedError, match="native variants"):
        native_timm.cfg_from_vision_dict(
            {"timm_model_name": "resnetv2_50x1_bit"}, 512)


def test_stateless_wrapping_uniform():
    """init/apply/state_dict wrappers present one stateful-shaped interface
    for a stateless family (convnext)."""
    from xclip_tpu.models.convnext import ConvNeXtCfg

    cfg = ConvNeXtCfg(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                      output_dim=16, image_size=32)
    assert not native_timm.has_state(cfg)
    params, state = native_timm.init(jax.random.PRNGKey(0), cfg)
    assert state == {}
    x = np.zeros((1, 32, 32, 3), np.float32)
    out, new_state, inters = native_timm.apply(params, state, x, cfg)
    assert out.shape == (1, 16) and new_state == {}
    sd = native_timm.pytrees_to_state_dict(params, state, cfg)
    params2, state2 = native_timm.state_dict_to_pytrees(sd, cfg)
    assert state2 == {}
    out2, _, _ = native_timm.apply(params2, state2, x, cfg)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


def _tiny_cfgs():
    from xclip_tpu.models.convnext import ConvNeXtCfg
    from xclip_tpu.models.eva import EvaCfg
    from xclip_tpu.models.fastvit import FastViTCfg
    from xclip_tpu.models.mci_vit import MciViTCfg
    from xclip_tpu.models.swin import SwinCfg
    from xclip_tpu.models.timm_vit import TimmViTCfg
    from xclip_tpu.models.vitamin import ViTaminCfg

    return {
        "convnext": ConvNeXtCfg(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                                output_dim=16, image_size=32),
        "timm_vit": TimmViTCfg(timm_name="t", output_dim=16, image_size=32,
                               patch_size=8, width=32, layers=2, heads=4,
                               pool="map", proj="none"),
        "eva": EvaCfg(timm_name="t", output_dim=16, image_size=32, patch_size=8,
                      width=32, layers=2, heads=4, mlp_ratio=8 / 3,
                      qkv_fused=False, swiglu=True, rope=True, ref_grid=4),
        "swin": SwinCfg(timm_name="t", output_dim=16, image_size=32,
                        patch_size=2, window=4, embed_dim=16, depths=(2, 2),
                        heads=(2, 4)),
        "vitamin": ViTaminCfg(timm_name="t", output_dim=16, image_size=32,
                              native_size=32, mb_dims=(8, 16), vit_dim=32,
                              vit_depth=2, heads=4),
        "mci_vit": MciViTCfg(timm_name="t", output_dim=16, image_size=32,
                             width=32, layers=2, heads=4, stem_chs=(8, 16)),
        "fastvit": FastViTCfg(timm_name="t", output_dim=16, image_size=32,
                              depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)),
    }


def test_bf16_forward_every_family():
    """bfloat16 is the default training compute dtype — every family must
    trace and run under dtype=bfloat16 (fp32 params, bf16 activations) and
    produce finite fp32 features."""
    import jax.numpy as jnp

    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    for name, cfg in _tiny_cfgs().items():
        params, state = native_timm.init(jax.random.PRNGKey(0), cfg)
        out, _, _ = native_timm.apply(params, state, x, cfg, dtype=jnp.bfloat16)
        assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all(), name
        # and in train mode (BN batch stats, stochastic-depth paths)
        out_t, _, _ = native_timm.apply(params, state, x, cfg,
                                        dtype=jnp.bfloat16, train=True,
                                        rng=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out_t)).all(), name


def test_swin_indivisible_grid_raises():
    from xclip_tpu.models.swin import SwinCfg, swin_apply, swin_init

    cfg = SwinCfg(timm_name="t", output_dim=16, image_size=24, patch_size=2,
                  window=4, embed_dim=16, depths=(2, 2), heads=(2, 4))
    params = swin_init(jax.random.PRNGKey(0), cfg)
    import pytest

    x = np.zeros((1, 24, 24, 3), np.float32)  # grid 12 -> stage-1 grid 6 % 4
    with pytest.raises(NotImplementedError, match="window"):
        swin_apply(params, x, cfg)
