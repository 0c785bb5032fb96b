"""Full-forward independent-oracle parity for the tower families with no
torch/HF cross-implementation in this image (VERDICT r4 #3): EVA,
ViTamin, MobileCLIP.

Each oracle (tests/oracles/np_*.py) is a from-scratch float64 numpy
implementation written against the architecture spec and consuming the
TIMM state-dict layout — the whole trunk composed end to end (patch/stem
embed, pos embed, RoPE, every block, pooling, head), not per-block pieces.
The tests random-init the JAX tower, export to the timm state-dict via the
checkpoint bridge, run the numpy oracle on the same inputs, and assert the
final features match. A bug in qkv packing, rope band layout, norm
placement/eps, residual order, pooling site, or the bridge itself fails
these even though both sides are "ours" — the layouts and compute paths are
disjoint (reference analog: timm_model.py:1-193 gives this via timm).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ATOL = 2e-5
RTOL = 2e-4


def _noise_params(params, seed, scale=0.1):
    """Re-randomize every leaf to non-degenerate values (inits can be zeros,
    e.g. biases/cls token, which would mask packing bugs). Conv-heavy
    families need a larger scale or the signal attenuates until the output
    is input-independent — every parity test asserts non-hollowness."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    out = [jnp.asarray(scale * rng.randn(*np.asarray(l).shape), np.asarray(l).dtype)
           for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# EVA: three variants cover every code path (fused qkv + zero k-bias,
# separate qkv + RoPE + SwiGLU-with-LN, post-norm blocks)

EVA_VARIANTS = {
    "eva01-like": dict(qkv_fused=True, swiglu=False, rope=False, post_norm=False),
    "eva02-like": dict(qkv_fused=False, swiglu=True, rope=True, post_norm=False),
    "eva02-e-like": dict(qkv_fused=True, swiglu=False, rope=False, post_norm=True),
}


@pytest.mark.parametrize("variant", sorted(EVA_VARIANTS))
def test_eva_matches_numpy_oracle(variant):
    from xclip_tpu.models.eva import (
        EvaCfg, eva_apply, eva_init, eva_params_to_state_dict)
    from tests.oracles.np_eva import eva_forward

    flags = EVA_VARIANTS[variant]
    cfg = EvaCfg(timm_name="tiny", output_dim=24, image_size=24, patch_size=8,
                 width=32, layers=2, heads=2, mlp_ratio=2.0, ref_grid=7, **flags)
    params = _noise_params(eva_init(jax.random.PRNGKey(0), cfg), seed=1)

    rng = np.random.RandomState(2)
    images = rng.randn(2, 24, 24, 3).astype(np.float32)

    ours, _ = eva_apply(params, jnp.asarray(images), cfg)
    other, _ = eva_apply(
        params, jnp.asarray(rng.randn(2, 24, 24, 3).astype(np.float32)), cfg)
    assert np.abs(np.asarray(ours) - np.asarray(other)).max() > 1e-3  # non-hollow
    sd = eva_params_to_state_dict(params, cfg)
    theirs = eva_forward(
        sd, images, patch_size=cfg.patch_size, width=cfg.width,
        layers=cfg.layers, heads=cfg.heads, qkv_fused=cfg.qkv_fused,
        swiglu=cfg.swiglu, rope=cfg.rope, ref_grid=cfg.ref_grid,
        post_norm=cfg.post_norm)

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


def test_eva_oracle_catches_rope_layout_bug():
    """Sanity that the oracle has teeth: swapping the rope axis order
    (x-before-y) must break parity."""
    from xclip_tpu.models.eva import (
        EvaCfg, eva_apply, eva_init, eva_params_to_state_dict)
    from tests.oracles import np_eva

    cfg = EvaCfg(timm_name="tiny", output_dim=24, image_size=24, patch_size=8,
                 width=32, layers=2, heads=2, mlp_ratio=2.0, ref_grid=7,
                 qkv_fused=False, swiglu=True, rope=True)
    params = _noise_params(eva_init(jax.random.PRNGKey(0), cfg), seed=1)
    rng = np.random.RandomState(2)
    images = rng.randn(2, 24, 24, 3).astype(np.float32)
    ours, _ = eva_apply(params, jnp.asarray(images), cfg)
    sd = eva_params_to_state_dict(params, cfg)

    orig = np_eva._rope_angles

    def swapped(grid, ref_grid, head_dim):
        a = orig(grid, ref_grid, head_dim)
        half = a.shape[-1] // 2
        return np.concatenate([a[:, half:], a[:, :half]], axis=-1)

    np_eva._rope_angles = swapped
    try:
        theirs = np_eva.eva_forward(
            sd, images, patch_size=8, width=32, layers=2, heads=2,
            qkv_fused=False, swiglu=True, rope=True, ref_grid=7)
    finally:
        np_eva._rope_angles = orig
    assert not np.allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# ViTamin: MBConv-LN hybrid stages + GeGLU ViT stage + avg-pool head


def test_vitamin_matches_numpy_oracle():
    from xclip_tpu.models.vitamin import (
        ViTaminCfg, vitamin_apply, vitamin_init, vitamin_params_to_state_dict)
    from tests.oracles.np_vitamin import vitamin_forward

    cfg = ViTaminCfg(timm_name="tiny", output_dim=16, image_size=32,
                     native_size=32, mb_dims=(8, 16), vit_dim=32, vit_depth=2,
                     heads=2, proj="linear")
    params = _noise_params(vitamin_init(jax.random.PRNGKey(0), cfg), seed=3,
                           scale=0.5)
    rng = np.random.RandomState(4)
    images = rng.randn(2, 32, 32, 3).astype(np.float32)

    ours, _ = vitamin_apply(params, jnp.asarray(images), cfg)
    other, _ = vitamin_apply(
        params, jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32)), cfg)
    assert np.abs(np.asarray(ours) - np.asarray(other)).max() > 1e-3  # non-hollow
    sd = vitamin_params_to_state_dict(params, cfg)
    theirs = vitamin_forward(sd, images, heads=cfg.heads, vit_depth=cfg.vit_depth)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


def test_vitamin_oracle_catches_shortcut_bug():
    """Teeth: replacing the stride-2 shortcut's count_include_pad=False
    average pool with the naive (include-pad) one must break parity."""
    from xclip_tpu.models.vitamin import (
        ViTaminCfg, vitamin_apply, vitamin_init, vitamin_params_to_state_dict)
    from tests.oracles import np_vitamin
    from tests.oracles import np_common

    cfg = ViTaminCfg(timm_name="tiny", output_dim=16, image_size=32,
                     native_size=32, mb_dims=(8, 16), vit_dim=32, vit_depth=2,
                     heads=2, proj="linear")
    params = _noise_params(vitamin_init(jax.random.PRNGKey(0), cfg), seed=3,
                           scale=0.5)
    rng = np.random.RandomState(4)
    images = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours, _ = vitamin_apply(params, jnp.asarray(images), cfg)
    sd = vitamin_params_to_state_dict(params, cfg)

    orig = np_vitamin.avgpool2d

    def include_pad(x, k, stride, padding, count_include_pad=False):
        return np_common.avgpool2d(x, k, stride, padding, count_include_pad=True)

    np_vitamin.avgpool2d = include_pad
    try:
        theirs = np_vitamin.vitamin_forward(sd, images, heads=2, vit_depth=2)
    finally:
        np_vitamin.avgpool2d = orig
    assert not np.allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# MobileCLIP FastViT (stateful BN, eval mode): MobileOne stem, RepMixer +
# attention stages, reparam downsamples, CPE, ConvMlp+LayerScale, SE


def _fastvit_tiny():
    from xclip_tpu.models.fastvit import FastViTCfg, fastvit_init

    cfg = FastViTCfg(timm_name="tiny", output_dim=16, image_size=32,
                     depths=(1, 1, 1, 1), dims=(8, 16, 16, 32))
    params, state = fastvit_init(jax.random.PRNGKey(0), cfg)
    # stronger noise than the ViT families: 5 stride-2 stages of small
    # random kernels otherwise attenuate the signal until the output is a
    # pure function of the BN biases (input sensitivity == 0, which would
    # make the parity assertion hollow — asserted non-hollow below)
    params = _noise_params(params, seed=5, scale=0.6)
    # eval-mode BN: running stats must be valid (var > 0)
    rng = np.random.RandomState(6)

    def noise_state(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for l in leaves:
            arr = np.asarray(l)
            out.append(jnp.asarray(0.5 + 0.3 * rng.rand(*arr.shape), arr.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    # mean leaves can be any value; var leaves must be positive — the
    # uniform(0.5, 0.8) noise satisfies both
    return cfg, params, noise_state(state)


def test_fastvit_matches_numpy_oracle():
    from xclip_tpu.models.fastvit import fastvit_apply, fastvit_pytrees_to_state_dict
    from tests.oracles.np_fastvit import fastvit_forward

    cfg, params, state = _fastvit_tiny()
    rng = np.random.RandomState(7)
    images = rng.randn(2, 32, 32, 3).astype(np.float32)

    ours, _, _ = fastvit_apply(params, state, jnp.asarray(images), cfg, train=False)
    # non-hollow: the output must actually depend on the input (BN biases
    # alone would otherwise make any two implementations "agree")
    other, _, _ = fastvit_apply(
        params, state, jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32)),
        cfg, train=False)
    assert np.abs(np.asarray(ours) - np.asarray(other)).max() > 1e-3
    sd = fastvit_pytrees_to_state_dict(params, state, cfg)
    theirs = fastvit_forward(sd, images, depths=cfg.depths, dims=cfg.dims)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


def test_fastvit_oracle_catches_repmixer_sign_bug():
    """Teeth: the RepMixer difference form x + g*(mixer - norm); flipping
    the sign must break parity."""
    from xclip_tpu.models.fastvit import fastvit_apply, fastvit_pytrees_to_state_dict
    from tests.oracles import np_fastvit

    cfg, params, state = _fastvit_tiny()
    rng = np.random.RandomState(7)
    images = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours, _, _ = fastvit_apply(params, state, jnp.asarray(images), cfg, train=False)
    sd = fastvit_pytrees_to_state_dict(params, state, cfg)

    orig = np_fastvit._repmixer_block

    def flipped(sd_, base, x):
        dim = x.shape[-1]
        normed = np_fastvit._mobileone(sd_, f"{base}.token_mixer.norm", x,
                                       groups=dim, act=False)
        mixed = np_fastvit._mobileone(sd_, f"{base}.token_mixer.mixer", x,
                                      groups=dim, act=False)
        x = x + sd_[f"{base}.token_mixer.layer_scale.gamma"] * (normed - mixed)
        y = np_fastvit._convmlp(sd_, f"{base}.mlp", x)
        return x + sd_[f"{base}.layer_scale.gamma"] * y

    np_fastvit._repmixer_block = flipped
    try:
        theirs = np_fastvit.fastvit_forward(sd, images, depths=cfg.depths, dims=cfg.dims)
    finally:
        np_fastvit._repmixer_block = orig
    assert not np.allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# MobileCLIP-B MCi hybrid ViT (BN stem, no_embed_class, token pool)


def test_mci_vit_matches_numpy_oracle():
    from xclip_tpu.models.mci_vit import (
        MciViTCfg, mci_vit_apply, mci_vit_init, mci_vit_pytrees_to_state_dict)
    from tests.oracles.np_mci import mci_forward

    cfg = MciViTCfg(timm_name="tiny", output_dim=16, image_size=32, width=32,
                    layers=2, heads=2, stem_chs=(8, 16))
    params, state = mci_vit_init(jax.random.PRNGKey(0), cfg)
    params = _noise_params(params, seed=8, scale=0.3)
    rng = np.random.RandomState(9)
    state = jax.tree_util.tree_map(
        lambda l: jnp.asarray(0.5 + 0.3 * rng.rand(*np.asarray(l).shape),
                              np.asarray(l).dtype), state)

    images = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours, _, _ = mci_vit_apply(params, state, jnp.asarray(images), cfg, train=False)
    other, _, _ = mci_vit_apply(
        params, state, jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32)),
        cfg, train=False)
    assert np.abs(np.asarray(ours) - np.asarray(other)).max() > 1e-3  # non-hollow

    sd = mci_vit_pytrees_to_state_dict(params, state, cfg)
    theirs = mci_forward(sd, images, width=cfg.width, layers=cfg.layers,
                         heads=cfg.heads)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL, atol=ATOL)
