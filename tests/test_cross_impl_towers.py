"""Cross-implementation numerics oracles for the native timm-family towers.

timm itself is absent from this image, but HuggingFace ``transformers`` ships
INDEPENDENT torch implementations of three of the architectures our native
towers re-implement from scratch:

- ``SiglipVisionModel``  <-> models/timm_vit.py   (the SigLIP ViT trunk +
  AttentionPoolLatent head; reference builds it via timm through
  deps/open_clip/src/open_clip/timm_model.py:57-89)
- ``ConvNextModel``      <-> models/convnext.py
- ``SwinModel``          <-> models/swin.py

Each test random-initialises the HF torch model, maps its state dict into the
timm/open_clip checkpoint layout our ``*_state_dict_to_params`` bridges expect,
and asserts the pooled features (every weight in the tower contributes) match
to float32 tolerance. Unlike the self-snapshot goldens, these can fail on a
real numerics bug (wrong stride, eps, norm placement, window shift, bias
indexing, qkv packing) — the two codebases share no code.

The HF configs are pinned to the exact-erf GELU (``hidden_act='gelu'``) to
match the timm default our towers follow; the activation choice is a config
knob, not the subject under test.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def _randomize(model: torch.nn.Module, seed: int) -> None:
    """Fill every parameter with a seeded non-degenerate value: 1D non-bias
    vectors (LN scales, layer-scale gammas) near 1 so normalisation layers
    keep signal; everything else N(0, 0.05)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and not name.endswith("bias"):
                p.copy_(1.0 + 0.2 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.05 * torch.randn(p.shape, generator=gen))


def _np(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


def _lin(sd, dst, src_prefix, hf):
    sd[f"{dst}.weight"] = _np(hf[f"{src_prefix}.weight"])
    if f"{src_prefix}.bias" in hf:
        sd[f"{dst}.bias"] = _np(hf[f"{src_prefix}.bias"])


# ---------------------------------------------------------------------------
# SigLIP ViT (timm_vit.py) vs transformers SiglipVisionModel


def test_timm_vit_siglip_matches_hf_transformers():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from xclip_tpu.models.timm_vit import (
        TimmViTCfg, timm_vit_apply, timm_vit_state_dict_to_params)

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8,
        hidden_act="gelu", layer_norm_eps=1e-6, attention_dropout=0.0,
    )
    model = SiglipVisionModel(hf_cfg)
    try:
        model.set_attn_implementation("eager")
    except AttributeError:
        model.config._attn_implementation = "eager"
    model.eval()
    _randomize(model, seed=11)
    hf = model.state_dict()

    d = hf_cfg.hidden_size
    sd = {}
    pre = "vision_model"
    sd["trunk.patch_embed.proj.weight"] = _np(hf[f"{pre}.embeddings.patch_embedding.weight"])
    sd["trunk.patch_embed.proj.bias"] = _np(hf[f"{pre}.embeddings.patch_embedding.bias"])
    sd["trunk.pos_embed"] = _np(hf[f"{pre}.embeddings.position_embedding.weight"])[None]
    for i in range(hf_cfg.num_hidden_layers):
        src = f"{pre}.encoder.layers.{i}"
        dst = f"trunk.blocks.{i}"
        _lin(sd, f"{dst}.norm1", f"{src}.layer_norm1", hf)
        sd[f"{dst}.attn.qkv.weight"] = np.concatenate(
            [_np(hf[f"{src}.self_attn.{w}_proj.weight"]) for w in ("q", "k", "v")], axis=0)
        sd[f"{dst}.attn.qkv.bias"] = np.concatenate(
            [_np(hf[f"{src}.self_attn.{w}_proj.bias"]) for w in ("q", "k", "v")], axis=0)
        _lin(sd, f"{dst}.attn.proj", f"{src}.self_attn.out_proj", hf)
        _lin(sd, f"{dst}.norm2", f"{src}.layer_norm2", hf)
        _lin(sd, f"{dst}.mlp.fc1", f"{src}.mlp.fc1", hf)
        _lin(sd, f"{dst}.mlp.fc2", f"{src}.mlp.fc2", hf)
    _lin(sd, "trunk.norm", f"{pre}.post_layernorm", hf)
    # SiglipMultiheadAttentionPoolingHead == timm AttentionPoolLatent with a
    # single latent token: nn.MultiheadAttention packs [q;k;v] in in_proj
    sd["trunk.attn_pool.latent"] = _np(hf[f"{pre}.head.probe"])
    in_w = _np(hf[f"{pre}.head.attention.in_proj_weight"])
    in_b = _np(hf[f"{pre}.head.attention.in_proj_bias"])
    sd["trunk.attn_pool.q.weight"], sd["trunk.attn_pool.q.bias"] = in_w[:d], in_b[:d]
    sd["trunk.attn_pool.kv.weight"], sd["trunk.attn_pool.kv.bias"] = in_w[d:], in_b[d:]
    _lin(sd, "trunk.attn_pool.proj", f"{pre}.head.attention.out_proj", hf)
    _lin(sd, "trunk.attn_pool.norm", f"{pre}.head.layernorm", hf)
    _lin(sd, "trunk.attn_pool.mlp.fc1", f"{pre}.head.mlp.fc1", hf)
    _lin(sd, "trunk.attn_pool.mlp.fc2", f"{pre}.head.mlp.fc2", hf)

    cfg = TimmViTCfg(
        timm_name="hf-oracle", output_dim=d, image_size=16, patch_size=8,
        width=d, layers=2, heads=4, mlp_ratio=2.0, pool="map", proj="none")
    params = timm_vit_state_dict_to_params(sd, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        want = _np(model(torch.from_numpy(x.transpose(0, 3, 1, 2))).pooler_output)
    got, _ = timm_vit_apply(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=5e-5)


# ---------------------------------------------------------------------------
# ConvNeXt (convnext.py) vs transformers ConvNextModel


def test_convnext_matches_hf_transformers():
    from transformers import ConvNextConfig, ConvNextModel

    from xclip_tpu.models.convnext import (
        ConvNeXtCfg, convnext_apply, convnext_state_dict_to_params)

    depths = [1, 1, 2, 1]
    dims = [8, 16, 24, 32]
    hf_cfg = ConvNextConfig(
        num_channels=3, patch_size=4, num_stages=4,
        hidden_sizes=dims, depths=depths, hidden_act="gelu",
        layer_norm_eps=1e-6, layer_scale_init_value=1e-6, drop_path_rate=0.0,
        image_size=32,
    )
    model = ConvNextModel(hf_cfg)
    model.eval()
    _randomize(model, seed=7)
    hf = model.state_dict()

    sd = {}
    sd["trunk.stem.0.weight"] = _np(hf["embeddings.patch_embeddings.weight"])
    sd["trunk.stem.0.bias"] = _np(hf["embeddings.patch_embeddings.bias"])
    _lin(sd, "trunk.stem.1", "embeddings.layernorm", hf)
    for s in range(4):
        if s > 0:
            _lin(sd, f"trunk.stages.{s}.downsample.0",
                 f"encoder.stages.{s}.downsampling_layer.0", hf)
            _lin(sd, f"trunk.stages.{s}.downsample.1",
                 f"encoder.stages.{s}.downsampling_layer.1", hf)
        for b in range(depths[s]):
            src = f"encoder.stages.{s}.layers.{b}"
            dst = f"trunk.stages.{s}.blocks.{b}"
            _lin(sd, f"{dst}.conv_dw", f"{src}.dwconv", hf)
            _lin(sd, f"{dst}.norm", f"{src}.layernorm", hf)
            _lin(sd, f"{dst}.mlp.fc1", f"{src}.pwconv1", hf)
            _lin(sd, f"{dst}.mlp.fc2", f"{src}.pwconv2", hf)
            sd[f"{dst}.gamma"] = _np(hf[f"{src}.layer_scale_parameter"])
    _lin(sd, "trunk.head.norm", "layernorm", hf)

    cfg = ConvNeXtCfg(timm_name="hf-oracle", output_dim=dims[-1],
                      image_size=32, depths=tuple(depths), dims=tuple(dims),
                      proj="none")
    params = convnext_state_dict_to_params(sd, cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_pool, inters = convnext_apply(
        params, jnp.asarray(x), cfg, capture=[f"stages.3.{depths[3] - 1}"])
    # final feature map (pre-pool) and the LN'd pooled features
    want_map = _np(out.last_hidden_state).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(inters[f"stages.3.{depths[3] - 1}"]), want_map,
        atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(got_pool), _np(out.pooler_output), atol=5e-5, rtol=5e-5)


# ---------------------------------------------------------------------------
# Swin (swin.py) vs transformers SwinModel


def test_swin_matches_hf_transformers():
    from transformers import SwinConfig, SwinModel

    from xclip_tpu.models.swin import SwinCfg, swin_apply, swin_state_dict_to_params

    depths = [2, 2]
    heads = [2, 4]
    hf_cfg = SwinConfig(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=depths, num_heads=heads, window_size=4, mlp_ratio=4.0,
        qkv_bias=True, hidden_act="gelu", use_absolute_embeddings=False,
        patch_norm=True, layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    model = SwinModel(hf_cfg, add_pooling_layer=True, use_mask_token=False)
    try:
        model.set_attn_implementation("eager")
    except AttributeError:
        model.config._attn_implementation = "eager"
    model.eval()
    _randomize(model, seed=5)
    hf = model.state_dict()

    sd = {}
    sd["trunk.patch_embed.proj.weight"] = _np(hf["embeddings.patch_embeddings.projection.weight"])
    sd["trunk.patch_embed.proj.bias"] = _np(hf["embeddings.patch_embeddings.projection.bias"])
    _lin(sd, "trunk.patch_embed.norm", "embeddings.norm", hf)
    for s in range(len(depths)):
        if s > 0:
            # HF hangs the merge off the END of stage s-1; timm (our layout)
            # off the START of stage s — same position in the compute graph
            _lin(sd, f"trunk.layers.{s}.downsample.norm",
                 f"encoder.layers.{s - 1}.downsample.norm", hf)
            _lin(sd, f"trunk.layers.{s}.downsample.reduction",
                 f"encoder.layers.{s - 1}.downsample.reduction", hf)
        for b in range(depths[s]):
            src = f"encoder.layers.{s}.blocks.{b}"
            dst = f"trunk.layers.{s}.blocks.{b}"
            _lin(sd, f"{dst}.norm1", f"{src}.layernorm_before", hf)
            sd[f"{dst}.attn.qkv.weight"] = np.concatenate(
                [_np(hf[f"{src}.attention.self.{w}.weight"]) for w in ("query", "key", "value")],
                axis=0)
            sd[f"{dst}.attn.qkv.bias"] = np.concatenate(
                [_np(hf[f"{src}.attention.self.{w}.bias"]) for w in ("query", "key", "value")],
                axis=0)
            sd[f"{dst}.attn.relative_position_bias_table"] = _np(
                hf[f"{src}.attention.self.relative_position_bias_table"])
            _lin(sd, f"{dst}.attn.proj", f"{src}.attention.output.dense", hf)
            _lin(sd, f"{dst}.norm2", f"{src}.layernorm_after", hf)
            _lin(sd, f"{dst}.mlp.fc1", f"{src}.intermediate.dense", hf)
            _lin(sd, f"{dst}.mlp.fc2", f"{src}.output.dense", hf)
    _lin(sd, "trunk.norm", "layernorm", hf)

    cfg = SwinCfg(timm_name="hf-oracle", output_dim=32, image_size=32,
                  patch_size=4, window=4, embed_dim=16,
                  depths=tuple(depths), heads=tuple(heads), proj="none")
    params = swin_state_dict_to_params(sd, cfg)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_pool, _ = swin_apply(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(
        np.asarray(got_pool), _np(out.pooler_output), atol=5e-5, rtol=5e-5)
