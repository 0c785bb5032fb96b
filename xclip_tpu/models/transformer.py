"""Vision & text transformer towers — TPU-native functional implementation.

Reference behaviour: deps/open_clip/src/open_clip/transformer.py
(ResidualAttentionBlock :210, VisionTransformer :427, TextTransformer :661,
text_global_pool :646). Pre-LN residual blocks; learnable class token and
positional embeddings; argmax-EOT pooling for text. Blocks are exposed as
named stages for capture/patching (same mechanism as the ResNet tower).

TPU notes: all matmuls run through the MXU in the policy compute dtype with
fp32 accumulation; LayerNorm is fp32. Grad-checkpointing wraps each residual
block with jax.checkpoint (reference: transformer.py:353). Sequence lengths
here are tiny (50/77 tokens) so attention is XLA-fused rather than a Pallas
kernel; the Pallas flash path in xclip_tpu/ops/flash_attention.py is used
when sequences are long enough to pay off.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from xclip_tpu.core import quant
from xclip_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class VisionTransformerCfg:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    act: str = "gelu"  # or quick_gelu
    pool_type: str = "tok"
    final_ln_after_pool: bool = False
    no_ln_pre: bool = False  # CLIPA-style towers skip the pre-LN
    ls_init_value: Optional[float] = None  # LayerScale init (None = off)
    attention_impl: str = "einsum"  # 'flash' for the Pallas kernel (long seqs)
    patch_dropout: float = 0.0  # fraction of patch tokens dropped in training
    attentional_pool: bool = False  # AttentionalPooler head (model.py:494-530)
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    # 'learnable' (default) or 'sin_cos_2d' — fixed MoCo-v3-style embedding
    # (reference transformer.py:466-476 + pos_embed.py; frozen in training
    # via train/optim.sincos_freeze_mask)
    pos_embed_type: str = "learnable"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class TextTransformerCfg:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    act: str = "gelu"
    pool_type: str = "argmax"
    no_causal_mask: bool = False
    ls_init_value: Optional[float] = None
    attention_impl: str = "einsum"
    # SigLIP-style text towers (reference transformer.py:661 TextTransformer):
    # biased output projection + LN eps from the config's norm_kwargs
    proj_bias: bool = False
    norm_eps: float = 1e-5


# ---------------------------------------------------------------------------
# residual attention block


def block_init(rng, width: int, heads: int, mlp_ratio: float, *, layers_for_init: int = 12,
               ls_init_value: Optional[float] = None):
    keys = jax.random.split(rng, 3)
    mlp_width = int(width * mlp_ratio)
    proj_std = (width**-0.5) * ((2 * layers_for_init) ** -0.5)
    fc_std = (2 * width) ** -0.5
    attn = L.mha_init(keys[0], width, num_heads=heads, std=width**-0.5)
    attn["out"]["kernel"] = jax.random.normal(keys[1], attn["out"]["kernel"].shape) * proj_std
    params = {
        "ln_1": L.layernorm_init(width),
        "attn": attn,
        "ln_2": L.layernorm_init(width),
        "mlp": {
            "c_fc": L.linear_init(keys[2], width, mlp_width, std=fc_std),
            "c_proj": L.linear_init(jax.random.fold_in(keys[2], 1), mlp_width, width, std=proj_std),
        },
    }
    if ls_init_value is not None:
        # LayerScale (reference transformer.py:89-99): per-channel learnable
        # gamma on each residual branch
        params["ls_1"] = jnp.full((width,), ls_init_value, jnp.float32)
        params["ls_2"] = jnp.full((width,), ls_init_value, jnp.float32)
    return params


def _ls(params, key, y):
    return y * params[key].astype(y.dtype) if key in params else y


def block_apply(params, x, *, heads: int, act: str, mask: Optional[jnp.ndarray] = None, dtype=None,
                attention_impl: str = "einsum", causal: bool = False, ln_eps: float = 1e-5):
    act_fn = L.ACT_FNS[act]
    y = L.layernorm_apply(params["ln_1"], x, eps=ln_eps)
    x = x + _ls(params, "ls_1", L.mha_apply(params["attn"], y, num_heads=heads, mask=mask,
                                            dtype=dtype, impl=attention_impl, causal=causal))
    y = L.layernorm_apply(params["ln_2"], x, eps=ln_eps)
    # --use-bnb-linear: SwitchBack int8 training matmuls, scoped like the
    # reference's replace_linear(include_modules=['c_fc','c_proj'])
    # (open_clip/utils.py:65); inference-mode int8 leaves dispatch inside
    # linear_apply itself
    if quant.switchback_enabled() and "kernel" in params["mlp"]["c_fc"]:
        y = quant.switchback_linear_apply(params["mlp"]["c_fc"], y, dtype=dtype)
        y = act_fn(y)
        y = quant.switchback_linear_apply(params["mlp"]["c_proj"], y, dtype=dtype)
    else:
        y = L.linear_apply(params["mlp"]["c_fc"], y, dtype=dtype)
        y = act_fn(y)
        y = L.linear_apply(params["mlp"]["c_proj"], y, dtype=dtype)
    return x + _ls(params, "ls_2", y)


def _run_blocks(
    blocks_params: List,
    x,
    *,
    heads: int,
    act: str,
    mask: Optional[jnp.ndarray],
    dtype,
    prefix: str,
    start: int,
    stop: int,
    capture: set,
    inters: Dict,
    remat: bool,
    attention_impl: str = "einsum",
    causal: bool = False,
    ln_eps: float = 1e-5,
):
    import os as _os

    from xclip_tpu.parallel import pp as _pp
    from xclip_tpu.parallel import sp as _sp

    sp_mesh = _sp.active()
    if (
        sp_mesh is not None
        and start == 0
        and stop == len(blocks_params)
        and not capture
    ):
        # full stack inside a sequence_context: tokens sharded over the
        # ('seq',) mesh, per-block K/V all_gather (parallel/sp.py)
        return _sp.sequence_blocks_apply(
            list(blocks_params), x, mesh=sp_mesh, heads=heads, act=act,
            causal=causal, mask=mask, dtype=dtype, ln_eps=ln_eps,
        )

    pp_ctx = _pp.active()
    if (
        pp_ctx is not None
        and start == 0
        and stop == len(blocks_params)
        and not capture
        and len(blocks_params) % pp_ctx[0].shape[_pp.PIPE_AXIS] == 0
        and x.shape[0] % pp_ctx[1] == 0
    ):
        # full homogeneous stack inside a pipeline_context: GPipe schedule
        # over the ('pipe',) mesh instead of the sequential loop
        pmesh, n_micro = pp_ctx
        stacked = _pp.stack_block_params(
            list(blocks_params), pmesh.shape[_pp.PIPE_AXIS])
        return _pp.pipeline_blocks_apply(
            stacked, x, mesh=pmesh, n_micro=n_micro, heads=heads, act=act,
            causal=causal, mask=mask, dtype=dtype, ln_eps=ln_eps,
            attention_impl=attention_impl,
        )

    for i in range(start, stop):
        fn = lambda p, inp: block_apply(p, inp, heads=heads, act=act, mask=mask, dtype=dtype,
                                        attention_impl=attention_impl, causal=causal,
                                        ln_eps=ln_eps)
        if remat:
            fn = jax.checkpoint(fn)
        elif _os.environ.get("XCLIP_BLOCK_REMAT_DOTS") == "1":
            # perf experiment: save only matmul outputs; elementwise chains
            # (GELU, LN, softmax scalings) are recomputed in the backward so
            # it reads fewer, larger fused tensors instead of many small
            # saved intermediates (targets the measured bwd ~4x fwd excess
            # on the text tower)
            fn = jax.checkpoint(
                fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        x = fn(blocks_params[i], x)
        name = f"{prefix}.{i}"
        if name in capture:
            inters[name] = x
    return x


# ---------------------------------------------------------------------------
# vision transformer


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False):
    """Fixed 2D sine-cosine positional embedding (MoCo v3 style).

    Value-identical to the reference's get_2d_sincos_pos_embed
    (deps/open_clip/src/open_clip/pos_embed.py:20-67): first half of the
    channels encode the row coordinate, second half the column, each as
    [sin | cos] over a 10000^(2i/d) frequency ladder; an optional all-zeros
    cls row is prepended.
    """
    import numpy as np

    assert embed_dim % 4 == 0, embed_dim
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_h, grid_h), axis=0)  # w first, then h

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=float) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb.astype(np.float32)


def vit_init(rng, cfg: VisionTransformerCfg):
    keys = jax.random.split(rng, 6)
    scale = cfg.width**-0.5
    if cfg.pos_embed_type == "learnable":
        pos = scale * jax.random.normal(keys[2], (cfg.seq_len, cfg.width), jnp.float32)
    elif cfg.pos_embed_type == "sin_cos_2d":
        # fixed embedding (reference transformer.py:469-476); excluded from
        # optimizer updates by train/optim.sincos_freeze_mask
        pos = jnp.asarray(get_2d_sincos_pos_embed(cfg.width, cfg.grid, cls_token=True))
    else:
        raise ValueError(cfg.pos_embed_type)
    params: Dict = {
        "conv1": L.conv_init(keys[0], 3, cfg.width, cfg.patch_size),
        "class_embedding": scale * jax.random.normal(keys[1], (cfg.width,), jnp.float32),
        "positional_embedding": pos,
        "blocks": [],
        "ln_post": L.layernorm_init(cfg.output_dim if cfg.attentional_pool else cfg.width),
        "proj": scale * jax.random.normal(
            keys[3],
            ((cfg.output_dim if cfg.attentional_pool else cfg.width), cfg.output_dim),
            jnp.float32,
        ),
    }
    if not cfg.no_ln_pre:
        params["ln_pre"] = L.layernorm_init(cfg.width)
    if cfg.attentional_pool:
        from xclip_tpu.models.coca import attn_pooler_init

        params["attn_pool"] = attn_pooler_init(
            keys[4], cfg.output_dim, cfg.width, cfg.attn_pooler_queries
        )
    for _ in range(cfg.layers):
        rng, sub = jax.random.split(rng)
        params["blocks"].append(
            block_init(sub, cfg.width, cfg.heads, cfg.mlp_ratio, layers_for_init=cfg.layers,
                       ls_init_value=cfg.ls_init_value)
        )
    return params


def vit_stage_names(cfg: VisionTransformerCfg) -> List[str]:
    return ["embed"] + [f"blocks.{i}" for i in range(cfg.layers)] + ["pool"]


def vit_apply(
    params,
    x,
    cfg: VisionTransformerCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    start: int = 0,
    stop: Optional[int] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Run ViT stages ``start:stop``; returns (out, intermediates)."""
    n_stages = cfg.layers + 2
    stop = n_stages if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    if start == 0:
        patches = L.conv_apply(params["conv1"], x, stride=cfg.patch_size, dtype=dtype)
        b = patches.shape[0]
        tokens = patches.reshape(b, cfg.grid * cfg.grid, cfg.width)
        cls = jnp.broadcast_to(params["class_embedding"].astype(tokens.dtype), (b, 1, cfg.width))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + params["positional_embedding"].astype(tokens.dtype)
        if train and cfg.patch_dropout > 0.0 and rng is None:
            raise ValueError(
                "patch_dropout > 0 in train mode requires an rng "
                "(thread one via model.forward(..., rng=...))"
            )
        if train and cfg.patch_dropout > 0.0 and rng is not None:
            # PatchDropout (reference transformer.py:49-86): keep a random
            # subset of patch tokens per sample, cls token always kept
            cls_tok, patches = tokens[:, :1], tokens[:, 1:]
            n_tokens = patches.shape[1]
            n_keep = max(1, int(n_tokens * (1.0 - cfg.patch_dropout)))
            scores = jax.random.normal(rng, (tokens.shape[0], n_tokens))
            keep = jnp.argsort(-scores, axis=-1)[:, :n_keep]
            patches = jnp.take_along_axis(patches, keep[..., None], axis=1)
            tokens = jnp.concatenate([cls_tok, patches], axis=1)
        x = tokens if cfg.no_ln_pre else L.layernorm_apply(params["ln_pre"], tokens)
        if "embed" in capture:
            inters["embed"] = x
        start = 1

    blk_start, blk_stop = max(start - 1, 0), min(stop - 1, cfg.layers)
    x = _run_blocks(
        params["blocks"], x, heads=cfg.heads, act=cfg.act, mask=None, dtype=dtype,
        prefix="blocks", start=blk_start, stop=blk_stop, capture=capture, inters=inters,
        remat=remat, attention_impl=cfg.attention_impl,
    )

    if stop == n_stages:
        if cfg.attentional_pool:
            # original OpenCLIP CoCa-style pooling (transformer.py:615-629):
            # attn_pool -> ln_post -> tok pooling -> proj
            from xclip_tpu.models.coca import attn_pooler_apply

            x = attn_pooler_apply(params["attn_pool"], x, heads=cfg.attn_pooler_heads, dtype=dtype)
            x = L.layernorm_apply(params["ln_post"], x)
            pooled = x[:, 0] if cfg.pool_type == "tok" else jnp.mean(x[:, 1:], axis=1)
            proj = params["proj"].astype(dtype) if dtype is not None else params["proj"]
            pooled = jnp.dot(pooled.astype(proj.dtype), proj, preferred_element_type=jnp.float32)
            if "pool" in capture:
                inters["pool"] = pooled
            return pooled, inters
        if cfg.final_ln_after_pool:
            pooled = x[:, 0] if cfg.pool_type == "tok" else jnp.mean(x[:, 1:], axis=1)
            pooled = L.layernorm_apply(params["ln_post"], pooled)
        else:
            x = L.layernorm_apply(params["ln_post"], x)
            pooled = x[:, 0] if cfg.pool_type == "tok" else jnp.mean(x[:, 1:], axis=1)
        proj = params["proj"].astype(dtype) if dtype is not None else params["proj"]
        pooled = jnp.dot(pooled.astype(proj.dtype), proj, preferred_element_type=jnp.float32)
        if "pool" in capture:
            inters["pool"] = pooled
        x = pooled
    return x, inters


# ---------------------------------------------------------------------------
# text transformer


def text_init(rng, cfg: TextTransformerCfg):
    keys = jax.random.split(rng, 4)
    params: Dict = {
        "token_embedding": 0.02 * jax.random.normal(keys[0], (cfg.vocab_size, cfg.width), jnp.float32),
        "positional_embedding": 0.01 * jax.random.normal(keys[1], (cfg.context_length, cfg.width), jnp.float32),
        "blocks": [],
        "ln_final": L.layernorm_init(cfg.width),
        "text_projection": (cfg.width**-0.5) * jax.random.normal(keys[2], (cfg.width, cfg.output_dim), jnp.float32),
    }
    if cfg.proj_bias:
        # reference TextTransformer with proj_bias=True: nn.Linear projection
        params["text_projection"] = {
            "kernel": params["text_projection"],
            "bias": jnp.zeros((cfg.output_dim,), jnp.float32),
        }
    for _ in range(cfg.layers):
        rng, sub = jax.random.split(rng)
        params["blocks"].append(
            block_init(sub, cfg.width, cfg.heads, cfg.mlp_ratio, layers_for_init=cfg.layers,
                       ls_init_value=cfg.ls_init_value)
        )
    return params


def text_global_pool(x, text_ids, pool_type: str = "argmax"):
    if pool_type == "argmax":
        # EOT token has the highest id in each sequence
        eot_idx = jnp.argmax(text_ids, axis=-1)
        return x[jnp.arange(x.shape[0]), eot_idx]
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    raise ValueError(pool_type)


def text_apply(
    params,
    text_ids,
    cfg: TextTransformerCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
):
    """Encode int token ids (B, L) -> (B, output_dim); returns (out, inters)."""
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}
    emb_dtype = dtype or params["token_embedding"].dtype
    x = params["token_embedding"][text_ids].astype(emb_dtype)
    x = x + params["positional_embedding"][: x.shape[1]].astype(emb_dtype)
    use_flash = cfg.attention_impl == "flash" and not cfg.no_causal_mask
    mask = None if (cfg.no_causal_mask or use_flash) else L.causal_mask(x.shape[1])
    if "embed" in capture:
        inters["embed"] = x
    x = _run_blocks(
        params["blocks"], x, heads=cfg.heads, act=cfg.act, mask=mask, dtype=dtype,
        prefix="blocks", start=0, stop=cfg.layers, capture=capture, inters=inters,
        remat=remat, attention_impl=cfg.attention_impl,
        causal=use_flash, ln_eps=cfg.norm_eps,
    )
    x = L.layernorm_apply(params["ln_final"], x, eps=cfg.norm_eps)
    pooled = text_global_pool(x, text_ids, cfg.pool_type)
    proj = params["text_projection"]
    bias = None
    if isinstance(proj, dict):
        proj, bias = proj["kernel"], proj["bias"]
    if dtype is not None:
        proj = proj.astype(dtype)
        pooled = pooled.astype(dtype)
    pooled = jnp.dot(pooled, proj, preferred_element_type=jnp.float32)
    if bias is not None:
        pooled = pooled + bias.astype(pooled.dtype)
    if "pool" in capture:
        inters["pool"] = pooled
    return pooled, inters
