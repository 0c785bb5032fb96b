"""Native JAX EVA vision towers — the reference's EVA01/EVA02 configs.

The reference builds these through timm (deps/open_clip/src/open_clip/
timm_model.py:57-72): the EVA configs use ``timm_pool='token'`` with
``timm_proj: null``, so the timm trunk is created with
``num_classes=embed_dim`` and the trunk's own classifier head
(``visual.trunk.head`` Linear, bias=True) IS the CLIP projection; the
open_clip head is empty.

timm is absent from this image, so this is a from-scratch functional
implementation of the timm ``Eva`` architecture (eva.py; EVA-01
arXiv:2211.07636, EVA-02 arXiv:2303.11331):

- EVA01 (``eva_giant_patch14_224``): plain pre-LN ViT with the BEiT-style
  fused qkv (bias-free qkv matmul + separate q_bias/v_bias parameters and
  an implicit zero k bias), GELU MLP, abs pos embed, class token.
- EVA02 (``eva02_{base,large}_patch1x_clip_*``): separate q/k/v projections
  (k bias-free), 2D axial rotary position embedding on q/k (cls token
  excluded; timm RotaryEmbeddingCat with ref_feat_shape scaling) on top of
  the abs pos embed, and a SwiGLU MLP with an inner LayerNorm
  (``mlp.fc1_g/fc1_x/norm/fc2``, hidden = int(dim * 4*2/3)).
- EVA02-E (``eva02_enormous_patch14_clip_224``): fused-qkv, plain MLP
  (ratio 15360/1792), post-norm blocks (sublayer output normed before the
  residual add).

Checkpoints use the open_clip TimmModel naming (``visual.trunk.*``), so
published EVA CLIP weights load once available. Numerics are pinned by an
independent full-forward numpy oracle (tests/oracles/np_eva.py via
tests/test_tower_oracles.py: all three variants incl. the RoPE band
layout, qkv bias packing and post-norm residuals) in addition to the
state-dict round-trip and committed goldens; published-weight parity
remains pending a timm-equipped environment (TODO.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import layers as L
from xclip_tpu.models import tower_common as C

LN_EPS = 1e-6

# timm Eva variant table (eva.py model entrypoints)
VARIANTS = {
    "eva_giant_patch14_224": dict(
        patch_size=14, width=1408, layers=40, heads=16, mlp_ratio=6144 / 1408,
        qkv_fused=True, swiglu=False, rope=False),
    "eva02_base_patch16_clip_224": dict(
        patch_size=16, width=768, layers=12, heads=12, mlp_ratio=4 * 2 / 3,
        qkv_fused=False, swiglu=True, rope=True, ref_grid=16),
    "eva02_large_patch14_clip_224": dict(
        patch_size=14, width=1024, layers=24, heads=16, mlp_ratio=4 * 2 / 3,
        qkv_fused=False, swiglu=True, rope=True, ref_grid=16),
    "eva02_large_patch14_clip_336": dict(
        patch_size=14, width=1024, layers=24, heads=16, mlp_ratio=4 * 2 / 3,
        qkv_fused=False, swiglu=True, rope=True, ref_grid=16),
    "eva02_enormous_patch14_clip_224": dict(
        patch_size=14, width=1792, layers=64, heads=16, mlp_ratio=15360 / 1792,
        qkv_fused=True, swiglu=False, rope=False, post_norm=True),
}


@dataclasses.dataclass(frozen=True)
class EvaCfg:
    timm_name: str
    output_dim: int
    image_size: int = 224
    patch_size: int = 14
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    qkv_fused: bool = True
    swiglu: bool = False
    rope: bool = False
    ref_grid: int = 16  # RoPE ref_feat_shape side (224-res grid)
    post_norm: bool = False
    init_values: Optional[float] = None

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1  # class token always present

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    # CLIPModel-facing shims
    @property
    def attentional_pool(self) -> bool:
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def eva_cfg_from_vision_dict(v: dict, embed_dim: int) -> EvaCfg:
    name = v["timm_model_name"]
    return EvaCfg(timm_name=name, output_dim=embed_dim,
                  image_size=v.get("image_size", 224), **VARIANTS[name])


# ---------------------------------------------------------------------------
# 2D axial rotary embedding (timm pos_embed_sincos.py RotaryEmbeddingCat,
# in_pixels=False; positions rescaled by ref_feat_shape/feat_shape)


@functools.lru_cache(maxsize=8)
def _rope_tables(grid: int, ref_grid: int, head_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """(sin, cos) tables of shape (grid², head_dim) for 2D axial RoPE:
    head_dim/4 frequency bands per spatial axis; each band's angle is
    duplicated over an adjacent pair of channels (rotate-pairs layout)."""
    n_bands = head_dim // 4
    bands = np.arange(n_bands, dtype=np.float64) / n_bands
    inv_freq = 1.0 / (10000.0 ** bands)  # (n_bands,)
    # positions scaled into the reference grid (ref_feat_shape)
    pos = (np.arange(grid, dtype=np.float64) / max(grid, 1)) * ref_grid
    ang = np.outer(pos, inv_freq)  # (grid, n_bands)
    yy, xx = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    ang_y = ang[yy.reshape(-1)]  # (N, n_bands)
    ang_x = ang[xx.reshape(-1)]
    angles = np.concatenate([ang_y, ang_x], axis=-1)  # (N, head_dim/2)
    angles = np.repeat(angles, 2, axis=-1)  # adjacent-pair duplication
    return np.sin(angles).astype(np.float32), np.cos(angles).astype(np.float32)


def _rotate_pairs(x):
    """(-x2, x1, -x4, x3, ...) over the last axis (timm eva.py ``rot``)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(x, sin, cos, heads: int):
    """Rotate patch tokens of (B, 1+N, D); the class token passes through."""
    b, s, d = x.shape
    hd = d // heads
    cls, tok = x[:, :1], x[:, 1:]
    t = tok.reshape(b, s - 1, heads, hd)
    sin = sin[None, :, None, :].astype(t.dtype)
    cos = cos[None, :, None, :].astype(t.dtype)
    t = t * cos + _rotate_pairs(t) * sin
    return jnp.concatenate([cls, t.reshape(b, s - 1, d)], axis=1)


# ---------------------------------------------------------------------------
# init


from xclip_tpu.models.tower_common import linear_init as _lin_init
from xclip_tpu.models.tower_common import trunc_init as _trunc


def _block_init(rng, cfg: EvaCfg) -> Dict:
    k = jax.random.split(rng, 8)
    d = cfg.width
    if cfg.qkv_fused:
        # BEiT-style: bias-free fused qkv matmul + explicit q/v bias vectors
        attn = {
            "qkv": {"kernel": _trunc(k[0], (d, 3 * d))},
            "q_bias": jnp.zeros((d,), jnp.float32),
            "v_bias": jnp.zeros((d,), jnp.float32),
            "proj": _lin_init(k[1], d, d),
        }
    else:
        attn = {
            "q_proj": _lin_init(k[0], d, d),
            "k_proj": _lin_init(jax.random.fold_in(k[0], 1), d, d, bias=False),
            "v_proj": _lin_init(jax.random.fold_in(k[0], 2), d, d),
            "proj": _lin_init(k[1], d, d),
        }
    blk: Dict = {"norm1": L.layernorm_init(d), "attn": attn,
                 "norm2": L.layernorm_init(d)}
    if cfg.swiglu:
        blk["mlp"] = {
            "fc1_g": _lin_init(k[2], d, cfg.mlp_hidden),
            "fc1_x": _lin_init(k[3], d, cfg.mlp_hidden),
            "norm": L.layernorm_init(cfg.mlp_hidden),
            "fc2": _lin_init(k[4], cfg.mlp_hidden, d),
        }
    else:
        blk["mlp"] = {
            "fc1": _lin_init(k[2], d, cfg.mlp_hidden),
            "fc2": _lin_init(k[3], cfg.mlp_hidden, d),
        }
    if cfg.init_values is not None:
        blk["gamma_1"] = jnp.full((d,), cfg.init_values, jnp.float32)
        blk["gamma_2"] = jnp.full((d,), cfg.init_values, jnp.float32)
    return blk


def eva_init(rng, cfg: EvaCfg) -> Dict:
    keys = jax.random.split(rng, 4)
    d = cfg.width
    params: Dict = {
        "patch_embed": {"kernel": _trunc(keys[0], (cfg.patch_size, cfg.patch_size, 3, d)),
                        "bias": jnp.zeros((d,), jnp.float32)},
        "cls_token": jnp.zeros((d,), jnp.float32),
        "pos_embed": _trunc(keys[1], (cfg.seq_len, d)),
        "blocks": [],
        "norm": L.layernorm_init(d),
        "head": _lin_init(keys[2], d, cfg.output_dim),
    }
    for _ in range(cfg.layers):
        rng, sub = jax.random.split(rng)
        params["blocks"].append(_block_init(sub, cfg))
    return params


# ---------------------------------------------------------------------------
# forward


def _attn_apply(p, x, cfg: EvaCfg, rope_tabs, *, dtype=None):
    d = cfg.width
    if cfg.qkv_fused:
        qkv_bias = jnp.concatenate([
            p["q_bias"], jnp.zeros_like(p["q_bias"]), p["v_bias"]])
        qkv = L.linear_apply({"kernel": p["qkv"]["kernel"], "bias": qkv_bias},
                             x, dtype=dtype)
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    else:
        q = L.linear_apply(p["q_proj"], x, dtype=dtype)
        k = L.linear_apply(p["k_proj"], x, dtype=dtype)
        v = L.linear_apply(p["v_proj"], x, dtype=dtype)
    if rope_tabs is not None:
        sin, cos = rope_tabs
        q = _apply_rope(q, sin, cos, cfg.heads)
        k = _apply_rope(k, sin, cos, cfg.heads)
    o = L.attention(q, k, v, num_heads=cfg.heads)
    return L.linear_apply(p["proj"], o, dtype=dtype)


def _mlp_apply(p, x, cfg: EvaCfg, *, dtype=None):
    if cfg.swiglu:
        g = L.linear_apply(p["fc1_g"], x, dtype=dtype)
        h = L.linear_apply(p["fc1_x"], x, dtype=dtype)
        y = jax.nn.silu(g) * h
        y = L.layernorm_apply(p["norm"], y, eps=LN_EPS)
        return L.linear_apply(p["fc2"], y, dtype=dtype)
    y = L.linear_apply(p["fc1"], x, dtype=dtype)
    y = L.gelu(y)
    return L.linear_apply(p["fc2"], y, dtype=dtype)


def _block_apply(p, x, cfg: EvaCfg, rope_tabs, *, dtype=None):
    if cfg.post_norm:
        # EvaBlockPostNorm: residual add of the *normed* sublayer output
        y = _attn_apply(p["attn"], x, cfg, rope_tabs, dtype=dtype)
        x = x + _gamma(p, "gamma_1", L.layernorm_apply(p["norm1"], y, eps=LN_EPS))
        y = _mlp_apply(p["mlp"], x, cfg, dtype=dtype)
        return x + _gamma(p, "gamma_2", L.layernorm_apply(p["norm2"], y, eps=LN_EPS))
    y = L.layernorm_apply(p["norm1"], x, eps=LN_EPS)
    x = x + _gamma(p, "gamma_1", _attn_apply(p["attn"], y, cfg, rope_tabs, dtype=dtype))
    y = L.layernorm_apply(p["norm2"], x, eps=LN_EPS)
    return x + _gamma(p, "gamma_2", _mlp_apply(p["mlp"], y, cfg, dtype=dtype))


def _gamma(p, key, y):
    return y * p[key].astype(y.dtype) if key in p else y


def eva_stage_names(cfg: EvaCfg) -> List[str]:
    return ["embed"] + [f"blocks.{i}" for i in range(cfg.layers)] + ["pool"]


def eva_apply(
    params,
    x,
    cfg: EvaCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    stop: Optional[int] = None,
):
    """NHWC images -> (features (B, output_dim), intermediates)."""
    del train, rng
    n_stages = cfg.layers + 2
    stop = n_stages if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    patches = L.conv_apply(params["patch_embed"], x, stride=cfg.patch_size, dtype=dtype)
    b = patches.shape[0]
    tokens = patches.reshape(b, cfg.grid * cfg.grid, cfg.width)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, cfg.width))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    x = tokens + params["pos_embed"].astype(tokens.dtype)
    if "embed" in capture:
        inters["embed"] = x

    rope_tabs = None
    if cfg.rope:
        sin, cos = _rope_tables(cfg.grid, cfg.ref_grid, cfg.head_dim)
        rope_tabs = (jnp.asarray(sin), jnp.asarray(cos))

    for i, bp in enumerate(params["blocks"]):
        if 1 + i >= stop:
            return x, inters
        fn = lambda p, inp: _block_apply(p, inp, cfg, rope_tabs, dtype=dtype)
        if remat:
            fn = jax.checkpoint(fn)
        x = fn(bp, x)
        name = f"blocks.{i}"
        if name in capture:
            inters[name] = x

    if stop < n_stages:
        return x, inters
    x = L.layernorm_apply(params["norm"], x, eps=LN_EPS)
    pooled = x[:, 0].astype(jnp.float32)  # timm_pool='token'
    out = L.linear_apply(params["head"], pooled)  # trunk classifier == proj
    if "pool" in capture:
        inters["pool"] = out
    return out, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge (visual.trunk.*; empty head)


def eva_params_to_state_dict(params, cfg: EvaCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    put_ln = functools.partial(C.write_ln, sd)
    put_lin = functools.partial(C.write_linear, sd)

    sd["trunk.patch_embed.proj.weight"] = np.transpose(
        np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1))
    sd["trunk.patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    sd["trunk.cls_token"] = np.asarray(params["cls_token"])[None, None]
    sd["trunk.pos_embed"] = np.asarray(params["pos_embed"])[None]
    for i, bp in enumerate(params["blocks"]):
        base = f"trunk.blocks.{i}"
        put_ln(f"{base}.norm1", bp["norm1"])
        a = bp["attn"]
        if cfg.qkv_fused:
            sd[f"{base}.attn.qkv.weight"] = np.asarray(a["qkv"]["kernel"]).T
            sd[f"{base}.attn.q_bias"] = np.asarray(a["q_bias"])
            sd[f"{base}.attn.v_bias"] = np.asarray(a["v_bias"])
        else:
            put_lin(f"{base}.attn.q_proj", a["q_proj"])
            put_lin(f"{base}.attn.k_proj", a["k_proj"])
            put_lin(f"{base}.attn.v_proj", a["v_proj"])
        put_lin(f"{base}.attn.proj", a["proj"])
        put_ln(f"{base}.norm2", bp["norm2"])
        if cfg.swiglu:
            put_lin(f"{base}.mlp.fc1_g", bp["mlp"]["fc1_g"])
            put_lin(f"{base}.mlp.fc1_x", bp["mlp"]["fc1_x"])
            put_ln(f"{base}.mlp.norm", bp["mlp"]["norm"])
            put_lin(f"{base}.mlp.fc2", bp["mlp"]["fc2"])
        else:
            put_lin(f"{base}.mlp.fc1", bp["mlp"]["fc1"])
            put_lin(f"{base}.mlp.fc2", bp["mlp"]["fc2"])
        if "gamma_1" in bp:
            sd[f"{base}.gamma_1"] = np.asarray(bp["gamma_1"])
            sd[f"{base}.gamma_2"] = np.asarray(bp["gamma_2"])
    put_ln("trunk.norm", params["norm"])
    put_lin("trunk.head", params["head"])
    return sd


def eva_state_dict_to_params(sd: Dict[str, np.ndarray], cfg: EvaCfg) -> Dict:
    ln = functools.partial(C.read_ln, sd)
    lin = functools.partial(C.read_linear, sd)

    params: Dict = {
        "patch_embed": {
            "kernel": jnp.asarray(np.transpose(
                np.asarray(sd["trunk.patch_embed.proj.weight"]), (2, 3, 1, 0))),
            "bias": jnp.asarray(np.asarray(sd["trunk.patch_embed.proj.bias"])),
        },
        "cls_token": jnp.asarray(np.asarray(sd["trunk.cls_token"]).reshape(-1)),
        "pos_embed": jnp.asarray(np.asarray(sd["trunk.pos_embed"])[0]),
        "blocks": [],
        "norm": ln("trunk.norm"),
        "head": lin("trunk.head"),
    }
    for i in range(cfg.layers):
        base = f"trunk.blocks.{i}"
        if cfg.qkv_fused:
            attn = {
                "qkv": {"kernel": jnp.asarray(np.asarray(sd[f"{base}.attn.qkv.weight"]).T)},
                "q_bias": jnp.asarray(np.asarray(sd[f"{base}.attn.q_bias"])),
                "v_bias": jnp.asarray(np.asarray(sd[f"{base}.attn.v_bias"])),
                "proj": lin(f"{base}.attn.proj"),
            }
        else:
            attn = {"q_proj": lin(f"{base}.attn.q_proj"),
                    "k_proj": lin(f"{base}.attn.k_proj"),
                    "v_proj": lin(f"{base}.attn.v_proj"),
                    "proj": lin(f"{base}.attn.proj")}
        blk: Dict = {"norm1": ln(f"{base}.norm1"), "attn": attn,
                     "norm2": ln(f"{base}.norm2")}
        if cfg.swiglu:
            blk["mlp"] = {"fc1_g": lin(f"{base}.mlp.fc1_g"),
                          "fc1_x": lin(f"{base}.mlp.fc1_x"),
                          "norm": ln(f"{base}.mlp.norm"),
                          "fc2": lin(f"{base}.mlp.fc2")}
        else:
            blk["mlp"] = {"fc1": lin(f"{base}.mlp.fc1"), "fc2": lin(f"{base}.mlp.fc2")}
        if f"{base}.gamma_1" in sd:
            blk["gamma_1"] = jnp.asarray(np.asarray(sd[f"{base}.gamma_1"]))
            blk["gamma_2"] = jnp.asarray(np.asarray(sd[f"{base}.gamma_2"]))
        params["blocks"].append(blk)
    return params
