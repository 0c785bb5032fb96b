"""Native JAX MobileCLIP-B vision tower — the reference's vit_base_mci_224.

The reference builds it through timm (deps/open_clip/src/open_clip/
timm_model.py:57-72): ``timm_pool='token'`` + ``timm_proj: null`` make the
trunk's classifier head (``visual.trunk.head`` Linear, num_classes=512) the
CLIP projection. timm is absent from this image, so this is a from-scratch
functional implementation of the timm ``vit_base_mci_224`` hybrid
(vision_transformer_hybrid.py; MobileCLIP, arXiv:2311.17049):

- MCi conv stem (``patch_embed.backbone``): 4x4/s4 conv -> BN+GELU ->
  2x2/s2 conv -> BN+GELU -> 2x2/s2 conv (bias, no norm) to 768ch — the
  16x patchify factored into three convs
- ViT-B body: class token; learned pos-embed over the PATCH tokens only
  (``no_embed_class=True`` — cls is prepended after the add); 12 pre-LN
  blocks (qkv bias, MLP ratio 4, GELU, LN eps 1e-6); final norm; token
  (cls) pooling; ``head`` Linear 768 -> embed_dim

BatchNorm makes this family STATEFUL (running mean/var live in the state
pytree; training uses per-device batch stats like the reference's
unsynced DDP BN). Checkpoints use the open_clip TimmModel naming
(``visual.trunk.*``). Numerics are pinned by an independent full-forward
numpy oracle (tests/oracles/np_mci.py via tests/test_tower_oracles.py:
valid-padding conv stem, no_embed_class pos-embed order, token pool) in
addition to the state-dict round-trip and committed goldens;
published-weight parity remains pending a timm-equipped environment
(TODO.md).
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
HAS_STATE = True

VARIANTS = {
    "vit_base_mci_224": dict(width=768, layers=12, heads=12,
                             stem_chs=(192, 384), stem_ks=(4, 2, 2),
                             stem_strides=(4, 2, 2)),
}


@dataclasses.dataclass(frozen=True)
class MciViTCfg:
    timm_name: str
    output_dim: int
    image_size: int = 224
    width: int = 768
    layers: int = 12
    heads: int = 12
    stem_chs: Tuple[int, int] = (192, 384)
    stem_ks: Tuple[int, int, int] = (4, 2, 2)
    stem_strides: Tuple[int, int, int] = (4, 2, 2)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0  # timm_drop_path (linear per-block ramp)

    @property
    def grid(self) -> int:
        s = 1
        for st in self.stem_strides:
            s *= st
        return self.image_size // s

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)

    # CLIPModel-facing shims
    @property
    def attentional_pool(self) -> bool:
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def mci_vit_cfg_from_vision_dict(v: dict, embed_dim: int) -> MciViTCfg:
    name = v["timm_model_name"]
    return MciViTCfg(timm_name=name, output_dim=embed_dim,
                     image_size=v.get("image_size", 224),
                     drop_path_rate=float(v.get("timm_drop_path") or 0.0),
                     **VARIANTS[name])


# ---------------------------------------------------------------------------
# init


from xclip_tpu.models.tower_common import linear_init as _lin_init
from xclip_tpu.models.tower_common import trunc_init as _trunc


def _block_init(rng, cfg: MciViTCfg) -> Dict:
    k = jax.random.split(rng, 4)
    d = cfg.width
    return {
        "norm1": L.layernorm_init(d),
        "attn": {"qkv": _lin_init(k[0], d, 3 * d), "proj": _lin_init(k[1], d, d)},
        "norm2": L.layernorm_init(d),
        "mlp": {"fc1": _lin_init(k[2], d, cfg.mlp_hidden),
                "fc2": _lin_init(k[3], cfg.mlp_hidden, d)},
    }


def mci_vit_init(rng, cfg: MciViTCfg) -> Tuple[Dict, Dict]:
    keys = jax.random.split(rng, 6)
    c1, c2 = cfg.stem_chs
    d = cfg.width
    k0, k1, k2 = cfg.stem_ks
    bn1_p, bn1_s = L.batchnorm_init(c1)
    bn2_p, bn2_s = L.batchnorm_init(c2)
    params: Dict = {
        "backbone": {
            "0": {"conv": {"kernel": _trunc(keys[0], (k0, k0, 3, c1))}, "bn": bn1_p},
            "1": {"conv": {"kernel": _trunc(keys[1], (k1, k1, c1, c2))}, "bn": bn2_p},
            "2": {"conv": {"kernel": _trunc(keys[2], (k2, k2, c2, d)),
                           "bias": jnp.zeros((d,), jnp.float32)}},
        },
        "cls_token": jnp.zeros((d,), jnp.float32),
        "pos_embed": _trunc(keys[3], (cfg.grid ** 2, d)),
        "blocks": [],
        "norm": L.layernorm_init(d),
        "head": _lin_init(keys[4], d, cfg.output_dim),
    }
    for _ in range(cfg.layers):
        rng, sub = jax.random.split(rng)
        params["blocks"].append(_block_init(sub, cfg))
    state = {"backbone": {"0": {"bn": bn1_s}, "1": {"bn": bn2_s}}}
    return params, state


# ---------------------------------------------------------------------------
# forward


def _drop_path(y, rate: float, train: bool, rng):
    if train and rate > 0.0 and rng is not None:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1))
        return y * (mask.astype(y.dtype) / keep)
    return y


def _block_apply(p, x, *, heads: int, dtype=None, drop_rate=0.0, train=False,
                 rng=None):
    y = L.layernorm_apply(p["norm1"], x, eps=LN_EPS)
    qkv = L.linear_apply(p["attn"]["qkv"], y, dtype=dtype)
    d = x.shape[-1]
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    o = L.attention(q, k, v, num_heads=heads)
    o = L.linear_apply(p["attn"]["proj"], o, dtype=dtype)
    x = x + _drop_path(o, drop_rate, train,
                       jax.random.fold_in(rng, 1) if rng is not None else None)
    y = L.layernorm_apply(p["norm2"], x, eps=LN_EPS)
    y = L.linear_apply(p["mlp"]["fc1"], y, dtype=dtype)
    y = L.gelu(y)
    y = L.linear_apply(p["mlp"]["fc2"], y, dtype=dtype)
    return x + _drop_path(y, drop_rate, train,
                          jax.random.fold_in(rng, 2) if rng is not None else None)


def mci_vit_stage_names(cfg: MciViTCfg) -> List[str]:
    return ["embed"] + [f"blocks.{i}" for i in range(cfg.layers)] + ["pool"]


def mci_vit_apply(
    params,
    state,
    x,
    cfg: MciViTCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    stop: Optional[int] = None,
):
    """NHWC images -> (features (B, output_dim), new_state, intermediates)."""
    n_stages = cfg.layers + 2
    stop = n_stages if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    bb = params["backbone"]
    sbb = state["backbone"]
    new_state = {"backbone": {}}
    y = L.conv_apply(bb["0"]["conv"], x, stride=cfg.stem_strides[0], dtype=dtype)
    y, bn0 = L.batchnorm_apply(bb["0"]["bn"], sbb["0"]["bn"], y, train=train)
    y = L.gelu(y)
    y = L.conv_apply(bb["1"]["conv"], y, stride=cfg.stem_strides[1], dtype=dtype)
    y, bn1 = L.batchnorm_apply(bb["1"]["bn"], sbb["1"]["bn"], y, train=train)
    y = L.gelu(y)
    y = L.conv_apply(bb["2"]["conv"], y, stride=cfg.stem_strides[2], dtype=dtype)
    new_state["backbone"] = {"0": {"bn": bn0}, "1": {"bn": bn1}}

    b = y.shape[0]
    tokens = y.reshape(b, cfg.grid * cfg.grid, cfg.width)
    # no_embed_class: pos-embed on patch tokens, cls prepended afterwards
    tokens = tokens + params["pos_embed"].astype(tokens.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, cfg.width))
    xx = jnp.concatenate([cls, tokens], axis=1)
    if "embed" in capture:
        inters["embed"] = xx

    rates = (np.linspace(0.0, cfg.drop_path_rate, cfg.layers)
             if cfg.layers > 1 else [0.0])
    for i, bp in enumerate(params["blocks"]):
        if 1 + i >= stop:
            return xx, new_state, inters
        block_rng = (jax.random.fold_in(rng, i)
                     if (rng is not None and train and cfg.drop_path_rate > 0)
                     else None)
        rate = float(rates[i])
        fn = lambda p, inp: _block_apply(p, inp, heads=cfg.heads, dtype=dtype,
                                         drop_rate=rate, train=train, rng=block_rng)
        if remat:
            fn = jax.checkpoint(fn)
        xx = fn(bp, xx)
        if f"blocks.{i}" in capture:
            inters[f"blocks.{i}"] = xx

    if stop < n_stages:
        return xx, new_state, inters
    xx = L.layernorm_apply(params["norm"], xx, eps=LN_EPS)
    pooled = xx[:, 0].astype(jnp.float32)  # timm_pool='token'
    out = L.linear_apply(params["head"], pooled)  # trunk classifier == proj
    if "pool" in capture:
        inters["pool"] = out
    return out, new_state, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge (visual.trunk.*; BN stats included)


def mci_vit_pytrees_to_state_dict(params, state, cfg: MciViTCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    put_ln = functools.partial(C.write_ln, sd)
    put_lin = functools.partial(C.write_linear, sd)

    for i in ("0", "1", "2"):
        cp = params["backbone"][i]["conv"]
        sd[f"trunk.patch_embed.backbone.{i}.conv.weight"] = np.transpose(
            np.asarray(cp["kernel"]), (3, 2, 0, 1))
        if "bias" in cp:
            sd[f"trunk.patch_embed.backbone.{i}.conv.bias"] = np.asarray(cp["bias"])
    for i in ("0", "1"):
        base = f"trunk.patch_embed.backbone.{i}.bn"
        put_ln(base, params["backbone"][i]["bn"])
        sd[f"{base}.running_mean"] = np.asarray(state["backbone"][i]["bn"]["mean"])
        sd[f"{base}.running_var"] = np.asarray(state["backbone"][i]["bn"]["var"])
        sd[f"{base}.num_batches_tracked"] = np.asarray(0, np.int64)
    sd["trunk.cls_token"] = np.asarray(params["cls_token"])[None, None]
    sd["trunk.pos_embed"] = np.asarray(params["pos_embed"])[None]
    for i, bp in enumerate(params["blocks"]):
        base = f"trunk.blocks.{i}"
        put_ln(f"{base}.norm1", bp["norm1"])
        put_lin(f"{base}.attn.qkv", bp["attn"]["qkv"])
        put_lin(f"{base}.attn.proj", bp["attn"]["proj"])
        put_ln(f"{base}.norm2", bp["norm2"])
        put_lin(f"{base}.mlp.fc1", bp["mlp"]["fc1"])
        put_lin(f"{base}.mlp.fc2", bp["mlp"]["fc2"])
    put_ln("trunk.norm", params["norm"])
    put_lin("trunk.head", params["head"])
    return sd


def mci_vit_state_dict_to_pytrees(sd: Dict[str, np.ndarray], cfg: MciViTCfg) -> Tuple[Dict, Dict]:
    ln = functools.partial(C.read_ln, sd)
    lin = functools.partial(C.read_linear, sd)
    conv = functools.partial(C.read_conv, sd)

    bb = "trunk.patch_embed.backbone"
    params: Dict = {
        "backbone": {
            "0": {"conv": conv(f"{bb}.0.conv"), "bn": ln(f"{bb}.0.bn")},
            "1": {"conv": conv(f"{bb}.1.conv"), "bn": ln(f"{bb}.1.bn")},
            "2": {"conv": conv(f"{bb}.2.conv")},
        },
        "cls_token": jnp.asarray(np.asarray(sd["trunk.cls_token"]).reshape(-1)),
        "pos_embed": jnp.asarray(np.asarray(sd["trunk.pos_embed"])[0]),
        "blocks": [],
        "norm": ln("trunk.norm"),
        "head": lin("trunk.head"),
    }
    state = {"backbone": {
        i: {"bn": {"mean": jnp.asarray(np.asarray(sd[f"{bb}.{i}.bn.running_mean"])),
                   "var": jnp.asarray(np.asarray(sd[f"{bb}.{i}.bn.running_var"]))}}
        for i in ("0", "1")
    }}
    for i in range(cfg.layers):
        base = f"trunk.blocks.{i}"
        params["blocks"].append({
            "norm1": ln(f"{base}.norm1"),
            "attn": {"qkv": lin(f"{base}.attn.qkv"), "proj": lin(f"{base}.attn.proj")},
            "norm2": ln(f"{base}.norm2"),
            "mlp": {"fc1": lin(f"{base}.mlp.fc1"), "fc2": lin(f"{base}.mlp.fc2")},
        })
    return params, state
