"""Native JAX ViTamin vision towers — the reference's ViTamin-* configs.

The reference builds these through timm (deps/open_clip/src/open_clip/
timm_model.py:73-104: trunk with default avg pooling, classifier reset,
bias-free ``head.proj`` Linear). timm is absent from this image, so this is
a from-scratch functional implementation of the timm ``vitamin.py``
architecture (Chen et al., "ViTamin: Designing Scalable Vision Models in
the Vision-Language Era", arXiv:2404.02132; the timm version wraps the
3-stage hybrid in ``VisionTransformer`` via a HybridEmbed backbone):

- stem (1/2 res): 3x3/s2 conv -> LayerNorm+GELU -> 3x3 conv
- stages 1-2 (1/4, 1/8): MBConv-LN blocks — pre-LN, 1x1 expand (ratio 4),
  GELU, 3x3 depthwise (stride 2 on each stage's first block), GELU, 1x1
  project; stride-2 shortcut = 3x3/s2 avg-pool (count_include_pad=False)
  + 1x1 expand conv
- stage-3 entry (1/16): LayerNorm -> 3x3/s2 conv patchify (``pool``)
- ViT stage: learned abs pos-embed (no class token), pre-LN blocks with
  qkv-bias MHSA and a GeGLU MLP (ratio 2) that carries its own leading
  LayerNorm (``mlp.norm`` — on top of the block's norm2, as in the
  original code); global avg pool then ``fc_norm`` (the timm
  global_pool='avg' head layout: trunk ``norm`` is Identity)

The pos-embed is stored at the timm variant's native grid and resampled
bicubically when the runtime grid differs (timm dynamic-size behavior; the
reference's ViTamin-XL-384 config feeds 256px into the 384-native trunk).

Checkpoints use the open_clip TimmModel naming
(``visual.trunk.patch_embed.backbone.*`` + ``visual.trunk.blocks.*`` +
``visual.head.proj``). Numerics are pinned by an independent full-forward
numpy oracle (tests/oracles/np_vitamin.py via tests/test_tower_oracles.py:
stem + MBConv stages incl. the count_include_pad=False shortcut pool +
GeGLU ViT + head) in addition to the state-dict round-trip and committed
goldens; published-weight parity remains pending a timm-equipped
environment (TODO.md).
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

# timm vitamin variant table (stem/MBConv dims, ViT dim/depth/heads, native
# image size), timm/models/vitamin.py model entrypoints
VARIANTS = {
    "vitamin_small_224": dict(mb_dims=(64, 128), vit_dim=384, vit_depth=14,
                              heads=6, native_size=224),
    "vitamin_base_224": dict(mb_dims=(128, 256), vit_dim=768, vit_depth=14,
                             heads=12, native_size=224),
    "vitamin_large_224": dict(mb_dims=(160, 320), vit_dim=1024, vit_depth=31,
                              heads=16, native_size=224),
    "vitamin_large_256": dict(mb_dims=(160, 320), vit_dim=1024, vit_depth=31,
                              heads=16, native_size=256),
    "vitamin_large_336": dict(mb_dims=(160, 320), vit_dim=1024, vit_depth=31,
                              heads=16, native_size=336),
    "vitamin_large2_224": dict(mb_dims=(160, 320), vit_dim=1024, vit_depth=31,
                               heads=16, native_size=224),
    "vitamin_large2_256": dict(mb_dims=(160, 320), vit_dim=1024, vit_depth=31,
                               heads=16, native_size=256),
    "vitamin_large2_336": dict(mb_dims=(160, 320), vit_dim=1024, vit_depth=31,
                               heads=16, native_size=336),
    "vitamin_xlarge_256": dict(mb_dims=(192, 384), vit_dim=1152, vit_depth=32,
                               heads=16, native_size=256),
    "vitamin_xlarge_336": dict(mb_dims=(192, 384), vit_dim=1152, vit_depth=32,
                               heads=16, native_size=336),
    "vitamin_xlarge_384": dict(mb_dims=(192, 384), vit_dim=1152, vit_depth=32,
                               heads=16, native_size=384),
}

MB_DEPTHS = (2, 4)  # fixed across all ViTamin sizes (paper Table 1)
EXPAND = 4


@dataclasses.dataclass(frozen=True)
class ViTaminCfg:
    timm_name: str
    output_dim: int
    image_size: int = 224
    native_size: int = 224
    mb_dims: Tuple[int, int] = (64, 128)
    vit_dim: int = 384
    vit_depth: int = 14
    heads: int = 6
    mlp_ratio: float = 2.0  # GeGLU hidden = ratio * dim
    proj: str = "linear"  # timm_proj
    drop_path_rate: float = 0.0

    @property
    def width(self) -> int:
        return self.vit_dim

    @property
    def grid(self) -> int:  # runtime token grid (1/16 of input)
        return self.image_size // 16

    @property
    def native_grid(self) -> int:  # pos_embed storage grid
        return self.native_size // 16

    @property
    def mlp_hidden(self) -> int:
        return int(self.vit_dim * self.mlp_ratio)

    # CLIPModel-facing shims
    @property
    def attentional_pool(self) -> bool:
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def vitamin_cfg_from_vision_dict(v: dict, embed_dim: int) -> ViTaminCfg:
    name = v["timm_model_name"]
    return ViTaminCfg(timm_name=name, output_dim=embed_dim,
                      image_size=v.get("image_size", 224),
                      proj=v.get("timm_proj", "linear") or "none",
                      drop_path_rate=float(v.get("timm_drop_path") or 0.0),
                      **VARIANTS[name])


# ---------------------------------------------------------------------------
# init


from xclip_tpu.models.tower_common import linear_init as _lin_init
from xclip_tpu.models.tower_common import trunc_init as _trunc


def _conv_init(rng, kh, kw, cin, cout, *, groups=1):
    return {"kernel": _trunc(rng, (kh, kw, cin // groups, cout)),
            "bias": jnp.zeros((cout,), jnp.float32)}


def _mbconv_init(rng, cin: int, cout: int, stride: int) -> Dict:
    k = jax.random.split(rng, 4)
    mid = EXPAND * cout
    p: Dict = {
        "pre_norm": L.layernorm_init(cin),
        "conv1_1x1": _conv_init(k[0], 1, 1, cin, mid),
        "conv2_kxk": _conv_init(k[1], 3, 3, mid, mid, groups=mid),
        "conv3_1x1": _conv_init(k[2], 1, 1, mid, cout),
    }
    if stride == 2:
        p["shortcut"] = {"expand": _conv_init(k[3], 1, 1, cin, cout)}
    elif cin != cout:
        p["shortcut"] = _conv_init(k[3], 1, 1, cin, cout)
    return p


def _vit_block_init(rng, cfg: ViTaminCfg) -> Dict:
    k = jax.random.split(rng, 6)
    d, h = cfg.vit_dim, cfg.mlp_hidden
    return {
        "norm1": L.layernorm_init(d),
        "attn": {"qkv": _lin_init(k[0], d, 3 * d), "proj": _lin_init(k[1], d, d)},
        "norm2": L.layernorm_init(d),
        "mlp": {"norm": L.layernorm_init(d),
                "w0": _lin_init(k[2], d, h), "w1": _lin_init(k[3], d, h),
                "w2": _lin_init(k[4], h, d)},
    }


def vitamin_init(rng, cfg: ViTaminCfg) -> Dict:
    keys = jax.random.split(rng, 6)
    c1, c2 = cfg.mb_dims
    params: Dict = {
        "backbone": {
            "stem": {"conv1": _conv_init(keys[0], 3, 3, 3, c1),
                     "norm1": L.layernorm_init(c1),
                     "conv2": _conv_init(keys[1], 3, 3, c1, c1)},
            "stages": [],
            "pool": {"norm": L.layernorm_init(c2),
                     "proj": _conv_init(keys[2], 3, 3, c2, cfg.vit_dim)},
        },
        "pos_embed": _trunc(keys[3], (cfg.native_grid ** 2, cfg.vit_dim)),
        "blocks": [],
        "fc_norm": L.layernorm_init(cfg.vit_dim),
    }
    dims = (c1, c1, c2)  # stage s: in dims[s], out dims[s+1]
    for s in range(2):
        blocks = []
        for b in range(MB_DEPTHS[s]):
            rng, sub = jax.random.split(rng)
            cin = dims[s] if b == 0 else dims[s + 1]
            blocks.append(_mbconv_init(sub, cin, dims[s + 1], 2 if b == 0 else 1))
        params["backbone"]["stages"].append(blocks)
    for _ in range(cfg.vit_depth):
        rng, sub = jax.random.split(rng)
        params["blocks"].append(_vit_block_init(sub, cfg))
    if cfg.proj == "linear":
        params["head"] = {"proj": _lin_init(keys[4], cfg.vit_dim, cfg.output_dim, bias=False)}
    return params


# ---------------------------------------------------------------------------
# forward


def _conv(p, x, *, stride=1, padding=0, groups=1, dtype=None):
    kernel = p["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
    )
    return y + p["bias"].astype(y.dtype)


def _avgpool_3x3s2(x):
    """AvgPool2d(3, stride 2, padding 1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sums / cnts


def _mbconv_apply(p, x, *, stride: int, dtype=None, drop_rate=0.0,
                  train=False, rng=None):
    if "shortcut" not in p:
        shortcut = x
    elif "expand" in p["shortcut"]:
        shortcut = _conv(p["shortcut"]["expand"], _avgpool_3x3s2(x), dtype=dtype)
    else:
        shortcut = _conv(p["shortcut"], x, dtype=dtype)
    y = L.layernorm_apply(p["pre_norm"], x, eps=LN_EPS)
    y = _conv(p["conv1_1x1"], y, dtype=dtype)
    y = L.gelu(y)
    mid = y.shape[-1]
    y = _conv(p["conv2_kxk"], y, stride=stride, padding=1, groups=mid, dtype=dtype)
    y = L.gelu(y)
    y = _conv(p["conv3_1x1"], y, dtype=dtype)
    if train and drop_rate > 0.0 and rng is not None:
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
        y = y * (mask.astype(y.dtype) / keep)
    return shortcut + y


def _vit_block_apply(p, x, *, heads: int, dtype=None, drop_rate=0.0,
                     train=False, rng=None):
    def _drop(y, salt):
        if train and drop_rate > 0.0 and rng is not None:
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(jax.random.fold_in(rng, salt), keep,
                                        (y.shape[0], 1, 1))
            return y * (mask.astype(y.dtype) / keep)
        return y

    y = L.layernorm_apply(p["norm1"], x, eps=LN_EPS)
    qkv = L.linear_apply(p["attn"]["qkv"], y, dtype=dtype)
    d = x.shape[-1]
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    o = L.attention(q, k, v, num_heads=heads)
    y = L.linear_apply(p["attn"]["proj"], o, dtype=dtype)
    x = x + _drop(y, 0)
    y = L.layernorm_apply(p["norm2"], x, eps=LN_EPS)
    # GeGluMlp: its own leading LN (on top of norm2 — as in the original)
    y = L.layernorm_apply(p["mlp"]["norm"], y, eps=LN_EPS)
    g = L.linear_apply(p["mlp"]["w0"], y, dtype=dtype)
    v = L.linear_apply(p["mlp"]["w1"], y, dtype=dtype)
    y = L.linear_apply(p["mlp"]["w2"], L.gelu(g) * v, dtype=dtype)
    return x + _drop(y, 1)


def _resample_pos_embed(pos, native_grid: int, grid: int):
    if grid == native_grid:
        return pos
    p = pos.reshape(1, native_grid, native_grid, -1)
    p = jax.image.resize(p, (1, grid, grid, p.shape[-1]), method="bicubic")
    return p.reshape(grid * grid, -1)


def vitamin_stage_names(cfg: ViTaminCfg) -> List[str]:
    names = ["stem"]
    for s in range(2):
        names += [f"stages.{s}.{b}" for b in range(MB_DEPTHS[s])]
    names += ["embed"] + [f"blocks.{i}" for i in range(cfg.vit_depth)] + ["pool"]
    return names


def vitamin_apply(
    params,
    x,
    cfg: ViTaminCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    stop: Optional[int] = None,
):
    """NHWC images -> (features (B, output_dim), intermediates)."""
    names = vitamin_stage_names(cfg)
    stop = len(names) if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    if dtype is not None:
        x = x.astype(dtype)
    bb = params["backbone"]
    y = _conv(bb["stem"]["conv1"], x, stride=2, padding=1, dtype=dtype)
    y = L.layernorm_apply(bb["stem"]["norm1"], y, eps=LN_EPS)
    y = L.gelu(y)  # timm NormAct stem norm
    y = _conv(bb["stem"]["conv2"], y, padding=1, dtype=dtype)
    if "stem" in capture:
        inters["stem"] = y

    idx = 1
    n_vit = cfg.vit_depth
    rates = np.linspace(0.0, cfg.drop_path_rate, n_vit) if n_vit > 1 else [0.0]
    for s, blocks in enumerate(bb["stages"]):
        for b, bp in enumerate(blocks):
            if idx >= stop:
                return y, inters
            y = _mbconv_apply(bp, y, stride=2 if b == 0 else 1, dtype=dtype)
            if f"stages.{s}.{b}" in capture:
                inters[f"stages.{s}.{b}"] = y
            idx += 1

    if idx >= stop:
        return y, inters
    y = L.layernorm_apply(bb["pool"]["norm"], y, eps=LN_EPS)
    y = _conv(bb["pool"]["proj"], y, stride=2, padding=1, dtype=dtype)
    bsz, gh, gw, d = y.shape
    tokens = y.reshape(bsz, gh * gw, d)
    pos = _resample_pos_embed(params["pos_embed"], cfg.native_grid, gh)
    tokens = tokens + pos.astype(tokens.dtype)
    if "embed" in capture:
        inters["embed"] = tokens
    idx += 1

    for i, bp in enumerate(params["blocks"]):
        if idx >= stop:
            return tokens, inters
        block_rng = (jax.random.fold_in(rng, i)
                     if (rng is not None and train and cfg.drop_path_rate > 0) else None)
        fn = lambda p, inp: _vit_block_apply(
            p, inp, heads=cfg.heads, dtype=dtype, drop_rate=float(rates[i]),
            train=train, rng=block_rng)
        if remat:
            fn = jax.checkpoint(fn)
        tokens = fn(bp, tokens)
        if f"blocks.{i}" in capture:
            inters[f"blocks.{i}"] = tokens
        idx += 1

    if idx >= stop:
        return tokens, inters
    # global_pool='avg' ViT head: trunk norm is Identity, fc_norm after pool
    pooled = jnp.mean(tokens.astype(jnp.float32), axis=1)
    pooled = L.layernorm_apply(params["fc_norm"], pooled, eps=LN_EPS)
    out = L.linear_apply(params["head"]["proj"], pooled) if "head" in params else pooled
    if "pool" in capture:
        inters["pool"] = out
    return out, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge
# (visual.trunk.patch_embed.backbone.* / visual.trunk.blocks.* / visual.head)


def vitamin_params_to_state_dict(params, cfg: ViTaminCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    put_ln = functools.partial(C.write_ln, sd)
    put_conv = functools.partial(C.write_conv, sd)
    put_lin = functools.partial(C.write_linear, sd)

    bb = params["backbone"]
    base = "trunk.patch_embed.backbone"
    put_conv(f"{base}.stem.conv1", bb["stem"]["conv1"])
    put_ln(f"{base}.stem.norm1", bb["stem"]["norm1"])
    put_conv(f"{base}.stem.conv2", bb["stem"]["conv2"])
    for s, blocks in enumerate(bb["stages"]):
        for b, bp in enumerate(blocks):
            pre = f"{base}.stages.{s}.{b}"
            put_ln(f"{pre}.pre_norm", bp["pre_norm"])
            put_conv(f"{pre}.conv1_1x1", bp["conv1_1x1"])
            put_conv(f"{pre}.conv2_kxk", bp["conv2_kxk"])
            put_conv(f"{pre}.conv3_1x1", bp["conv3_1x1"])
            if "shortcut" in bp:
                if "expand" in bp["shortcut"]:
                    put_conv(f"{pre}.shortcut.expand", bp["shortcut"]["expand"])
                else:
                    put_conv(f"{pre}.shortcut", bp["shortcut"])
    put_ln(f"{base}.pool.norm", bb["pool"]["norm"])
    put_conv(f"{base}.pool.proj", bb["pool"]["proj"])
    sd["trunk.pos_embed"] = np.asarray(params["pos_embed"])[None]
    for i, bp in enumerate(params["blocks"]):
        pre = f"trunk.blocks.{i}"
        put_ln(f"{pre}.norm1", bp["norm1"])
        put_lin(f"{pre}.attn.qkv", bp["attn"]["qkv"])
        put_lin(f"{pre}.attn.proj", bp["attn"]["proj"])
        put_ln(f"{pre}.norm2", bp["norm2"])
        put_ln(f"{pre}.mlp.norm", bp["mlp"]["norm"])
        put_lin(f"{pre}.mlp.w0", bp["mlp"]["w0"])
        put_lin(f"{pre}.mlp.w1", bp["mlp"]["w1"])
        put_lin(f"{pre}.mlp.w2", bp["mlp"]["w2"])
    put_ln("trunk.fc_norm", params["fc_norm"])
    if "head" in params:
        put_lin("head.proj", params["head"]["proj"])
    return sd


def vitamin_state_dict_to_params(sd: Dict[str, np.ndarray], cfg: ViTaminCfg) -> Dict:
    ln = functools.partial(C.read_ln, sd)
    conv = functools.partial(C.read_conv, sd)
    lin = functools.partial(C.read_linear, sd)

    base = "trunk.patch_embed.backbone"
    params: Dict = {
        "backbone": {
            "stem": {"conv1": conv(f"{base}.stem.conv1"),
                     "norm1": ln(f"{base}.stem.norm1"),
                     "conv2": conv(f"{base}.stem.conv2")},
            "stages": [],
            "pool": {"norm": ln(f"{base}.pool.norm"),
                     "proj": conv(f"{base}.pool.proj")},
        },
        "pos_embed": jnp.asarray(np.asarray(sd["trunk.pos_embed"])[0]),
        "blocks": [],
        "fc_norm": ln("trunk.fc_norm"),
    }
    for s in range(2):
        blocks = []
        for b in range(MB_DEPTHS[s]):
            pre = f"{base}.stages.{s}.{b}"
            bp: Dict = {
                "pre_norm": ln(f"{pre}.pre_norm"),
                "conv1_1x1": conv(f"{pre}.conv1_1x1"),
                "conv2_kxk": conv(f"{pre}.conv2_kxk"),
                "conv3_1x1": conv(f"{pre}.conv3_1x1"),
            }
            if f"{pre}.shortcut.expand.weight" in sd:
                bp["shortcut"] = {"expand": conv(f"{pre}.shortcut.expand")}
            elif f"{pre}.shortcut.weight" in sd:
                bp["shortcut"] = conv(f"{pre}.shortcut")
            blocks.append(bp)
        params["backbone"]["stages"].append(blocks)
    for i in range(cfg.vit_depth):
        pre = f"trunk.blocks.{i}"
        params["blocks"].append({
            "norm1": ln(f"{pre}.norm1"),
            "attn": {"qkv": lin(f"{pre}.attn.qkv"), "proj": lin(f"{pre}.attn.proj")},
            "norm2": ln(f"{pre}.norm2"),
            "mlp": {"norm": ln(f"{pre}.mlp.norm"), "w0": lin(f"{pre}.mlp.w0"),
                    "w1": lin(f"{pre}.mlp.w1"), "w2": lin(f"{pre}.mlp.w2")},
        })
    if "head.proj.weight" in sd:
        params["head"] = {"proj": lin("head.proj")}
    return params
