"""Native JAX Swin Transformer vision towers — the reference's swin_* configs.

The reference builds these through timm (deps/open_clip/src/open_clip/
timm_model.py:73-104): ``timm_pool=''`` leaves the trunk's default avg
pooling in place, ``reset_classifier(0)`` drops the classifier, and
``timm_proj='linear'`` adds a bias-free ``head.proj`` Linear
(num_features -> embed_dim). timm is absent from this image, so this is a
from-scratch functional implementation of the timm ``SwinTransformer``
architecture (Liu et al., arXiv:2103.14030; timm swin_transformer.py):

- patch stem: 4x4/stride-4 conv + LayerNorm
- 4 stages (``layers.{i}``); stages 1-3 start with a PatchMerging
  downsample (2x2 neighbourhood concat -> LN(4C) -> bias-free Linear
  4C -> 2C, the current-timm stage-entry layout)
- blocks: pre-LN windowed MSA (7x7 windows, qkv bias, per-head relative
  position bias table) alternating with shifted windows (roll by w/2,
  cross-region attention masked out); shift disabled when the stage grid
  equals the window (the 7x7 final stage); MLP ratio 4
- trunk head: final LayerNorm on the (B,H,W,C) map, then global avg pool

Checkpoints use the open_clip TimmModel naming (``visual.trunk.*`` +
``visual.head.proj``); the ``relative_position_index`` buffers are exported
for reference compatibility and regenerated (not read) on load. Numerics oracle:
tests/test_cross_impl_towers.py loads weights from transformers' INDEPENDENT
torch SwinModel (shifted windows, rel-pos bias, patch merging) and asserts
pooled-feature parity; timm-vs-this golden parity additionally pends a
timm-equipped environment (TODO.md).
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

LN_EPS = 1e-5  # torch nn.LayerNorm default (timm swin uses it unchanged)

# timm swin variant table (embed dim / depths / heads), swin_transformer.py
VARIANTS = {
    "swin_tiny_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24)),
    "swin_base_patch4_window7_224": dict(
        embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32)),
}


@dataclasses.dataclass(frozen=True)
class SwinCfg:
    timm_name: str
    output_dim: int
    image_size: int = 224
    patch_size: int = 4
    window: int = 7
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    proj: str = "linear"  # timm_proj

    @property
    def dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))

    @property
    def width(self) -> int:  # trunk num_features
        return self.dims[-1]

    # CLIPModel-facing shims
    @property
    def attentional_pool(self) -> bool:
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def swin_cfg_from_vision_dict(v: dict, embed_dim: int) -> SwinCfg:
    name = v["timm_model_name"]
    return SwinCfg(timm_name=name, output_dim=embed_dim,
                   image_size=v.get("image_size", 224),
                   proj=v.get("timm_proj", "linear") or "none",
                   **VARIANTS[name])


# ---------------------------------------------------------------------------
# static window tables


@functools.lru_cache(maxsize=16)
def _relative_position_index(window: int) -> np.ndarray:
    """(w², w²) lookup into the (2w-1)² bias table (swin WindowAttention)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)  # (2, w²)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, w², w²)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=16)
def _shift_attn_mask(grid: int, window: int, shift: int) -> np.ndarray:
    """(nWin, w², w²) additive mask (-100 across shifted-region boundaries)."""
    img = np.zeros((grid, grid), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    n = grid // window
    wins = img.reshape(n, window, n, window).transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] != wins[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_partition(x, window: int):
    b, h, w, c = x.shape
    n = h // window
    x = x.reshape(b, n, window, n, window, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, n * n, window * window, c)


def _window_reverse(x, window: int, grid: int):
    b, _, _, c = x.shape
    n = grid // window
    x = x.reshape(b, n, n, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, grid, grid, c)


# ---------------------------------------------------------------------------
# init


from xclip_tpu.models.tower_common import linear_init as _lin_init
from xclip_tpu.models.tower_common import trunc_init as _trunc


def _block_init(rng, dim: int, heads: int, cfg: SwinCfg) -> Dict:
    k = jax.random.split(rng, 5)
    hidden = int(dim * cfg.mlp_ratio)
    return {
        "norm1": L.layernorm_init(dim),
        "attn": {
            "qkv": _lin_init(k[0], dim, 3 * dim),
            "proj": _lin_init(k[1], dim, dim),
            "relative_position_bias_table": _trunc(
                k[2], ((2 * cfg.window - 1) ** 2, heads)),
        },
        "norm2": L.layernorm_init(dim),
        "mlp": {"fc1": _lin_init(k[3], dim, hidden),
                "fc2": _lin_init(k[4], hidden, dim)},
    }


def swin_init(rng, cfg: SwinCfg) -> Dict:
    keys = jax.random.split(rng, 4)
    dims = cfg.dims
    params: Dict = {
        "patch_embed": {
            "proj": {"kernel": _trunc(keys[0], (cfg.patch_size, cfg.patch_size, 3, dims[0])),
                     "bias": jnp.zeros((dims[0],), jnp.float32)},
            "norm": L.layernorm_init(dims[0]),
        },
        "layers": [],
        "norm": L.layernorm_init(dims[-1]),
    }
    for s in range(len(cfg.depths)):
        stage: Dict = {"blocks": []}
        if s > 0:
            k = jax.random.fold_in(keys[1], s)
            stage["downsample"] = {
                "norm": L.layernorm_init(4 * dims[s - 1]),
                "reduction": _lin_init(k, 4 * dims[s - 1], dims[s], bias=False),
            }
        for _ in range(cfg.depths[s]):
            rng, sub = jax.random.split(rng)
            stage["blocks"].append(_block_init(sub, dims[s], cfg.heads[s], cfg))
        params["layers"].append(stage)
    if cfg.proj == "linear":
        params["head"] = {"proj": _lin_init(keys[2], dims[-1], cfg.output_dim, bias=False)}
    return params


# ---------------------------------------------------------------------------
# forward


def _window_attention(p, x, *, heads: int, window: int, mask: Optional[np.ndarray],
                      dtype=None):
    """x: (B, nWin, w², C) windowed tokens."""
    b, nw, n, c = x.shape
    hd = c // heads
    qkv = L.linear_apply(p["qkv"], x, dtype=dtype)
    qkv = qkv.reshape(b, nw, n, 3, heads, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    # fp32 logit accumulation + fp32 bias/mask adds (as L.attention does —
    # the ~0.02-magnitude rel-pos bias would round off in a bf16 add)
    attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    idx = _relative_position_index(window).reshape(-1)
    bias = jnp.take(p["relative_position_bias_table"], idx, axis=0)
    bias = bias.reshape(n, n, heads).transpose(2, 0, 1)  # (heads, w², w²)
    attn = attn + bias[None, None].astype(jnp.float32)
    if mask is not None:
        attn = attn + jnp.asarray(mask)[None, :, None]
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    o = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, v).reshape(b, nw, n, c)
    return L.linear_apply(p["proj"], o, dtype=dtype)


def _block_apply(p, x, *, heads: int, window: int, shift: int, dtype=None):
    """x: (B, H, W, C) spatial map."""
    grid = x.shape[1]
    shortcut = x
    y = L.layernorm_apply(p["norm1"], x, eps=LN_EPS)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(y, window)
    mask = _shift_attn_mask(grid, window, shift) if shift else None
    wins = _window_attention(p["attn"], wins, heads=heads, window=window,
                             mask=mask, dtype=dtype)
    y = _window_reverse(wins, window, grid)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = shortcut + y
    y = L.layernorm_apply(p["norm2"], x, eps=LN_EPS)
    y = L.linear_apply(p["mlp"]["fc1"], y, dtype=dtype)
    y = L.gelu(y)
    y = L.linear_apply(p["mlp"]["fc2"], y, dtype=dtype)
    return x + y


def _patch_merge(p, x, *, dtype=None):
    """(B,H,W,C) -> (B,H/2,W/2,2C): concat order [(0,0),(1,0),(0,1),(1,1)]
    (dh,dw) offsets — the swin PatchMerging x0..x3 layout."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
    x = x.reshape(b, h // 2, w // 2, 4 * c)
    x = L.layernorm_apply(p["norm"], x, eps=LN_EPS)
    return L.linear_apply(p["reduction"], x, dtype=dtype)


def swin_stage_names(cfg: SwinCfg) -> List[str]:
    names = ["embed"]
    for s, depth in enumerate(cfg.depths):
        names += [f"layers.{s}.{b}" for b in range(depth)]
    names.append("pool")
    return names


def swin_apply(
    params,
    x,
    cfg: SwinCfg,
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
    names = swin_stage_names(cfg)
    stop = len(names) if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    grid0 = x.shape[1] // cfg.patch_size
    n_stages = len(cfg.depths)
    bad = [g for g in (grid0 // 2 ** s for s in range(n_stages)) if g % cfg.window]
    if bad:
        raise NotImplementedError(
            f"swin grids {bad} are not multiples of the {cfg.window}x{cfg.window} "
            f"window (input {x.shape[1]}px); timm pads such maps — unimplemented "
            f"here, use the native {cfg.window * 2 ** (n_stages - 1)}-divisible sizes"
        )
    y = L.conv_apply(params["patch_embed"]["proj"], x, stride=cfg.patch_size,
                     dtype=dtype)
    y = L.layernorm_apply(params["patch_embed"]["norm"], y, eps=LN_EPS)
    if "embed" in capture:
        inters["embed"] = y

    idx = 1
    for s, stage in enumerate(params["layers"]):
        if s > 0:
            y = _patch_merge(stage["downsample"], y, dtype=dtype)
        grid = y.shape[1]
        # shift disabled when the whole map is one window (final 7x7 stage)
        shift = 0 if grid <= cfg.window else cfg.window // 2
        for b, bp in enumerate(stage["blocks"]):
            if idx >= stop:
                return y, inters
            blk_shift = shift if (b % 2 == 1) else 0
            fn = lambda p, inp: _block_apply(p, inp, heads=cfg.heads[s],
                                             window=cfg.window, shift=blk_shift,
                                             dtype=dtype)
            if remat:
                fn = jax.checkpoint(fn)
            y = fn(bp, y)
            name = f"layers.{s}.{b}"
            if name in capture:
                inters[name] = y
            idx += 1

    if idx >= stop:
        return y, inters
    # trunk: final LN on the spatial map, then default avg pooling
    # (timm_pool='' keeps the ClassifierHead global_pool, fc -> Identity)
    y = L.layernorm_apply(params["norm"], y, eps=LN_EPS)
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    out = L.linear_apply(params["head"]["proj"], pooled) if "head" in params else pooled
    if "pool" in capture:
        inters["pool"] = out
    return out, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge (visual.trunk.* + visual.head.proj)


def swin_params_to_state_dict(params, cfg: SwinCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    put_ln = functools.partial(C.write_ln, sd)

    put_lin = functools.partial(C.write_linear, sd)

    sd["trunk.patch_embed.proj.weight"] = np.transpose(
        np.asarray(params["patch_embed"]["proj"]["kernel"]), (3, 2, 0, 1))
    sd["trunk.patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["proj"]["bias"])
    put_ln("trunk.patch_embed.norm", params["patch_embed"]["norm"])
    for s, stage in enumerate(params["layers"]):
        if "downsample" in stage:
            put_ln(f"trunk.layers.{s}.downsample.norm", stage["downsample"]["norm"])
            put_lin(f"trunk.layers.{s}.downsample.reduction", stage["downsample"]["reduction"])
        for b, bp in enumerate(stage["blocks"]):
            base = f"trunk.layers.{s}.blocks.{b}"
            put_ln(f"{base}.norm1", bp["norm1"])
            put_lin(f"{base}.attn.qkv", bp["attn"]["qkv"])
            put_lin(f"{base}.attn.proj", bp["attn"]["proj"])
            sd[f"{base}.attn.relative_position_bias_table"] = np.asarray(
                bp["attn"]["relative_position_bias_table"])
            sd[f"{base}.attn.relative_position_index"] = np.asarray(
                _relative_position_index(cfg.window), np.int64)
            put_ln(f"{base}.norm2", bp["norm2"])
            put_lin(f"{base}.mlp.fc1", bp["mlp"]["fc1"])
            put_lin(f"{base}.mlp.fc2", bp["mlp"]["fc2"])
    put_ln("trunk.norm", params["norm"])
    if "head" in params:
        put_lin("head.proj", params["head"]["proj"])
    return sd


def swin_state_dict_to_params(sd: Dict[str, np.ndarray], cfg: SwinCfg) -> Dict:
    ln = functools.partial(C.read_ln, sd)

    lin = functools.partial(C.read_linear, sd)

    params: Dict = {
        "patch_embed": {
            "proj": {"kernel": jnp.asarray(np.transpose(
                np.asarray(sd["trunk.patch_embed.proj.weight"]), (2, 3, 1, 0))),
                "bias": jnp.asarray(np.asarray(sd["trunk.patch_embed.proj.bias"]))},
            "norm": ln("trunk.patch_embed.norm"),
        },
        "layers": [],
        "norm": ln("trunk.norm"),
    }
    for s in range(len(cfg.depths)):
        stage: Dict = {"blocks": []}
        if f"trunk.layers.{s}.downsample.norm.weight" in sd:
            stage["downsample"] = {
                "norm": ln(f"trunk.layers.{s}.downsample.norm"),
                "reduction": lin(f"trunk.layers.{s}.downsample.reduction"),
            }
        for b in range(cfg.depths[s]):
            base = f"trunk.layers.{s}.blocks.{b}"
            stage["blocks"].append({
                "norm1": ln(f"{base}.norm1"),
                "attn": {
                    "qkv": lin(f"{base}.attn.qkv"),
                    "proj": lin(f"{base}.attn.proj"),
                    "relative_position_bias_table": jnp.asarray(
                        np.asarray(sd[f"{base}.attn.relative_position_bias_table"])),
                },
                "norm2": ln(f"{base}.norm2"),
                "mlp": {"fc1": lin(f"{base}.mlp.fc1"), "fc2": lin(f"{base}.mlp.fc2")},
            })
        params["layers"].append(stage)
    if "head.proj.weight" in sd:
        params["head"] = {"proj": lin("head.proj")}
    return params
