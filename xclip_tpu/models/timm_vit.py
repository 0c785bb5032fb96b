"""Native JAX timm-style ViT vision towers — SigLIP ViTs + plain timm ViTs.

The reference builds these through timm (deps/open_clip/src/open_clip/
timm_model.py:57-89): for the SigLIP configs (``timm_pool='map'``,
``timm_proj='none'``) the trunk is ``timm.create_model('vit_*_siglip_*',
num_classes=0, global_pool='map')`` — the attention-pool latent head lives
*inside* the trunk (``visual.trunk.attn_pool.*``) and the open_clip head is
empty; for ``vit_medium_patch16_gap_256`` / ``vit_relpos_medium_patch16_cls_224``
(``timm_pool=''``, ``timm_proj='linear'``) the trunk keeps its default pooling
and open_clip adds a bias-free ``visual.head.proj`` linear
(timm_model.py:102-104).

timm is absent from this image, so this is a from-scratch functional
implementation of the timm VisionTransformer forward path:

- patch embed: P×P/stride-P conv (with bias) -> (B, N, D) tokens
- optional class token; learned absolute pos-embed (added over cls+patches),
  or per-block relative-position-MLP attention bias (the ``vit_relpos``
  family, timm pos_embed_rel.py ``RelPosMlp`` mode='cr') instead
- pre-LN blocks: norm1 -> fused-qkv attention -> proj [-> LayerScale ls1]
  -> residual; norm2 -> MLP(fc1, GELU, fc2) [-> ls2] -> residual
- final LayerNorm (eps 1e-6), then trunk pooling: ``map`` = timm
  AttentionPoolLatent (latent query attention + MLP residual, token pool),
  ``avg`` = mean over patch tokens, ``token`` = cls token
- optional open_clip projection head (linear / mlp), timm_model.py:101-106

Checkpoints use the open_clip TimmModel naming (``visual.trunk.*`` +
``visual.head.*``) so published SigLIP CLIP weights load once available.
Numerics oracle: tests/test_cross_impl_towers.py loads weights from
transformers' INDEPENDENT torch SiglipVisionModel (trunk + attention-pool
head) and asserts pooled-feature parity; timm-vs-this golden parity on the
published configs additionally pends a timm-equipped environment (TODO.md).
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

# timm variant table (patch, width, depth, heads, mlp_ratio, pool overrides):
# vision_transformer.py (siglip + medium_gap) / vision_transformer_relpos.py
VARIANTS = {
    "vit_base_patch16_siglip_224": dict(patch_size=16, width=768, layers=12, heads=12),
    "vit_base_patch16_siglip_256": dict(patch_size=16, width=768, layers=12, heads=12),
    "vit_base_patch16_siglip_384": dict(patch_size=16, width=768, layers=12, heads=12),
    "vit_base_patch16_siglip_512": dict(patch_size=16, width=768, layers=12, heads=12),
    "vit_large_patch16_siglip_256": dict(patch_size=16, width=1024, layers=24, heads=16),
    "vit_large_patch16_siglip_384": dict(patch_size=16, width=1024, layers=24, heads=16),
    "vit_so400m_patch14_siglip_224": dict(
        patch_size=14, width=1152, layers=27, heads=16, mlp_ratio=3.7362),
    "vit_so400m_patch14_siglip_384": dict(
        patch_size=14, width=1152, layers=27, heads=16, mlp_ratio=3.7362),
    "vit_medium_patch16_gap_256": dict(
        patch_size=16, width=512, layers=12, heads=8, qkv_bias=False,
        init_values=1e-6, default_pool="avg"),
    "vit_relpos_medium_patch16_cls_224": dict(
        patch_size=16, width=512, layers=12, heads=8, qkv_bias=False,
        init_values=1e-6, class_token=True, rel_pos=True, rel_pos_dim=256,
        default_pool="token"),
}


@dataclasses.dataclass(frozen=True)
class TimmViTCfg:
    timm_name: str
    output_dim: int
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    pool: str = "map"  # trunk pooling: map | avg | token
    proj: str = "none"  # open_clip head: none | linear | mlp
    proj_bias: bool = False
    class_token: bool = False
    qkv_bias: bool = True
    init_values: Optional[float] = None  # LayerScale (timm ls1/ls2.gamma)
    rel_pos: bool = False  # RelPosMlp bias instead of absolute pos embed
    rel_pos_dim: int = 256

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_prefix(self) -> int:
        return 1 if self.class_token else 0

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + self.num_prefix

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)

    # CLIPModel-facing shims (match ConvNeXtCfg/VisionTransformerCfg surface)
    @property
    def attentional_pool(self) -> bool:
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def timm_vit_cfg_from_vision_dict(v: dict, embed_dim: int) -> TimmViTCfg:
    name = v["timm_model_name"]
    var = dict(VARIANTS[name])
    default_pool = var.pop("default_pool", "avg")
    # open_clip timm_model.py:57-88: pool 'map' keeps the trunk's attn_pool;
    # pool '' leaves the trunk's default pooling in place
    pool = v.get("timm_pool", "avg")
    if pool in ("", None):
        pool = default_pool
    proj = v.get("timm_proj", "linear") or "none"
    return TimmViTCfg(
        timm_name=name, output_dim=embed_dim,
        image_size=v.get("image_size", 224),
        pool=pool, proj=proj, proj_bias=bool(v.get("timm_proj_bias", False)),
        **var,
    )


# ---------------------------------------------------------------------------
# relative-position MLP bias (timm pos_embed_rel.py RelPosMlp, mode='cr')


@functools.lru_cache(maxsize=8)
def _relpos_tables(grid: int) -> Tuple[np.ndarray, np.ndarray]:
    """(log-relative-coords table ((2g-1)², 2), gather index (N², ) into it).

    timm gen_relative_log_coords(mode='cr'): sign(c) * log1p(|c|) over the
    (2g-1)×(2g-1) relative-offset grid; gen_relative_position_index maps each
    (query, key) patch pair to its offset row.
    """
    coords = np.stack(np.meshgrid(
        np.arange(2 * grid - 1) - (grid - 1),
        np.arange(2 * grid - 1) - (grid - 1), indexing="ij"), axis=-1).astype(np.float32)
    log_coords = np.sign(coords) * np.log1p(np.abs(coords))
    log_coords = log_coords.reshape(-1, 2)

    pos = np.stack(np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij"),
                   axis=-1).reshape(-1, 2)
    rel = pos[:, None, :] - pos[None, :, :] + (grid - 1)  # (N, N, 2) in [0, 2g-2]
    index = (rel[..., 0] * (2 * grid - 1) + rel[..., 1]).reshape(-1)
    return log_coords, index.astype(np.int32)


def _relpos_bias(p, cfg: TimmViTCfg, dtype=None):
    """Per-head additive attention bias (H, S, S) from the rel-pos MLP;
    prefix (cls) rows/cols are zero-padded (timm RelPosMlp prefix_tokens)."""
    coords_np, index_np = _relpos_tables(cfg.grid)
    coords = jnp.asarray(coords_np)
    h = L.linear_apply(p["fc1"], coords, dtype=dtype)
    h = jax.nn.relu(h)
    table = L.linear_apply(p["fc2"], h, dtype=dtype)  # ((2g-1)², H)
    n = cfg.grid * cfg.grid
    bias = table[jnp.asarray(index_np)].reshape(n, n, cfg.heads)
    bias = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)
    if cfg.num_prefix:
        bias = jnp.pad(bias, ((0, 0), (cfg.num_prefix, 0), (cfg.num_prefix, 0)))
    return bias


# ---------------------------------------------------------------------------
# init


from xclip_tpu.models.tower_common import linear_init as _lin_init
from xclip_tpu.models.tower_common import trunc_init as _trunc


def _block_init(rng, cfg: TimmViTCfg) -> Dict:
    k = jax.random.split(rng, 6)
    d = cfg.width
    blk: Dict = {
        "norm1": L.layernorm_init(d),
        "attn": {
            "qkv": _lin_init(k[0], d, 3 * d, bias=cfg.qkv_bias),
            "proj": _lin_init(k[1], d, d),
        },
        "norm2": L.layernorm_init(d),
        "mlp": {
            "fc1": _lin_init(k[2], d, cfg.mlp_hidden),
            "fc2": _lin_init(k[3], cfg.mlp_hidden, d),
        },
    }
    if cfg.rel_pos:
        blk["attn"]["rel_pos"] = {
            "fc1": _lin_init(k[4], 2, cfg.rel_pos_dim),
            "fc2": _lin_init(k[5], cfg.rel_pos_dim, cfg.heads, bias=False),
        }
    if cfg.init_values is not None:
        blk["ls1"] = jnp.full((d,), cfg.init_values, jnp.float32)
        blk["ls2"] = jnp.full((d,), cfg.init_values, jnp.float32)
    return blk


def timm_vit_init(rng, cfg: TimmViTCfg) -> Dict:
    keys = jax.random.split(rng, 8)
    d = cfg.width
    params: Dict = {
        "patch_embed": {"kernel": _trunc(keys[0], (cfg.patch_size, cfg.patch_size, 3, d)),
                        "bias": jnp.zeros((d,), jnp.float32)},
        "blocks": [],
        "norm": L.layernorm_init(d),
    }
    if cfg.class_token:
        params["cls_token"] = jnp.zeros((d,), jnp.float32)
    if not cfg.rel_pos:
        params["pos_embed"] = _trunc(keys[1], (cfg.seq_len, d))
    for _ in range(cfg.layers):
        rng, sub = jax.random.split(rng)
        params["blocks"].append(_block_init(sub, cfg))
    if cfg.pool == "map":
        k = jax.random.split(keys[2], 5)
        params["attn_pool"] = {
            "latent": _trunc(k[0], (1, d)),
            "q": _lin_init(k[1], d, d),
            "kv": _lin_init(k[2], d, 2 * d),
            "proj": _lin_init(k[3], d, d),
            "norm": L.layernorm_init(d),
            "mlp": {
                "fc1": _lin_init(k[4], d, cfg.mlp_hidden),
                "fc2": _lin_init(jax.random.fold_in(k[4], 1), cfg.mlp_hidden, d),
            },
        }
    out = cfg.output_dim
    if cfg.proj == "linear":
        params["head"] = {"proj": _lin_init(keys[3], d, out, bias=cfg.proj_bias)}
    elif cfg.proj == "mlp":
        params["head"] = {"mlp": {
            "fc1": _lin_init(keys[4], d, 2 * out),
            "fc2": _lin_init(keys[5], 2 * out, out, bias=cfg.proj_bias),
        }}
    return params


# ---------------------------------------------------------------------------
# forward


def _block_apply(p, x, cfg: TimmViTCfg, *, dtype=None):
    y = L.layernorm_apply(p["norm1"], x, eps=LN_EPS)
    qkv = L.linear_apply(p["attn"]["qkv"], y, dtype=dtype)
    d = cfg.width
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    mask = (_relpos_bias(p["attn"]["rel_pos"], cfg, dtype=dtype)
            if cfg.rel_pos else None)
    o = L.attention(q, k, v, num_heads=cfg.heads, mask=mask)
    o = L.linear_apply(p["attn"]["proj"], o, dtype=dtype)
    if "ls1" in p:
        o = o * p["ls1"].astype(o.dtype)
    x = x + o
    y = L.layernorm_apply(p["norm2"], x, eps=LN_EPS)
    y = L.linear_apply(p["mlp"]["fc1"], y, dtype=dtype)
    y = L.gelu(y)
    y = L.linear_apply(p["mlp"]["fc2"], y, dtype=dtype)
    if "ls2" in p:
        y = y * p["ls2"].astype(y.dtype)
    return x + y


def _attn_pool_latent(p, x, cfg: TimmViTCfg, *, dtype=None):
    """timm AttentionPoolLatent (layers/attention_pool.py): latent-query
    cross-attention + residual MLP, token pooling (latent_len=1)."""
    b = x.shape[0]
    d = cfg.width
    latent = jnp.broadcast_to(p["latent"].astype(x.dtype), (b, 1, d))
    q = L.linear_apply(p["q"], latent, dtype=dtype)
    kv = L.linear_apply(p["kv"], x, dtype=dtype)
    k, v = kv[..., :d], kv[..., d:]
    o = L.attention(q, k, v, num_heads=cfg.heads)
    o = L.linear_apply(p["proj"], o, dtype=dtype)
    y = L.layernorm_apply(p["norm"], o, eps=LN_EPS)
    y = L.linear_apply(p["mlp"]["fc1"], y, dtype=dtype)
    y = L.gelu(y)
    y = L.linear_apply(p["mlp"]["fc2"], y, dtype=dtype)
    o = o + y
    return o[:, 0]


def timm_vit_stage_names(cfg: TimmViTCfg) -> List[str]:
    return ["embed"] + [f"blocks.{i}" for i in range(cfg.layers)] + ["pool"]


def timm_vit_apply(
    params,
    x,
    cfg: TimmViTCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    stop: Optional[int] = None,
):
    """NHWC images -> (features (B, output_dim), intermediates)."""
    del train, rng  # no stochastic layers at inference-compatible defaults
    n_stages = cfg.layers + 2
    stop = n_stages if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    patches = L.conv_apply(params["patch_embed"], x, stride=cfg.patch_size, dtype=dtype)
    b = patches.shape[0]
    tokens = patches.reshape(b, cfg.grid * cfg.grid, cfg.width)
    if cfg.class_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                               (b, 1, cfg.width))
        tokens = jnp.concatenate([cls, tokens], axis=1)
    if not cfg.rel_pos:
        tokens = tokens + params["pos_embed"].astype(tokens.dtype)
    x = tokens
    if "embed" in capture:
        inters["embed"] = x

    for i, bp in enumerate(params["blocks"]):
        if 1 + i >= stop:
            return x, inters
        fn = lambda p, inp: _block_apply(p, inp, cfg, dtype=dtype)
        if remat:
            fn = jax.checkpoint(fn)
        x = fn(bp, x)
        name = f"blocks.{i}"
        if name in capture:
            inters[name] = x

    if stop < n_stages:
        return x, inters
    x = L.layernorm_apply(params["norm"], x, eps=LN_EPS)
    if cfg.pool == "map":
        pooled = _attn_pool_latent(params["attn_pool"], x, cfg, dtype=dtype)
    elif cfg.pool == "avg":
        pooled = jnp.mean(x[:, cfg.num_prefix:].astype(jnp.float32), axis=1)
    elif cfg.pool == "token":
        pooled = x[:, 0]
    else:
        raise ValueError(f"unknown trunk pool {cfg.pool!r}")
    pooled = pooled.astype(jnp.float32)
    if "head" not in params:
        out = pooled
    elif "proj" in params["head"]:
        out = L.linear_apply(params["head"]["proj"], pooled)
    else:
        h = L.linear_apply(params["head"]["mlp"]["fc1"], pooled)
        h = L.gelu(h)
        out = L.linear_apply(params["head"]["mlp"]["fc2"], h)
    if "pool" in capture:
        inters["pool"] = out
    return out, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge (visual.trunk.* / visual.head.*)


def timm_vit_params_to_state_dict(params, cfg: TimmViTCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    put_ln = functools.partial(C.write_ln, sd)

    put_lin = functools.partial(C.write_linear, sd)

    # NHWC HWIO -> torch OIHW
    sd["trunk.patch_embed.proj.weight"] = np.transpose(
        np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1))
    sd["trunk.patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    if "cls_token" in params:
        sd["trunk.cls_token"] = np.asarray(params["cls_token"])[None, None]
    if "pos_embed" in params:
        sd["trunk.pos_embed"] = np.asarray(params["pos_embed"])[None]
    for i, bp in enumerate(params["blocks"]):
        base = f"trunk.blocks.{i}"
        put_ln(f"{base}.norm1", bp["norm1"])
        put_lin(f"{base}.attn.qkv", bp["attn"]["qkv"])
        put_lin(f"{base}.attn.proj", bp["attn"]["proj"])
        if "rel_pos" in bp["attn"]:
            put_lin(f"{base}.attn.rel_pos.mlp.fc1", bp["attn"]["rel_pos"]["fc1"])
            put_lin(f"{base}.attn.rel_pos.mlp.fc2", bp["attn"]["rel_pos"]["fc2"])
        if "ls1" in bp:
            sd[f"{base}.ls1.gamma"] = np.asarray(bp["ls1"])
            sd[f"{base}.ls2.gamma"] = np.asarray(bp["ls2"])
        put_ln(f"{base}.norm2", bp["norm2"])
        put_lin(f"{base}.mlp.fc1", bp["mlp"]["fc1"])
        put_lin(f"{base}.mlp.fc2", bp["mlp"]["fc2"])
    put_ln("trunk.norm", params["norm"])
    if "attn_pool" in params:
        ap = params["attn_pool"]
        sd["trunk.attn_pool.latent"] = np.asarray(ap["latent"])[None]
        put_lin("trunk.attn_pool.q", ap["q"])
        put_lin("trunk.attn_pool.kv", ap["kv"])
        put_lin("trunk.attn_pool.proj", ap["proj"])
        put_ln("trunk.attn_pool.norm", ap["norm"])
        put_lin("trunk.attn_pool.mlp.fc1", ap["mlp"]["fc1"])
        put_lin("trunk.attn_pool.mlp.fc2", ap["mlp"]["fc2"])
    if "head" in params:
        if "proj" in params["head"]:
            put_lin("head.proj", params["head"]["proj"])
        else:
            put_lin("head.mlp.fc1", params["head"]["mlp"]["fc1"])
            put_lin("head.mlp.fc2", params["head"]["mlp"]["fc2"])
    return sd


def timm_vit_state_dict_to_params(sd: Dict[str, np.ndarray], cfg: TimmViTCfg) -> Dict:
    ln = functools.partial(C.read_ln, sd)

    lin = functools.partial(C.read_linear, sd)

    params: Dict = {
        "patch_embed": {
            "kernel": jnp.asarray(np.transpose(
                np.asarray(sd["trunk.patch_embed.proj.weight"]), (2, 3, 1, 0))),
            "bias": jnp.asarray(np.asarray(sd["trunk.patch_embed.proj.bias"])),
        },
        "blocks": [],
        "norm": ln("trunk.norm"),
    }
    if "trunk.cls_token" in sd:
        params["cls_token"] = jnp.asarray(np.asarray(sd["trunk.cls_token"]).reshape(-1))
    if "trunk.pos_embed" in sd:
        params["pos_embed"] = jnp.asarray(np.asarray(sd["trunk.pos_embed"])[0])
    for i in range(cfg.layers):
        base = f"trunk.blocks.{i}"
        blk: Dict = {
            "norm1": ln(f"{base}.norm1"),
            "attn": {"qkv": lin(f"{base}.attn.qkv"), "proj": lin(f"{base}.attn.proj")},
            "norm2": ln(f"{base}.norm2"),
            "mlp": {"fc1": lin(f"{base}.mlp.fc1"), "fc2": lin(f"{base}.mlp.fc2")},
        }
        if f"{base}.attn.rel_pos.mlp.fc1.weight" in sd:
            blk["attn"]["rel_pos"] = {"fc1": lin(f"{base}.attn.rel_pos.mlp.fc1"),
                                      "fc2": lin(f"{base}.attn.rel_pos.mlp.fc2")}
        if f"{base}.ls1.gamma" in sd:
            blk["ls1"] = jnp.asarray(np.asarray(sd[f"{base}.ls1.gamma"]))
            blk["ls2"] = jnp.asarray(np.asarray(sd[f"{base}.ls2.gamma"]))
        params["blocks"].append(blk)
    if "trunk.attn_pool.latent" in sd:
        params["attn_pool"] = {
            "latent": jnp.asarray(np.asarray(sd["trunk.attn_pool.latent"])[0]),
            "q": lin("trunk.attn_pool.q"),
            "kv": lin("trunk.attn_pool.kv"),
            "proj": lin("trunk.attn_pool.proj"),
            "norm": ln("trunk.attn_pool.norm"),
            "mlp": {"fc1": lin("trunk.attn_pool.mlp.fc1"),
                    "fc2": lin("trunk.attn_pool.mlp.fc2")},
        }
    if "head.proj.weight" in sd:
        params["head"] = {"proj": lin("head.proj")}
    elif "head.mlp.fc1.weight" in sd:
        params["head"] = {"mlp": {"fc1": lin("head.mlp.fc1"), "fc2": lin("head.mlp.fc2")}}
    return params
