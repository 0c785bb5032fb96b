"""Native JAX ConvNeXt vision towers — the reference's convnext_* configs.

The reference builds these through timm (deps/open_clip/src/open_clip/
timm_model.py:60-107: ``timm.create_model('convnext_*')`` trunk with the
default avg-pool + head-LN classifier head reset to 0 features, followed by
a linear or Mlp projection head). timm is absent from this image, so this
is a from-scratch functional implementation of the same architecture
(Liu et al., "A ConvNet for the 2020s"):

- patch stem: 4x4/stride-4 conv + LayerNorm(eps 1e-6)
- 4 stages; stages 1-3 start with a downsample (LayerNorm + 2x2/stride-2
  conv); each block = 7x7 depthwise conv -> LN -> pointwise MLP (4x, GELU)
  -> LayerScale gamma -> stochastic-depth residual
- trunk head: global average pool + LayerNorm
- CLIP projection head: linear (timm_proj "linear") or Mlp with hidden
  2*embed_dim (timm_proj "mlp"), timm_model.py:101-106

Checkpoints use the open_clip TimmModel naming (``visual.trunk.*`` +
``visual.head.*``), so published convnext CLIP weights load once available.
Numerics oracle: tests/test_cross_impl_towers.py loads weights from
transformers' INDEPENDENT torch ConvNextModel and asserts feature-map and
pooled-feature parity; timm-vs-this golden parity on the published configs
additionally pends a timm-equipped environment (TODO.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import layers as L

# timm convnext variant table (depths / dims), timm/models/convnext.py
VARIANTS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}

LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ConvNeXtCfg:
    depths: Tuple[int, int, int, int]
    dims: Tuple[int, int, int, int]
    output_dim: int
    image_size: int = 256
    proj: str = "linear"  # timm_proj: linear | mlp | none
    drop_path_rate: float = 0.0
    timm_name: str = "convnext_base"

    @property
    def width(self) -> int:
        return self.dims[-1]

    @property
    def attentional_pool(self) -> bool:  # CLIPModel-facing shims
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def convnext_cfg_from_vision_dict(v: dict, embed_dim: int) -> ConvNeXtCfg:
    name = v["timm_model_name"]
    if name not in VARIANTS:
        raise NotImplementedError(
            f"timm tower {name!r} is not natively implemented (timm is absent "
            f"from this environment); native variants: {sorted(VARIANTS)}"
        )
    depths, dims = VARIANTS[name]
    return ConvNeXtCfg(
        depths=depths, dims=dims, output_dim=embed_dim,
        image_size=v.get("image_size", 256),
        proj=v.get("timm_proj", "linear") or "none",
        drop_path_rate=float(v.get("timm_drop_path") or 0.0),
        timm_name=name,
    )


# ---------------------------------------------------------------------------
# init


def _ln_init(dim):
    return L.layernorm_init(dim)


def _block_init(rng, dim: int, ls_init: float = 1e-6) -> Dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    # timm trunc-normal(.02) weights, zero biases
    return {
        "conv_dw": {
            "kernel": 0.02 * jax.random.truncated_normal(k1, -2, 2, (7, 7, 1, dim), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
        },
        "norm": _ln_init(dim),
        "mlp": {
            "fc1": {"kernel": 0.02 * jax.random.truncated_normal(k2, -2, 2, (dim, 4 * dim), jnp.float32),
                    "bias": jnp.zeros((4 * dim,), jnp.float32)},
            "fc2": {"kernel": 0.02 * jax.random.truncated_normal(k3, -2, 2, (4 * dim, dim), jnp.float32),
                    "bias": jnp.zeros((dim,), jnp.float32)},
        },
        "gamma": jnp.full((dim,), ls_init, jnp.float32),
    }


def convnext_init(rng, cfg: ConvNeXtCfg) -> Dict:
    keys = jax.random.split(rng, 8)
    dims = cfg.dims
    params: Dict = {
        "stem": {
            "conv": {"kernel": 0.02 * jax.random.truncated_normal(
                keys[0], -2, 2, (4, 4, 3, dims[0]), jnp.float32),
                "bias": jnp.zeros((dims[0],), jnp.float32)},
            "norm": _ln_init(dims[0]),
        },
        "stages": [],
        "head_norm": _ln_init(dims[-1]),
    }
    for s in range(4):
        stage: Dict = {"blocks": []}
        if s > 0:
            k = jax.random.fold_in(keys[1], s)
            stage["downsample"] = {
                "norm": _ln_init(dims[s - 1]),
                "conv": {"kernel": 0.02 * jax.random.truncated_normal(
                    k, -2, 2, (2, 2, dims[s - 1], dims[s]), jnp.float32),
                    "bias": jnp.zeros((dims[s],), jnp.float32)},
            }
        for b in range(cfg.depths[s]):
            rng, sub = jax.random.split(rng)
            stage["blocks"].append(_block_init(sub, dims[s]))
        params["stages"].append(stage)

    d, out = dims[-1], cfg.output_dim
    if cfg.proj == "linear":
        params["head"] = {"proj": {"kernel": 0.02 * jax.random.truncated_normal(
            keys[2], -2, 2, (d, out), jnp.float32)}}  # proj_bias=False default
    elif cfg.proj == "mlp":
        k1, k2 = jax.random.split(keys[3])
        params["head"] = {"mlp": {
            "fc1": {"kernel": 0.02 * jax.random.truncated_normal(k1, -2, 2, (d, 2 * out), jnp.float32),
                    "bias": jnp.zeros((2 * out,), jnp.float32)},
            "fc2": {"kernel": 0.02 * jax.random.truncated_normal(k2, -2, 2, (2 * out, out), jnp.float32)},
        }}
    return params


# ---------------------------------------------------------------------------
# forward


def _depthwise_conv(p, x, *, dtype=None):
    kernel = p["kernel"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return y + p["bias"].astype(y.dtype)


def _block_apply(p, x, *, dtype=None, drop_rate: float = 0.0,
                 train: bool = False, rng=None):
    shortcut = x
    y = _depthwise_conv(p["conv_dw"], x, dtype=dtype)
    y = L.layernorm_apply(p["norm"], y, eps=LN_EPS)
    y = L.linear_apply(p["mlp"]["fc1"], y, dtype=dtype)
    y = L.gelu(y)
    y = L.linear_apply(p["mlp"]["fc2"], y, dtype=dtype)
    y = y * p["gamma"].astype(y.dtype)
    if train and drop_rate > 0.0 and rng is not None:
        # stochastic depth (timm DropPath): per-sample Bernoulli keep,
        # rescaled by 1/keep_prob
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
        y = y * (mask.astype(y.dtype) / keep)
    return shortcut + y


def convnext_stage_names(cfg: ConvNeXtCfg) -> List[str]:
    names = ["stem"]
    for s, depth in enumerate(cfg.depths):
        names += [f"stages.{s}.{b}" for b in range(depth)]
    names.append("head")
    return names


def convnext_apply(
    params,
    x,
    cfg: ConvNeXtCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    stop: Optional[int] = None,
):
    """NHWC images -> (features (B, output_dim), intermediates)."""
    names = convnext_stage_names(cfg)
    stop = len(names) if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}

    y = L.conv_apply(params["stem"]["conv"], x, stride=4, dtype=dtype)
    y = L.layernorm_apply(params["stem"]["norm"], y, eps=LN_EPS)
    if "stem" in capture:
        inters["stem"] = y

    n_blocks = sum(cfg.depths)
    # timm: per-block drop-path rates linearly spaced 0 -> drop_path_rate
    rates = np.linspace(0.0, cfg.drop_path_rate, n_blocks) if n_blocks > 1 else [0.0]
    gi = 0
    stage_idx = 1  # position in `names`
    for s, stage in enumerate(params["stages"]):
        if s > 0:
            ds = stage["downsample"]
            y = L.layernorm_apply(ds["norm"], y, eps=LN_EPS)
            y = L.conv_apply(ds["conv"], y, stride=2, dtype=dtype)
        for b, bp in enumerate(stage["blocks"]):
            if stage_idx >= stop:
                return y, inters
            block_rng = (jax.random.fold_in(rng, gi)
                         if (rng is not None and train and cfg.drop_path_rate > 0) else None)
            fn = lambda p, inp: _block_apply(
                p, inp, dtype=dtype, drop_rate=float(rates[gi]), train=train, rng=block_rng)
            if remat:
                fn = jax.checkpoint(fn)
            y = fn(bp, y)
            name = f"stages.{s}.{b}"
            if name in capture:
                inters[name] = y
            gi += 1
            stage_idx += 1

    if stage_idx >= stop:
        return y, inters
    # trunk head: global avg pool + LN (timm NormMlpClassifierHead with
    # fc reset to Identity), then the open_clip projection head
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    pooled = L.layernorm_apply(params["head_norm"], pooled, eps=LN_EPS)
    if "head" not in params:
        out = pooled
    elif "proj" in params["head"]:
        out = L.linear_apply(params["head"]["proj"], pooled)
    else:
        h = L.linear_apply(params["head"]["mlp"]["fc1"], pooled)
        h = L.gelu(h)
        out = L.linear_apply(params["head"]["mlp"]["fc2"], h)
    if "head" in capture:
        inters["head"] = out
    return out, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge (visual.trunk.* / visual.head.*)


def convnext_params_to_state_dict(params, cfg: ConvNeXtCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def put_ln(dst, p):
        sd[f"{dst}.weight"] = np.asarray(p["scale"])
        sd[f"{dst}.bias"] = np.asarray(p["bias"])

    def put_conv(dst, p):  # NHWC HWIO -> torch OIHW
        sd[f"{dst}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        if "bias" in p:
            sd[f"{dst}.bias"] = np.asarray(p["bias"])

    def put_lin(dst, p):
        sd[f"{dst}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{dst}.bias"] = np.asarray(p["bias"])

    put_conv("trunk.stem.0", params["stem"]["conv"])
    put_ln("trunk.stem.1", params["stem"]["norm"])
    for s, stage in enumerate(params["stages"]):
        if s > 0:
            put_ln(f"trunk.stages.{s}.downsample.0", stage["downsample"]["norm"])
            put_conv(f"trunk.stages.{s}.downsample.1", stage["downsample"]["conv"])
        for b, bp in enumerate(stage["blocks"]):
            base = f"trunk.stages.{s}.blocks.{b}"
            put_conv(f"{base}.conv_dw", bp["conv_dw"])
            put_ln(f"{base}.norm", bp["norm"])
            put_lin(f"{base}.mlp.fc1", bp["mlp"]["fc1"])
            put_lin(f"{base}.mlp.fc2", bp["mlp"]["fc2"])
            sd[f"{base}.gamma"] = np.asarray(bp["gamma"])
    put_ln("trunk.head.norm", params["head_norm"])
    if "head" in params:
        if "proj" in params["head"]:
            put_lin("head.proj", params["head"]["proj"])
        else:
            put_lin("head.mlp.fc1", params["head"]["mlp"]["fc1"])
            put_lin("head.mlp.fc2", params["head"]["mlp"]["fc2"])
    return sd


def convnext_state_dict_to_params(sd: Dict[str, np.ndarray], cfg: ConvNeXtCfg) -> Dict:
    def ln(src):
        return {"scale": jnp.asarray(np.asarray(sd[f"{src}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{src}.bias"]))}

    def conv(src):
        p = {"kernel": jnp.asarray(np.transpose(np.asarray(sd[f"{src}.weight"]), (2, 3, 1, 0)))}
        if f"{src}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(sd[f"{src}.bias"]))
        return p

    def lin(src):
        p = {"kernel": jnp.asarray(np.asarray(sd[f"{src}.weight"]).T)}
        if f"{src}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(sd[f"{src}.bias"]))
        return p

    params: Dict = {
        "stem": {"conv": conv("trunk.stem.0"), "norm": ln("trunk.stem.1")},
        "stages": [],
        "head_norm": ln("trunk.head.norm"),
    }
    for s in range(4):
        stage: Dict = {"blocks": []}
        if s > 0:
            stage["downsample"] = {"norm": ln(f"trunk.stages.{s}.downsample.0"),
                                   "conv": conv(f"trunk.stages.{s}.downsample.1")}
        for b in range(cfg.depths[s]):
            base = f"trunk.stages.{s}.blocks.{b}"
            stage["blocks"].append({
                "conv_dw": conv(f"{base}.conv_dw"),
                "norm": ln(f"{base}.norm"),
                "mlp": {"fc1": lin(f"{base}.mlp.fc1"), "fc2": lin(f"{base}.mlp.fc2")},
                "gamma": jnp.asarray(np.asarray(sd[f"{base}.gamma"])),
            })
        params["stages"].append(stage)
    if "head.proj.weight" in sd:
        params["head"] = {"proj": lin("head.proj")}
    elif "head.mlp.fc1.weight" in sd:
        params["head"] = {"mlp": {"fc1": lin("head.mlp.fc1"), "fc2": lin("head.mlp.fc2")}}
    return params
