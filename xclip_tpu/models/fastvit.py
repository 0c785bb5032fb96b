"""Native JAX FastViT/MCi vision towers — the reference's MobileCLIP-S1/S2.

The reference builds these through timm (deps/open_clip/src/open_clip/
timm_model.py:57-72): ``timm_pool='avg'`` + ``timm_proj: null`` make the
trunk's classifier (``visual.trunk.head.fc``) the CLIP projection. timm is
absent from this image, so this is a from-scratch functional implementation
of the timm ``fastvit.py`` MCi variants (FastViT, arXiv:2303.14189;
MobileCLIP, arXiv:2311.17049), in the TRAIN-TIME (unfused) structure so
published unfused checkpoints load:

- MobileOne blocks: sum of an identity BN branch (when shapes allow), a
  k x k conv+BN branch and a 1x1 conv+BN "scale" branch, then optional SE
  and GELU — the classic reparameterizable over-parameterization
- stem: 3 MobileOne blocks (3x3/s2, 3x3/s2 depthwise, 1x1)
- 4 stages: RepMixer token mixing (BN-branch difference form
  ``x + gamma * (mixer(x) - norm(x))``) in stages 0-2, BN+MHSA (head dim
  32, bias-free qkv) in stage 3 with a reparam conditional position
  encoding (7x7 depthwise conv + identity) at stage entry; every block
  ends with a ConvMlp (7x7 depthwise conv+BN, 1x1 expand, GELU, 1x1
  project) under a LayerScale
- downsamples: reparam large-kernel conv (7x7 + 3x3 grouped conv+BN
  branches, SE on stages 2-3 for MCi, GELU) + a 1x1 MobileOne block
- final_conv: grouped 3x3 MobileOne block expanding 2x with SE
- head: global avg pool + ``head.fc``

BatchNorm makes this family STATEFUL (running stats in the state pytree).
Checkpoints use the open_clip TimmModel naming (``visual.trunk.*``).
Numerics are pinned by an independent full-forward numpy oracle
(tests/oracles/np_fastvit.py via tests/test_tower_oracles.py: stem,
RepMixer difference form, attention stage + CPE, SE, LayerScale, eval BN)
in addition to the state-dict round-trip and committed goldens;
published-weight parity remains pending a timm-equipped environment
(TODO.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import layers as L

HAS_STATE = True
LS_INIT = 1e-5  # LayerScale init (timm fastvit layer_scale_init_value)

# timm fastvit MCi variant table (fastvit.py model entrypoints)
VARIANTS = {
    "fastvit_mci1": dict(depths=(4, 12, 20, 4), dims=(64, 128, 256, 512)),
    "fastvit_mci2": dict(depths=(4, 12, 24, 4), dims=(80, 160, 320, 640)),
}

MLP_RATIO = 3.0
SE_DOWNSAMPLES = (False, False, True, True)
TOKEN_MIXERS = ("repmixer", "repmixer", "repmixer", "attention")
CLS_RATIO = 2.0
ATTN_HEAD_DIM = 32


@dataclasses.dataclass(frozen=True)
class FastViTCfg:
    timm_name: str
    output_dim: int
    image_size: int = 256
    depths: Tuple[int, ...] = (4, 12, 20, 4)
    dims: Tuple[int, ...] = (64, 128, 256, 512)
    drop_path_rate: float = 0.0  # timm_drop_path (linear per-block ramp)

    @property
    def num_features(self) -> int:
        return int(self.dims[-1] * CLS_RATIO)

    @property
    def width(self) -> int:
        return self.num_features

    # CLIPModel-facing shims
    @property
    def attentional_pool(self) -> bool:
        return False

    @property
    def patch_dropout(self) -> float:
        return 0.0


def fastvit_cfg_from_vision_dict(v: dict, embed_dim: int) -> FastViTCfg:
    name = v["timm_model_name"]
    return FastViTCfg(timm_name=name, output_dim=embed_dim,
                      image_size=v.get("image_size", 256),
                      drop_path_rate=float(v.get("timm_drop_path") or 0.0),
                      **VARIANTS[name])


# ---------------------------------------------------------------------------
# init helpers — every conv+BN pair is {"conv": .., "bn": ..} with a state
# subtree of the same path holding the running stats


def _trunc(rng, shape, std=0.02):
    return std * jax.random.truncated_normal(rng, -2, 2, shape, jnp.float32)


def _convbn_init(rng, k, cin, cout, *, groups=1):
    bn_p, bn_s = L.batchnorm_init(cout)
    return ({"conv": {"kernel": _trunc(rng, (k, k, cin // groups, cout))},
             "bn": bn_p},
            {"bn": bn_s})


def _make_divisible(v: float, divisor: int = 8) -> int:
    """timm make_divisible: nearest multiple of 8, never below 90% of v."""
    nv = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if nv < 0.9 * v:
        nv += divisor
    return nv


def _se_init(rng, dim, rd_ratio=1 / 16):
    """timm SqueezeExcite: hidden = make_divisible(dim * rd_ratio, 8).
    MobileOne blocks use the 1/16 default; ReparamLargeKernelConv uses
    rd_ratio=0.25 (timm fastvit.py)."""
    k1, k2 = jax.random.split(rng)
    hidden = _make_divisible(dim * rd_ratio)
    return {"fc1": {"kernel": _trunc(k1, (1, 1, dim, hidden)),
                    "bias": jnp.zeros((hidden,), jnp.float32)},
            "fc2": {"kernel": _trunc(k2, (1, 1, hidden, dim)),
                    "bias": jnp.zeros((dim,), jnp.float32)}}


def _mobileone_init(rng, k, cin, cout, *, stride=1, groups=1, use_se=False,
                    scale_branch=True, conv_branch=True):
    """MobileOneBlock params/state: identity BN (stride-1 same-shape only)
    + conv_kxk.0 + conv_scale (k>1)."""
    keys = jax.random.split(rng, 4)
    p: Dict = {}
    s: Dict = {}
    if conv_branch:
        cp, cs = _convbn_init(keys[0], k, cin, cout, groups=groups)
        p["conv_kxk"] = [cp]
        s["conv_kxk"] = [cs]
    if k > 1 and scale_branch:
        cp, cs = _convbn_init(keys[1], 1, cin, cout, groups=groups)
        p["conv_scale"] = cp
        s["conv_scale"] = cs
    if cout == cin and stride == 1:
        bn_p, bn_s = L.batchnorm_init(cout)
        p["identity"] = bn_p
        s["identity"] = bn_s
    if use_se:
        p["se"] = _se_init(keys[2], cout)
    return p, s


def _lkc_init(rng, cin, cout, *, use_se=False):
    """ReparamLargeKernelConv: 7x7 + 3x3 grouped conv+BN branches."""
    k1, k2, k3 = jax.random.split(rng, 3)
    lp, ls = _convbn_init(k1, 7, cin, cout, groups=cin)
    sp, ss = _convbn_init(k2, 3, cin, cout, groups=cin)
    p: Dict = {"large_conv": lp, "small_conv": sp}
    s: Dict = {"large_conv": ls, "small_conv": ss}
    if use_se:
        p["se"] = _se_init(k3, cout, rd_ratio=0.25)
    return p, s


def _convmlp_init(rng, dim):
    k1, k2, k3 = jax.random.split(rng, 3)
    hidden = int(dim * MLP_RATIO)
    cp, cs = _convbn_init(k1, 7, dim, dim, groups=dim)
    p = {"conv": cp,
         "fc1": {"kernel": _trunc(k2, (1, 1, dim, hidden)),
                 "bias": jnp.zeros((hidden,), jnp.float32)},
         "fc2": {"kernel": _trunc(k3, (1, 1, hidden, dim)),
                 "bias": jnp.zeros((dim,), jnp.float32)}}
    return p, {"conv": cs}


def _repmixer_block_init(rng, dim):
    k1, k2, k3 = jax.random.split(rng, 3)
    # RepMixer: norm = identity-BN-only MobileOne; mixer = dw conv + scale
    norm_p, norm_s = _mobileone_init(k1, 3, dim, dim, groups=dim,
                                     scale_branch=False, conv_branch=False)
    mix_p, mix_s = _mobileone_init(k2, 3, dim, dim, groups=dim)
    mlp_p, mlp_s = _convmlp_init(k3, dim)
    p = {"token_mixer": {"norm": norm_p, "mixer": mix_p,
                         "layer_scale": {"gamma": jnp.full((dim,), LS_INIT, jnp.float32)}},
         "mlp": mlp_p,
         "layer_scale": {"gamma": jnp.full((dim,), LS_INIT, jnp.float32)}}
    s = {"token_mixer": {"norm": norm_s, "mixer": mix_s}, "mlp": mlp_s}
    return p, s


def _attention_block_init(rng, dim):
    k1, k2, k3 = jax.random.split(rng, 3)
    bn_p, bn_s = L.batchnorm_init(dim)
    p = {"norm": bn_p,
         "token_mixer": {"qkv": {"kernel": _trunc(k1, (dim, 3 * dim))},
                         "proj": {"kernel": _trunc(k2, (dim, dim)),
                                  "bias": jnp.zeros((dim,), jnp.float32)}},
         "layer_scale_1": {"gamma": jnp.full((dim,), LS_INIT, jnp.float32)},
         "mlp": None,
         "layer_scale_2": {"gamma": jnp.full((dim,), LS_INIT, jnp.float32)}}
    mlp_p, mlp_s = _convmlp_init(k3, dim)
    p["mlp"] = mlp_p
    s = {"norm": bn_s, "mlp": mlp_s}
    return p, s


def fastvit_init(rng, cfg: FastViTCfg) -> Tuple[Dict, Dict]:
    keys = jax.random.split(rng, 8)
    d0 = cfg.dims[0]
    s0p, s0s = _mobileone_init(keys[0], 3, 3, d0, stride=2)
    s1p, s1s = _mobileone_init(keys[1], 3, d0, d0, stride=2, groups=d0)
    s2p, s2s = _mobileone_init(keys[2], 1, d0, d0)
    params: Dict = {"stem": [s0p, s1p, s2p], "stages": []}
    state: Dict = {"stem": [s0s, s1s, s2s], "stages": []}

    prev = d0
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        sp: Dict = {}
        ss: Dict = {}
        if i > 0 or prev != dim:
            k = jax.random.fold_in(keys[3], i)
            lkc_p, lkc_s = _lkc_init(k, prev, dim, use_se=SE_DOWNSAMPLES[i])
            mo_p, mo_s = _mobileone_init(jax.random.fold_in(k, 1), 1, dim, dim)
            sp["downsample"] = {"proj": [lkc_p, mo_p]}
            ss["downsample"] = {"proj": [lkc_s, mo_s]}
        if TOKEN_MIXERS[i] == "attention":
            k = jax.random.fold_in(keys[4], i)
            sp["pos_emb"] = {"pos_enc": {
                "kernel": _trunc(k, (7, 7, 1, dim)),
                "bias": jnp.zeros((dim,), jnp.float32)}}
        sp["blocks"] = []
        ss["blocks"] = []
        for _ in range(depth):
            rng, sub = jax.random.split(rng)
            if TOKEN_MIXERS[i] == "attention":
                bp, bs = _attention_block_init(sub, dim)
            else:
                bp, bs = _repmixer_block_init(sub, dim)
            sp["blocks"].append(bp)
            ss["blocks"].append(bs)
        params["stages"].append(sp)
        state["stages"].append(ss)
        prev = dim

    fc_p, fc_s = _mobileone_init(keys[5], 3, cfg.dims[-1], cfg.num_features,
                                 groups=cfg.dims[-1], use_se=True)
    params["final_conv"] = fc_p
    state["final_conv"] = fc_s
    params["head"] = {"fc": {"kernel": _trunc(keys[6], (cfg.num_features, cfg.output_dim)),
                             "bias": jnp.zeros((cfg.output_dim,), jnp.float32)}}
    return params, state


# ---------------------------------------------------------------------------
# forward


def _conv(kernel, x, *, stride=1, groups=1, dtype=None, bias=None):
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    k = kernel.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _convbn(p, s, x, *, stride=1, groups=1, train=False, dtype=None):
    y = _conv(p["conv"]["kernel"], x, stride=stride, groups=groups, dtype=dtype)
    y, bn = L.batchnorm_apply(p["bn"], s["bn"], y, train=train)
    return y, {"bn": bn}


def _se(p, x):
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    a = _conv(p["fc1"]["kernel"], pooled, bias=p["fc1"]["bias"])
    a = jax.nn.relu(a)
    a = _conv(p["fc2"]["kernel"], a, bias=p["fc2"]["bias"])
    return x * jax.nn.sigmoid(a).astype(x.dtype)


def _mobileone(p, s, x, *, stride=1, groups=1, act=True, train=False, dtype=None):
    new_s: Dict = {}
    out = None
    if "identity" in p:
        y, bn = L.batchnorm_apply(p["identity"], s["identity"], x, train=train)
        new_s["identity"] = bn
        out = y
    if "conv_scale" in p:
        y, cs = _convbn(p["conv_scale"], s["conv_scale"], x, stride=stride,
                        groups=groups, train=train, dtype=dtype)
        new_s["conv_scale"] = cs
        out = y if out is None else out + y
    if "conv_kxk" in p:
        ks = []
        for bp, bs in zip(p["conv_kxk"], s["conv_kxk"]):
            y, c = _convbn(bp, bs, x, stride=stride, groups=groups,
                           train=train, dtype=dtype)
            ks.append(c)
            out = y if out is None else out + y
        new_s["conv_kxk"] = ks
    if "se" in p:
        out = _se(p["se"], out)
    if act:
        out = L.gelu(out)
    return out, new_s


def _lkc(p, s, x, *, groups, train=False, dtype=None):
    yl, ls_ = _convbn(p["large_conv"], s["large_conv"], x, stride=2,
                      groups=groups, train=train, dtype=dtype)
    ys, ss_ = _convbn(p["small_conv"], s["small_conv"], x, stride=2,
                      groups=groups, train=train, dtype=dtype)
    out = yl + ys
    if "se" in p:
        out = _se(p["se"], out)
    out = L.gelu(out)  # MCi: lkc_use_act=True
    return out, {"large_conv": ls_, "small_conv": ss_}


def _convmlp(p, s, x, *, train=False, dtype=None):
    dim = x.shape[-1]
    y, cs = _convbn(p["conv"], s["conv"], x, groups=dim, train=train, dtype=dtype)
    y = _conv(p["fc1"]["kernel"], y, bias=p["fc1"]["bias"], dtype=dtype)
    y = L.gelu(y)
    y = _conv(p["fc2"]["kernel"], y, bias=p["fc2"]["bias"], dtype=dtype)
    return y, {"conv": cs}


def _gamma(p, y):
    return y * p["gamma"].astype(y.dtype)


def _drop_path(y, rate: float, train: bool, rng):
    """timm DropPath: per-sample Bernoulli keep, rescaled by 1/keep."""
    if train and rate > 0.0 and rng is not None:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, (y.shape[0],) + (1,) * (y.ndim - 1))
        return y * (mask.astype(y.dtype) / keep)
    return y


def _repmixer_block(p, s, x, *, train=False, dtype=None, drop_rate=0.0, rng=None):
    dim = x.shape[-1]
    tm, tms = p["token_mixer"], s["token_mixer"]
    normed, ns = _mobileone(tm["norm"], tms["norm"], x, groups=dim, act=False,
                            train=train, dtype=dtype)
    mixed, ms = _mobileone(tm["mixer"], tms["mixer"], x, groups=dim, act=False,
                           train=train, dtype=dtype)
    # the RepMixer-internal residual carries no drop-path (timm RepMixer);
    # only the ConvMlp residual is dropped (RepMixerBlock)
    x = x + _gamma(tm["layer_scale"], mixed - normed)
    y, mlps = _convmlp(p["mlp"], s["mlp"], x, train=train, dtype=dtype)
    x = x + _drop_path(_gamma(p["layer_scale"], y), drop_rate, train, rng)
    return x, {"token_mixer": {"norm": ns, "mixer": ms}, "mlp": mlps}


def _attention_block(p, s, x, *, train=False, dtype=None, drop_rate=0.0, rng=None):
    b, h, w, dim = x.shape
    y, bn = L.batchnorm_apply(p["norm"], s["norm"], x, train=train)
    tokens = y.reshape(b, h * w, dim)
    if dtype is not None:
        tokens = tokens.astype(dtype)
    qkv = tokens @ p["token_mixer"]["qkv"]["kernel"].astype(tokens.dtype)
    q, k, v = qkv[..., :dim], qkv[..., dim:2 * dim], qkv[..., 2 * dim:]
    o = L.attention(q, k, v, num_heads=dim // ATTN_HEAD_DIM)
    o = o @ p["token_mixer"]["proj"]["kernel"].astype(o.dtype)
    o = o + p["token_mixer"]["proj"]["bias"].astype(o.dtype)
    r1 = _gamma(p["layer_scale_1"], o.reshape(b, h, w, dim))
    x = x + _drop_path(r1, drop_rate, train,
                       jax.random.fold_in(rng, 1) if rng is not None else None)
    y, mlps = _convmlp(p["mlp"], s["mlp"], x, train=train, dtype=dtype)
    x = x + _drop_path(_gamma(p["layer_scale_2"], y), drop_rate, train,
                       jax.random.fold_in(rng, 2) if rng is not None else None)
    return x, {"norm": bn, "mlp": mlps}


def fastvit_stage_names(cfg: FastViTCfg) -> List[str]:
    names = ["stem"]
    for i, depth in enumerate(cfg.depths):
        names += [f"stages.{i}.{b}" for b in range(depth)]
    names += ["final", "pool"]
    return names


def fastvit_apply(
    params,
    state,
    x,
    cfg: FastViTCfg,
    *,
    dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    stop: Optional[int] = None,
):
    """NHWC images -> (features (B, output_dim), new_state, intermediates)."""
    names = fastvit_stage_names(cfg)
    stop = len(names) if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}
    # pre-populate with the incoming state so early `stop` returns stay
    # structurally complete (the HAS_STATE contract: new_state always has
    # the same treedef as state); visited nodes are overwritten below
    new_state: Dict = {
        "stem": list(state["stem"]),
        "stages": [dict(ss, blocks=list(ss["blocks"])) for ss in state["stages"]],
        "final_conv": state["final_conv"],
    }

    d0 = cfg.dims[0]
    y = x
    for j, (sp, ss, stride, groups, k) in enumerate(
            zip(params["stem"], state["stem"], (2, 2, 1), (1, d0, 1), (3, 3, 1))):
        y, ns = _mobileone(sp, ss, y, stride=stride, groups=groups,
                           train=train, dtype=dtype)
        new_state["stem"][j] = ns
    if "stem" in capture:
        inters["stem"] = y

    idx = 1
    prev = d0
    n_blocks = sum(cfg.depths)
    # timm: per-block drop-path rates linearly spaced 0 -> drop_path_rate
    rates = np.linspace(0.0, cfg.drop_path_rate, n_blocks) if n_blocks > 1 else [0.0]
    gi = 0
    for i, (sp, ss) in enumerate(zip(params["stages"], state["stages"])):
        nss = new_state["stages"][i]
        if idx >= stop:
            return y, new_state, inters
        if "downsample" in sp:
            lkc_p, mo_p = sp["downsample"]["proj"]
            lkc_s, mo_s = ss["downsample"]["proj"]
            y, l0 = _lkc(lkc_p, lkc_s, y, groups=prev, train=train, dtype=dtype)
            y, l1 = _mobileone(mo_p, mo_s, y, train=train, dtype=dtype)
            nss["downsample"] = {"proj": [l0, l1]}
        if "pos_emb" in sp:
            pe = sp["pos_emb"]["pos_enc"]
            dim = y.shape[-1]
            y = y + _conv(pe["kernel"], y, groups=dim, bias=pe["bias"], dtype=dtype)
        block_fn = (_attention_block if TOKEN_MIXERS[i] == "attention"
                    else _repmixer_block)
        for b, (bp, bs) in enumerate(zip(sp["blocks"], ss["blocks"])):
            if idx >= stop:
                return y, new_state, inters
            block_rng = (jax.random.fold_in(rng, gi)
                         if (rng is not None and train and cfg.drop_path_rate > 0)
                         else None)
            rate = float(rates[gi])
            fn = lambda p, st, inp: block_fn(p, st, inp, train=train, dtype=dtype,
                                             drop_rate=rate, rng=block_rng)
            if remat:
                fn = jax.checkpoint(fn)
            y, nbs = fn(bp, bs, y)
            nss["blocks"][b] = nbs
            if f"stages.{i}.{b}" in capture:
                inters[f"stages.{i}.{b}"] = y
            idx += 1
            gi += 1
        prev = cfg.dims[i]

    if idx >= stop:
        return y, new_state, inters
    y, fs = _mobileone(params["final_conv"], state["final_conv"], y,
                       groups=cfg.dims[-1], train=train, dtype=dtype)
    new_state["final_conv"] = fs
    if "final" in capture:
        inters["final"] = y
    idx += 1
    if idx >= stop:
        return y, new_state, inters
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # timm_pool='avg'
    out = pooled @ params["head"]["fc"]["kernel"] + params["head"]["fc"]["bias"]
    if "pool" in capture:
        inters["pool"] = out
    return out, new_state, inters


# ---------------------------------------------------------------------------
# open_clip TimmModel state-dict bridge (visual.trunk.*; BN stats included)


def _put_convbn(sd, dst, p, s):
    sd[f"{dst}.conv.weight"] = np.transpose(np.asarray(p["conv"]["kernel"]), (3, 2, 0, 1))
    sd[f"{dst}.bn.weight"] = np.asarray(p["bn"]["scale"])
    sd[f"{dst}.bn.bias"] = np.asarray(p["bn"]["bias"])
    sd[f"{dst}.bn.running_mean"] = np.asarray(s["bn"]["mean"])
    sd[f"{dst}.bn.running_var"] = np.asarray(s["bn"]["var"])
    sd[f"{dst}.bn.num_batches_tracked"] = np.asarray(0, np.int64)


def _put_se(sd, dst, p):
    for fc in ("fc1", "fc2"):
        sd[f"{dst}.{fc}.weight"] = np.transpose(np.asarray(p[fc]["kernel"]), (3, 2, 0, 1))
        sd[f"{dst}.{fc}.bias"] = np.asarray(p[fc]["bias"])


def _put_bn(sd, dst, p, s):
    sd[f"{dst}.weight"] = np.asarray(p["scale"])
    sd[f"{dst}.bias"] = np.asarray(p["bias"])
    sd[f"{dst}.running_mean"] = np.asarray(s["mean"])
    sd[f"{dst}.running_var"] = np.asarray(s["var"])
    sd[f"{dst}.num_batches_tracked"] = np.asarray(0, np.int64)


def _put_mobileone(sd, dst, p, s):
    if "identity" in p:
        _put_bn(sd, f"{dst}.identity", p["identity"], s["identity"])
    if "conv_scale" in p:
        _put_convbn(sd, f"{dst}.conv_scale", p["conv_scale"], s["conv_scale"])
    if "conv_kxk" in p:
        for j, (bp, bs) in enumerate(zip(p["conv_kxk"], s["conv_kxk"])):
            _put_convbn(sd, f"{dst}.conv_kxk.{j}", bp, bs)
    if "se" in p:
        _put_se(sd, f"{dst}.se", p["se"])


def _put_convmlp(sd, dst, p, s):
    _put_convbn(sd, f"{dst}.conv", p["conv"], s["conv"])
    for fc in ("fc1", "fc2"):
        sd[f"{dst}.{fc}.weight"] = np.transpose(np.asarray(p[fc]["kernel"]), (3, 2, 0, 1))
        sd[f"{dst}.{fc}.bias"] = np.asarray(p[fc]["bias"])


def fastvit_pytrees_to_state_dict(params, state, cfg: FastViTCfg) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for j, (sp, ss) in enumerate(zip(params["stem"], state["stem"])):
        _put_mobileone(sd, f"trunk.stem.{j}", sp, ss)
    for i, (sp, ss) in enumerate(zip(params["stages"], state["stages"])):
        base = f"trunk.stages.{i}"
        if "downsample" in sp:
            lkc_p, mo_p = sp["downsample"]["proj"]
            lkc_s, mo_s = ss["downsample"]["proj"]
            _put_convbn(sd, f"{base}.downsample.proj.0.large_conv", lkc_p["large_conv"], lkc_s["large_conv"])
            _put_convbn(sd, f"{base}.downsample.proj.0.small_conv", lkc_p["small_conv"], lkc_s["small_conv"])
            if "se" in lkc_p:
                _put_se(sd, f"{base}.downsample.proj.0.se", lkc_p["se"])
            _put_mobileone(sd, f"{base}.downsample.proj.1", mo_p, mo_s)
        if "pos_emb" in sp:
            pe = sp["pos_emb"]["pos_enc"]
            sd[f"{base}.pos_emb.pos_enc.weight"] = np.transpose(
                np.asarray(pe["kernel"]), (3, 2, 0, 1))
            sd[f"{base}.pos_emb.pos_enc.bias"] = np.asarray(pe["bias"])
        for b, (bp, bs) in enumerate(zip(sp["blocks"], ss["blocks"])):
            blk = f"{base}.blocks.{b}"
            if TOKEN_MIXERS[i] == "attention":
                _put_bn(sd, f"{blk}.norm", bp["norm"], bs["norm"])
                sd[f"{blk}.token_mixer.qkv.weight"] = np.asarray(
                    bp["token_mixer"]["qkv"]["kernel"]).T
                sd[f"{blk}.token_mixer.proj.weight"] = np.asarray(
                    bp["token_mixer"]["proj"]["kernel"]).T
                sd[f"{blk}.token_mixer.proj.bias"] = np.asarray(
                    bp["token_mixer"]["proj"]["bias"])
                sd[f"{blk}.layer_scale_1.gamma"] = np.asarray(bp["layer_scale_1"]["gamma"])
                sd[f"{blk}.layer_scale_2.gamma"] = np.asarray(bp["layer_scale_2"]["gamma"])
            else:
                tm, tms = bp["token_mixer"], bs["token_mixer"]
                _put_mobileone(sd, f"{blk}.token_mixer.norm", tm["norm"], tms["norm"])
                _put_mobileone(sd, f"{blk}.token_mixer.mixer", tm["mixer"], tms["mixer"])
                sd[f"{blk}.token_mixer.layer_scale.gamma"] = np.asarray(
                    tm["layer_scale"]["gamma"])
                sd[f"{blk}.layer_scale.gamma"] = np.asarray(bp["layer_scale"]["gamma"])
            _put_convmlp(sd, f"{blk}.mlp", bp["mlp"], bs["mlp"])
    _put_mobileone(sd, "trunk.final_conv", params["final_conv"], state["final_conv"])
    sd["trunk.head.fc.weight"] = np.asarray(params["head"]["fc"]["kernel"]).T
    sd["trunk.head.fc.bias"] = np.asarray(params["head"]["fc"]["bias"])
    return sd


def _get_convbn(sd, src):
    return ({"conv": {"kernel": jnp.asarray(np.transpose(
                np.asarray(sd[f"{src}.conv.weight"]), (2, 3, 1, 0)))},
             "bn": {"scale": jnp.asarray(np.asarray(sd[f"{src}.bn.weight"])),
                    "bias": jnp.asarray(np.asarray(sd[f"{src}.bn.bias"]))}},
            {"bn": {"mean": jnp.asarray(np.asarray(sd[f"{src}.bn.running_mean"])),
                    "var": jnp.asarray(np.asarray(sd[f"{src}.bn.running_var"]))}})


def _get_se(sd, src):
    return {fc: {"kernel": jnp.asarray(np.transpose(np.asarray(sd[f"{src}.{fc}.weight"]), (2, 3, 1, 0))),
                 "bias": jnp.asarray(np.asarray(sd[f"{src}.{fc}.bias"]))}
            for fc in ("fc1", "fc2")}


def _get_bn(sd, src):
    return ({"scale": jnp.asarray(np.asarray(sd[f"{src}.weight"])),
             "bias": jnp.asarray(np.asarray(sd[f"{src}.bias"]))},
            {"mean": jnp.asarray(np.asarray(sd[f"{src}.running_mean"])),
             "var": jnp.asarray(np.asarray(sd[f"{src}.running_var"]))})


def _get_mobileone(sd, src):
    p: Dict = {}
    s: Dict = {}
    if f"{src}.identity.weight" in sd:
        p["identity"], s["identity"] = _get_bn(sd, f"{src}.identity")
    if f"{src}.conv_scale.conv.weight" in sd:
        p["conv_scale"], s["conv_scale"] = _get_convbn(sd, f"{src}.conv_scale")
    j, ks_p, ks_s = 0, [], []
    while f"{src}.conv_kxk.{j}.conv.weight" in sd:
        cp, cs = _get_convbn(sd, f"{src}.conv_kxk.{j}")
        ks_p.append(cp)
        ks_s.append(cs)
        j += 1
    if ks_p:
        p["conv_kxk"], s["conv_kxk"] = ks_p, ks_s
    if f"{src}.se.fc1.weight" in sd:
        p["se"] = _get_se(sd, f"{src}.se")
    return p, s


def _get_convmlp(sd, src):
    cp, cs = _get_convbn(sd, f"{src}.conv")
    p = {"conv": cp}
    for fc in ("fc1", "fc2"):
        p[fc] = {"kernel": jnp.asarray(np.transpose(np.asarray(sd[f"{src}.{fc}.weight"]), (2, 3, 1, 0))),
                 "bias": jnp.asarray(np.asarray(sd[f"{src}.{fc}.bias"]))}
    return p, {"conv": cs}


def fastvit_state_dict_to_pytrees(sd: Dict[str, np.ndarray], cfg: FastViTCfg) -> Tuple[Dict, Dict]:
    params: Dict = {"stem": [], "stages": []}
    state: Dict = {"stem": [], "stages": []}
    for j in range(3):
        p, s = _get_mobileone(sd, f"trunk.stem.{j}")
        params["stem"].append(p)
        state["stem"].append(s)
    for i, depth in enumerate(cfg.depths):
        base = f"trunk.stages.{i}"
        sp: Dict = {"blocks": []}
        ss: Dict = {"blocks": []}
        if f"{base}.downsample.proj.0.large_conv.conv.weight" in sd:
            lkc_p: Dict = {}
            lkc_s: Dict = {}
            lkc_p["large_conv"], lkc_s["large_conv"] = _get_convbn(
                sd, f"{base}.downsample.proj.0.large_conv")
            lkc_p["small_conv"], lkc_s["small_conv"] = _get_convbn(
                sd, f"{base}.downsample.proj.0.small_conv")
            if f"{base}.downsample.proj.0.se.fc1.weight" in sd:
                lkc_p["se"] = _get_se(sd, f"{base}.downsample.proj.0.se")
            mo_p, mo_s = _get_mobileone(sd, f"{base}.downsample.proj.1")
            sp["downsample"] = {"proj": [lkc_p, mo_p]}
            ss["downsample"] = {"proj": [lkc_s, mo_s]}
        if f"{base}.pos_emb.pos_enc.weight" in sd:
            sp["pos_emb"] = {"pos_enc": {
                "kernel": jnp.asarray(np.transpose(
                    np.asarray(sd[f"{base}.pos_emb.pos_enc.weight"]), (2, 3, 1, 0))),
                "bias": jnp.asarray(np.asarray(sd[f"{base}.pos_emb.pos_enc.bias"]))}}
        for b in range(depth):
            blk = f"{base}.blocks.{b}"
            if TOKEN_MIXERS[i] == "attention":
                bp: Dict = {"token_mixer": {}}
                bs: Dict = {}
                bp["norm"], bs["norm"] = _get_bn(sd, f"{blk}.norm")
                bp["token_mixer"]["qkv"] = {"kernel": jnp.asarray(
                    np.asarray(sd[f"{blk}.token_mixer.qkv.weight"]).T)}
                bp["token_mixer"]["proj"] = {
                    "kernel": jnp.asarray(np.asarray(sd[f"{blk}.token_mixer.proj.weight"]).T),
                    "bias": jnp.asarray(np.asarray(sd[f"{blk}.token_mixer.proj.bias"]))}
                bp["layer_scale_1"] = {"gamma": jnp.asarray(
                    np.asarray(sd[f"{blk}.layer_scale_1.gamma"]).reshape(-1))}
                bp["layer_scale_2"] = {"gamma": jnp.asarray(
                    np.asarray(sd[f"{blk}.layer_scale_2.gamma"]).reshape(-1))}
            else:
                bp = {"token_mixer": {}}
                bs = {"token_mixer": {}}
                bp["token_mixer"]["norm"], bs["token_mixer"]["norm"] = _get_mobileone(
                    sd, f"{blk}.token_mixer.norm")
                bp["token_mixer"]["mixer"], bs["token_mixer"]["mixer"] = _get_mobileone(
                    sd, f"{blk}.token_mixer.mixer")
                bp["token_mixer"]["layer_scale"] = {"gamma": jnp.asarray(
                    np.asarray(sd[f"{blk}.token_mixer.layer_scale.gamma"]).reshape(-1))}
                bp["layer_scale"] = {"gamma": jnp.asarray(
                    np.asarray(sd[f"{blk}.layer_scale.gamma"]).reshape(-1))}
            bp["mlp"], mlp_s = _get_convmlp(sd, f"{blk}.mlp")
            bs["mlp"] = mlp_s
            sp["blocks"].append(bp)
            ss["blocks"].append(bs)
        params["stages"].append(sp)
        state["stages"].append(ss)
    params["final_conv"], state["final_conv"] = _get_mobileone(sd, "trunk.final_conv")
    params["head"] = {"fc": {
        "kernel": jnp.asarray(np.asarray(sd["trunk.head.fc.weight"]).T),
        "bias": jnp.asarray(np.asarray(sd["trunk.head.fc.bias"]))}}
    return params, state
