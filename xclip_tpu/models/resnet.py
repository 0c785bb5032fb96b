"""ModifiedResNet visual tower (RN50/RN101/RN50x4...) — TPU-native.

Functional re-design of CLIP's anti-aliased ResNet (reference behaviour:
deps/open_clip/src/open_clip/modified_resnet.py):

- 3-conv stem with an average pool, then 4 bottleneck stages where strided
  convs are replaced by avgpool+conv, and a final AttentionPool2d.
- NHWC layout end to end (TPU conv layout); fp32 batch-norm with running
  stats carried as an explicit state pytree; per-device batch statistics in
  training (the reference default is DDP without SyncBatchNorm).
- The forward pass is decomposed into named *stages* so any prefix/suffix of
  the network can be run independently — the single mechanism behind
  grad-checkpoint boundaries, CKA activation capture
  (scripts/representational_analysis.py:237-259) and integrated-gradients
  feature circuits (scripts/compute_circuits.py:159-204), replacing the
  reference's nnsight hooks.
- AttentionPool2d only computes the query for the mean token: the reference
  runs full (HW+1)x(HW+1) attention and keeps row 0
  (modified_resnet.py:68-92); attention output at position 0 depends only on
  query 0, so this is numerically identical at ~1/50th the attention FLOPs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from xclip_tpu.models import layers as L

EXPANSION = 4

# A/B gate for the input-derived-BN-stats fusion on 1x1 convs (see
# layers.conv1x1_batchnorm_apply). Measured on the v5e: 1332-1353 img/s
# fused vs 1458 unfused — the covariance path's BACKWARD adds full-size
# gradient contributions that outweigh the saved forward stats pass, so
# the default is off; kept as a bench experiment.
import os as _os

FUSED_CONV_BN = _os.environ.get("XCLIP_FUSED_CONV_BN", "0") == "1"


def _use_s2d_stem() -> bool:
    # space-to-depth rewrite of the stride-2 stem conv (layers.conv_s2d_apply)
    # — read per-trace so bench A/Bs can flip it without re-importing
    return _os.environ.get("XCLIP_S2D_STEM", "0") == "1"


def _use_stage_scan() -> bool:
    # run each stage's identical tail blocks (1..n-1: stride 1, no
    # downsample) as ONE lax.scan over stacked params, so the backward is a
    # single loop body whose weight-gradient contractions are emitted once
    # and batched across blocks ("wgrad batching", VERDICT r2 lever b).
    return _os.environ.get("XCLIP_STAGE_SCAN", "0") == "1"


@dataclasses.dataclass(frozen=True)
class ResNetCfg:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224

    @property
    def embed_dim(self) -> int:
        return self.width * 32

    @property
    def grid(self) -> int:
        return self.image_size // 32


# ---------------------------------------------------------------------------
# init


def _bottleneck_init(rng, inplanes: int, planes: int, stride: int):
    keys = jax.random.split(rng, 4)
    params: Dict = {
        "conv1": L.conv_init(keys[0], inplanes, planes, 1),
        "conv2": L.conv_init(keys[1], planes, planes, 3),
        "conv3": L.conv_init(keys[2], planes, planes * EXPANSION, 1),
    }
    state: Dict = {}
    for i, dim in ((1, planes), (2, planes), (3, planes * EXPANSION)):
        params[f"bn{i}"], state[f"bn{i}"] = L.batchnorm_init(dim)
    # zero-init bn3 scale (reference init_parameters zeroes bn3.weight)
    params["bn3"]["scale"] = jnp.zeros_like(params["bn3"]["scale"])
    if stride > 1 or inplanes != planes * EXPANSION:
        params["downsample"] = {"conv": L.conv_init(keys[3], inplanes, planes * EXPANSION, 1)}
        params["downsample"]["bn"], state["downsample_bn"] = L.batchnorm_init(planes * EXPANSION)
    return params, state


def resnet_init(rng, cfg: ResNetCfg):
    keys = jax.random.split(rng, 8)
    w = cfg.width
    params: Dict = {
        "stem": {
            "conv1": L.conv_init(keys[0], 3, w // 2, 3),
            "conv2": L.conv_init(keys[1], w // 2, w // 2, 3),
            "conv3": L.conv_init(keys[2], w // 2, w, 3),
        }
    }
    state: Dict = {"stem": {}}
    for i, dim in ((1, w // 2), (2, w // 2), (3, w)):
        params["stem"][f"bn{i}"], state["stem"][f"bn{i}"] = L.batchnorm_init(dim)

    inplanes = w
    for stage_idx, (planes_mult, blocks) in enumerate(zip((1, 2, 4, 8), cfg.layers)):
        planes = w * planes_mult
        stride = 1 if stage_idx == 0 else 2
        stage_params: List = []
        stage_state: List = []
        for b in range(blocks):
            rng, sub = jax.random.split(rng)
            p, s = _bottleneck_init(sub, inplanes, planes, stride if b == 0 else 1)
            stage_params.append(p)
            stage_state.append(s)
            inplanes = planes * EXPANSION
        params[f"layer{stage_idx + 1}"] = stage_params
        state[f"layer{stage_idx + 1}"] = stage_state

    embed_dim = cfg.embed_dim
    std = embed_dim**-0.5
    attn = L.mha_init(keys[4], embed_dim, num_heads=cfg.heads, out_dim=cfg.output_dim, std=std)
    attn["positional_embedding"] = (
        jax.random.normal(keys[5], (cfg.grid**2 + 1, embed_dim), jnp.float32) * std
    )
    params["attnpool"] = attn
    return params, state


# ---------------------------------------------------------------------------
# stages


def _stem_act(params, state, x, idx: int, *, stride: int, train: bool, dtype):
    if stride == 2 and x.shape[1] % 2 == 0 and _use_s2d_stem():
        y = L.conv_s2d_apply(params["stem"][f"conv{idx}"], x, dtype=dtype)
    else:
        y = L.conv_apply(params["stem"][f"conv{idx}"], x, stride=stride, padding=1, dtype=dtype)
    y, bn_state = L.batchnorm_apply(params["stem"][f"bn{idx}"], state["stem"][f"bn{idx}"], y, train=train)
    return jax.nn.relu(y), {"stem": {f"bn{idx}": bn_state}}


def _use_pallas_block() -> bool:
    # measured on the v5e: the current Pallas 1x1 kernels stream at ~126GB/s
    # vs ~222GB/s for XLA's conv+elementwise sequence, so the XLA path (with
    # input-derived BN stats) is the default; flip on for kernel experiments
    return _os.environ.get("XCLIP_PALLAS_BLOCK", "0") == "1"


def _bottleneck_apply_pallas(params, state, x, *, stride: int, train: bool, dtype):
    """Bottleneck with the 1x1 convs as fused Pallas matmul kernels:

    - conv1 emits its own BN batch stats in-kernel (no stats pass over y1);
    - conv3 and the downsample conv get their BN stats from input moments
      (1x1 linearity) and apply normalize(+residual)(+relu) in the matmul
      epilogue — the block's widest tensors are written exactly once.

    Same math as _bottleneck_apply (reference modified_resnet.py:20-50);
    summation order differs only inside fp32 accumulations.
    """
    from xclip_tpu.ops.fused_conv import matmul_affine_act, matmul_stats

    new_state: Dict = {}
    if dtype is not None:
        x = x.astype(dtype)
    b, h, w_, cin = x.shape
    planes = params["conv1"]["kernel"].shape[3]
    cout = params["conv3"]["kernel"].shape[3]

    # conv1 (1x1) with in-kernel output stats
    w1 = params["conv1"]["kernel"][0, 0].astype(x.dtype)
    zf = x.reshape(b * h * w_, cin)
    n1 = zf.shape[0]
    if train:
        y1, s1, s2 = matmul_stats(zf, w1)
        mean1 = s1 / n1
        var1 = jnp.maximum(s2 / n1 - jax.lax.square(mean1), 0.0)
    else:
        y1, mean1, var1 = None, None, None
    g1, b1, new_state["bn1"] = L.bn_factors_from_stats(
        params["bn1"], state["bn1"], mean1, var1, n1, train=train)
    if train:
        out = (y1 * g1.astype(y1.dtype) + b1.astype(y1.dtype))
        out = jax.nn.relu(out).reshape(b, h, w_, planes)
    else:
        out = matmul_affine_act(zf, w1, g1, b1, relu=True).reshape(b, h, w_, planes)

    # conv2 (3x3) + bn2: XLA conv (spatial taps), standard stats pass
    out = L.conv_apply(params["conv2"], out, padding=1, dtype=dtype)
    out, new_state["bn2"] = L.batchnorm_apply(params["bn2"], state["bn2"], out, train=train)
    out = jax.nn.relu(out)
    if stride > 1:
        out = L.avg_pool(out, stride)
    oh, ow = out.shape[1], out.shape[2]
    z2 = out.reshape(b * oh * ow, planes)
    n3 = z2.shape[0]

    # identity branch first (consumed by conv3's epilogue)
    if "downsample" in params:
        idin = L.avg_pool(x, stride) if stride > 1 else x
        idf = idin.reshape(n3, cin)
        wd32 = params["downsample"]["conv"]["kernel"][0, 0].astype(jnp.float32)
        if train:
            mean_d, var_d = L.conv1x1_moments_from_input(idf, wd32, n3)
        else:
            mean_d = var_d = None
        gd, bd, new_state["downsample_bn"] = L.bn_factors_from_stats(
            params["downsample"]["bn"], state["downsample_bn"], mean_d, var_d, n3, train=train)
        identity = matmul_affine_act(idf, wd32.astype(x.dtype), gd, bd, relu=False)
    else:
        identity = x.reshape(n3, cout)

    # conv3 (1x1) with input-derived BN stats: normalize+add+relu in-epilogue
    w3_32 = params["conv3"]["kernel"][0, 0].astype(jnp.float32)
    if train:
        mean3, var3 = L.conv1x1_moments_from_input(z2, w3_32, n3)
    else:
        mean3 = var3 = None
    g3, b3, new_state["bn3"] = L.bn_factors_from_stats(
        params["bn3"], state["bn3"], mean3, var3, n3, train=train)
    out = matmul_affine_act(z2, w3_32.astype(z2.dtype), g3, b3, identity, relu=True)
    return out.reshape(b, oh, ow, cout), new_state


def _bottleneck_apply(params, state, x, *, stride: int, train: bool, dtype):
    if _use_pallas_block():
        return _bottleneck_apply_pallas(params, state, x, stride=stride, train=train, dtype=dtype)
    new_state: Dict = {}
    out = L.conv_apply(params["conv1"], x, dtype=dtype)
    out, new_state["bn1"] = L.batchnorm_apply(params["bn1"], state["bn1"], out, train=train)
    out = jax.nn.relu(out)
    out = L.conv_apply(params["conv2"], out, padding=1, dtype=dtype)
    out, new_state["bn2"] = L.batchnorm_apply(params["bn2"], state["bn2"], out, train=train)
    out = jax.nn.relu(out)
    if stride > 1:
        out = L.avg_pool(out, stride)
    # conv3+bn3 fused with input-derived batch stats: removes the stats pass
    # over the block's widest tensor (see conv1x1_batchnorm_apply)
    if FUSED_CONV_BN:
        out, new_state["bn3"] = L.conv1x1_batchnorm_apply(
            params["conv3"], params["bn3"], state["bn3"], out, train=train, dtype=dtype
        )
    else:
        out = L.conv_apply(params["conv3"], out, dtype=dtype)
        out, new_state["bn3"] = L.batchnorm_apply(params["bn3"], state["bn3"], out, train=train)

    identity = x
    if "downsample" in params:
        identity = L.avg_pool(x, stride) if stride > 1 else x
        # same input-derived-stats fusion as conv3 (downsample is 1x1 too);
        # its input C is the block input width, so the covariance is cheap
        if FUSED_CONV_BN:
            identity, new_state["downsample_bn"] = L.conv1x1_batchnorm_apply(
                params["downsample"]["conv"], params["downsample"]["bn"],
                state["downsample_bn"], identity, train=train, dtype=dtype
            )
        else:
            identity = L.conv_apply(params["downsample"]["conv"], identity, dtype=dtype)
            identity, new_state["downsample_bn"] = L.batchnorm_apply(
                params["downsample"]["bn"], state["downsample_bn"], identity, train=train
            )
    return jax.nn.relu(out + identity), new_state


def _stage_tail_scan(stage_params, stage_state, x, *, train: bool, dtype, remat: bool):
    """Blocks 1..n-1 of a stage as one ``lax.scan`` over stacked params.

    The tail blocks of each stage share shapes exactly (stride 1, no
    downsample), so their parameter pytrees stack leaf-wise. XLA then
    compiles ONE loop body; in the backward scan every block's wgrad
    contraction reuses the same program with grads written into the stacked
    accumulator — the implementable form of cross-block wgrad batching.
    Returns ``(out, [new_state per block])``.
    """
    stacked_p = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *stage_params)
    stacked_s = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *stage_state)

    def body(h, ps):
        p, s = ps
        fn = _bottleneck_apply
        if remat and train:
            fn = jax.checkpoint(
                lambda pp, ss, hh: _bottleneck_apply(
                    pp, ss, hh, stride=1, train=train, dtype=dtype))
            out, ns = fn(p, s, h)
        else:
            out, ns = fn(p, s, h, stride=1, train=train, dtype=dtype)
        return out, ns

    x, ns_stacked = jax.lax.scan(body, x, (stacked_p, stacked_s))
    n = len(stage_params)
    new_states = [
        jax.tree_util.tree_map(lambda a, _i=i: a[_i], ns_stacked) for i in range(n)
    ]
    return x, new_states


def attnpool_apply(params, x, *, heads: int, dtype=None):
    """AttentionPool2d over an NHWC feature map -> (B, output_dim)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean_tok = jnp.mean(tokens.astype(jnp.float32), axis=1, keepdims=True).astype(x.dtype)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (B, HW+1, C)
    pos = params["positional_embedding"].astype(tokens.dtype)
    tokens = tokens + pos
    # query only the mean token — output row 0 of full attention.
    q = L.linear_apply(params["q"], tokens[:, :1], dtype=dtype)
    k = L.linear_apply(params["k"], tokens, dtype=dtype)
    v = L.linear_apply(params["v"], tokens, dtype=dtype)
    o = L.attention(q, k, v, num_heads=heads)
    return L.linear_apply(params["out"], o, dtype=dtype)[:, 0]


def resnet_stage_names(cfg: ResNetCfg) -> List[str]:
    """Names of the sequential stages of the network (the circuit/CKA submodule
    granularity of the reference: stem act1-3 + avgpool, each bottleneck, attnpool)."""
    names = ["stem.act1", "stem.act2", "stem.act3", "stem.avgpool"]
    for i, blocks in enumerate(cfg.layers):
        names += [f"layer{i + 1}.{b}" for b in range(blocks)]
    names.append("attnpool")
    return names


def resnet_apply(
    params,
    state,
    x,
    cfg: ResNetCfg,
    *,
    train: bool = False,
    dtype=None,
    start: int = 0,
    stop: Optional[int] = None,
    capture: Optional[Sequence[str]] = None,
    remat: bool = False,
):
    """Run stages ``start:stop`` of the network.

    Returns ``(out, new_state, intermediates)`` where ``intermediates`` maps
    captured stage names to their output activations. ``x`` is the input to
    stage ``start`` (NHWC image for ``start=0``).
    """
    names = resnet_stage_names(cfg)
    stop = len(names) if stop is None else stop
    capture = set(capture or ())
    inters: Dict[str, jnp.ndarray] = {}
    new_state = jax.tree_util.tree_map(lambda s: s, state)  # shallow copyable pytree

    def record(name, val):
        if name in capture:
            inters[name] = val

    def maybe_remat(fn):
        return jax.checkpoint(fn) if remat and train else fn

    idx = start
    while idx < stop:
        name = names[idx]
        if name.startswith("stem.act"):
            i = int(name[-1])
            stride = 2 if i == 1 else 1
            x, upd = _stem_act(params, state, x, i, stride=stride, train=train, dtype=dtype)
            new_state["stem"][f"bn{i}"] = upd["stem"][f"bn{i}"]
        elif name.startswith("layer"):
            stage, block = name.split(".")
            b = int(block)
            stage_idx = int(stage[-1]) - 1
            n_blocks = cfg.layers[stage_idx]
            if (
                _use_stage_scan()
                and b == 1
                and idx + n_blocks - 1 <= stop
                and not any(f"{stage}.{j}" in capture for j in range(1, n_blocks))
            ):
                # whole identical tail of the stage in one scan (wgrad batching)
                x, tail_states = _stage_tail_scan(
                    [params[stage][j] for j in range(1, n_blocks)],
                    [state[stage][j] for j in range(1, n_blocks)],
                    x, train=train, dtype=dtype, remat=remat,
                )
                for j in range(1, n_blocks):
                    new_state[stage][j] = tail_states[j - 1]
                idx += n_blocks - 1
                continue
            stride = 1 if stage_idx == 0 or b > 0 else 2
            fn = maybe_remat(
                lambda p, s, inp, _stride=stride: _bottleneck_apply(
                    p, s, inp, stride=_stride, train=train, dtype=dtype
                )
            )
            x, upd = fn(params[stage][b], state[stage][b], x)
            new_state[stage][b] = upd
        elif name == "stem.avgpool":
            x = L.avg_pool(x, 2)
        elif name == "attnpool":
            x = attnpool_apply(params["attnpool"], x, heads=cfg.heads, dtype=dtype)
        else:  # pragma: no cover
            raise AssertionError(name)
        record(name, x)
        idx += 1

    return x, new_state, inters
