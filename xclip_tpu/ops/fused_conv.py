"""Pallas TPU kernels for the bandwidth-bound 1x1-conv paths of ResNet
bottlenecks.

A 1x1 conv over NHWC is a (M, K) @ (K, C) matmul with M = N*H*W. XLA emits
the conv, the batch-norm stats reduce, the normalize+relu, and the residual
add as SEPARATE kernels, each a full HBM round-trip over the block's widest
tensors (verified from compiled HLO — TPU XLA does not epilogue-fuse
elementwise consumers into convolutions). These kernels fuse:

- ``matmul_stats``:      y = z @ w, plus per-channel sum(y) and sum(y^2)
                         accumulated in-kernel (the BN batch-stat inputs) —
                         the stats pass over y disappears.
- ``matmul_affine_act``: out = [relu]((z @ w) * g + b [+ identity]) — the
                         normalize, residual add and relu ride the matmul's
                         output tiles; the pre-activation tensor is never
                         materialized.

Both carry custom VJPs (jnp backward; the relu mask is reconstructed from
the kernel output, and the pre-affine activation is recomputed with one
extra narrow matmul instead of re-reading wide tensors).

Replaces the torch path reference deps/open_clip/src/open_clip/
modified_resnet.py:20-50 (Bottleneck.forward) at equal math.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # CPU backend (tests, the multichip CPU dryrun) runs Pallas interpreted
    return jax.default_backend() == "cpu"


def _pick_tile_m(m: int, limit: int = 1024) -> int:
    """Largest divisor of m that is <= limit and a multiple of 8."""
    if m % 8 != 0:
        # grid = m // tm would silently leave the last m % tm rows
        # uninitialized (round-2 advisor finding)
        raise ValueError(f"fused-conv kernels need M = N*H*W divisible by 8; got {m}")
    best = 8
    for t in range(8, limit + 1, 8):
        if m % t == 0:
            best = t
    return best


# ---------------------------------------------------------------------------
# matmul + affine + (residual) + (relu)


def _affine_act_kernel(z_ref, w_ref, g_ref, b_ref, out_ref, *, relu: bool):
    y = jnp.dot(z_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y * g_ref[:] + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _affine_act_id_kernel(z_ref, w_ref, g_ref, b_ref, id_ref, out_ref, *, relu: bool):
    y = jnp.dot(z_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y * g_ref[:] + b_ref[:] + id_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _matmul_affine_act_fwd_impl(z, w, g, b, identity, relu):
    m, k = z.shape
    c = w.shape[1]
    tm = _pick_tile_m(m)
    grid = (m // tm,)
    g2 = g.reshape(1, c).astype(jnp.float32)
    b2 = b.reshape(1, c).astype(jnp.float32)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((m, c), z.dtype),
        grid=grid,
        interpret=_interpret(),
    )
    zspec = pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if identity is None:
        return pl.pallas_call(
            functools.partial(_affine_act_kernel, relu=relu),
            in_specs=[zspec, wspec, vspec, vspec],
            out_specs=ospec,
            **common,
        )(z, w, g2, b2)
    return pl.pallas_call(
        functools.partial(_affine_act_id_kernel, relu=relu),
        in_specs=[zspec, wspec, vspec, vspec, ospec],
        out_specs=ospec,
        **common,
    )(z, w, g2, b2, identity)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _maa_id(z, w, g, b, relu, identity):
    return _matmul_affine_act_fwd_impl(z, w, g, b, identity, relu)


def _maa_id_fwd(z, w, g, b, relu, identity):
    out = _matmul_affine_act_fwd_impl(z, w, g, b, identity, relu)
    return out, (z, w, g, b, out)


def _maa_common_bwd(relu, res, dout, with_identity):
    z, w, g, b, out = res
    dout = dout.astype(jnp.float32)
    if relu:
        dpre = jnp.where(out > 0, dout, 0.0)
    else:
        dpre = dout
    dy = dpre * g.astype(jnp.float32)
    dy16 = dy.astype(z.dtype)
    dz = jnp.dot(dy16, w.T.astype(z.dtype))
    dw = jax.lax.dot_general(
        z, dy16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    # pre-affine activation recomputed with one narrow matmul (cheaper than
    # re-reading the wide identity tensor to invert the affine)
    y = jnp.dot(z, w, preferred_element_type=jnp.float32)
    dg = jnp.sum(dpre * y, axis=0).astype(g.dtype)
    db = jnp.sum(dpre, axis=0).astype(g.dtype)
    if with_identity:
        return dz, dw, dg, db, dpre.astype(z.dtype)
    return dz, dw, dg, db


def _maa_id_bwd(relu, res, dout):
    return _maa_common_bwd(relu, res, dout, with_identity=True)


_maa_id.defvjp(_maa_id_fwd, _maa_id_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _maa_noid(z, w, g, b, relu):
    return _matmul_affine_act_fwd_impl(z, w, g, b, None, relu)


def _maa_noid_fwd(z, w, g, b, relu):
    out = _matmul_affine_act_fwd_impl(z, w, g, b, None, relu)
    return out, (z, w, g, b, out)


def _maa_noid_bwd(relu, res, dout):
    return _maa_common_bwd(relu, res, dout, with_identity=False)


_maa_noid.defvjp(_maa_noid_fwd, _maa_noid_bwd)


def matmul_affine_act(
    z: jnp.ndarray,
    w: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    identity: Optional[jnp.ndarray] = None,
    *,
    relu: bool = True,
) -> jnp.ndarray:
    """``[relu]((z @ w) * g + b [+ identity])`` as one Pallas pass.

    z: (M, K); w: (K, C); g/b: (C,) fp32 affine; identity: (M, C) or None.
    Gradients flow to every input; pair with input-derived BN statistics
    (layers.conv1x1_batchnorm_apply) for the train-mode stats.
    """
    if identity is None:
        return _maa_noid(z, w, g, b, relu)
    return _maa_id(z, w, g, b, relu, identity)


# ---------------------------------------------------------------------------
# matmul + per-channel output stats


def _matmul_stats_kernel(z_ref, w_ref, y_ref, s1_ref, s2_ref):
    y = jnp.dot(z_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += jnp.sum(y, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(y * y, axis=0, keepdims=True)


def _matmul_stats_fwd_impl(z, w):
    m, k = z.shape
    c = w.shape[1]
    tm = _pick_tile_m(m)
    y, s1, s2 = pl.pallas_call(
        _matmul_stats_kernel,
        grid=(m // tm,),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), z.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(z, w)
    return y, s1.reshape(c), s2.reshape(c)


@jax.custom_vjp
def matmul_stats(z, w):
    """``y = z @ w`` plus per-channel ``sum(y)`` and ``sum(y*y)`` computed in
    the same pass (BN batch-stat inputs; no separate reduce over y)."""
    return _matmul_stats_fwd_impl(z, w)


def _ms_fwd(z, w):
    y, s1, s2 = _matmul_stats_fwd_impl(z, w)
    return (y, s1, s2), (z, w, y)


def _ms_bwd(res, grads):
    z, w, y = res
    dy, ds1, ds2 = grads
    dtot = (
        dy.astype(jnp.float32)
        + ds1.astype(jnp.float32)[None, :]
        + 2.0 * y.astype(jnp.float32) * ds2.astype(jnp.float32)[None, :]
    ).astype(z.dtype)
    dz = jnp.dot(dtot, w.T.astype(z.dtype))
    dw = jax.lax.dot_general(
        z, dtot, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return dz, dw


matmul_stats.defvjp(_ms_fwd, _ms_bwd)
