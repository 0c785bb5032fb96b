"""Minimum-bytes/step traffic model: the perfect-fusion HBM floor.

Walks a function's jaxpr and charges traffic only for tensors an ideal
schedule must still move (conv/dot operands+outputs, gather/scatter), plus
an analytic AdamW update pass. Elementwise ops (BN, ReLU, residual adds,
LN, GELU, softmax, converts) are assumed fused for free, so the result is a
hard LOWER bound on HBM bytes. Dividing by the measured streaming bandwidth
(bench.py roofline anchors) gives the bandwidth-roofline step time; the
measured step time over that is the roofline attainment — the committed
answer to "how much traffic is recoverable" (VERDICT r4 #1).

The walk is abstract (jax.make_jaxpr): no device compute, any backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MIN_TENSOR_BYTES = 1 << 14  # ignore scalars/tiny tensors (scheduler noise)

# primitives whose operands+outputs are irreducible traffic
CHARGED = {
    "conv_general_dilated": "conv",
    "dot_general": "dot",
    "gather": "gather",
    "scatter": "scatter",
    "scatter-add": "scatter",
    "scatter_add": "scatter",
}


def _aval_bytes(v) -> int:
    aval = getattr(v, "aval", None)
    if aval is None or not hasattr(aval, "shape"):
        return 0
    size = int(np.prod(aval.shape)) if aval.shape else 1
    return size * jnp.dtype(aval.dtype).itemsize


def walk(jaxpr, mult: int = 1, acc=None):
    """Accumulate charged bytes per primitive kind over a (Closed)Jaxpr,
    recursing into call/control-flow sub-jaxprs (scan bodies multiply by
    their trip count). Returns {kind: bytes, "_ops": [(name, bytes, shapes)]}."""
    if acc is None:
        acc = {}
    inner = getattr(jaxpr, "jaxpr", jaxpr)
    for eqn in inner.eqns:
        name = eqn.primitive.name
        kind = CHARGED.get(name)
        if kind:
            b = sum(_aval_bytes(v) for v in eqn.invars)
            b += sum(_aval_bytes(v) for v in eqn.outvars)
            if b >= MIN_TENSOR_BYTES:
                acc[kind] = acc.get(kind, 0) + b * mult
                acc.setdefault("_ops", []).append(
                    (name, b * mult,
                     [tuple(v.aval.shape) for v in eqn.invars if hasattr(v, "aval")]))
        sub_mult = mult * int(eqn.params.get("length", 1)) if name == "scan" else mult
        for pval in eqn.params.values():
            if hasattr(pval, "eqns") or hasattr(pval, "jaxpr"):
                walk(pval, sub_mult, acc)
            elif isinstance(pval, (tuple, list)):
                for item in pval:
                    if hasattr(item, "eqns") or hasattr(item, "jaxpr"):
                        walk(item, sub_mult, acc)
    return acc


def optimizer_traffic_bytes(params) -> int:
    """AdamW fused-update floor: read params+mu+nu+grads, write params+mu+nu
    (fp32). The grad WRITE is already charged as the backward's conv/dot
    outputs; the read here is the optimizer's own pass."""
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    return n * 4 * 7


def bandwidth_roofline_seconds(total_bytes: int, adamw_bytes: int,
                               bf16_gbps: float, fp32_gbps: float) -> float:
    """Two-class bandwidth roofline: the AdamW pass is fp32 axpy-shaped and
    is charged at the fp32 streaming rate; every other floor byte rides the
    bf16 compute path at the bf16 streaming rate. Charging ALL bytes at one
    max rate overstates the roofline (r5 anchor correction, BASELINE.md)."""
    return ((total_bytes - adamw_bytes) / bf16_gbps
            + adamw_bytes / fp32_gbps) / 1e9


def min_bytes_per_step(fn, *example_args, include_adamw_over=None) -> dict:
    """Perfect-fusion floor for ``fn(*example_args)``.

    Returns {"total": bytes, "by_kind": {...}, "top_ops": [...]}; when
    ``include_adamw_over`` (a param pytree) is given, adds the analytic
    optimizer pass (use when fn is a full train step)."""
    closed = jax.make_jaxpr(fn)(*example_args)
    acc = walk(closed)
    ops = sorted(acc.pop("_ops", []), key=lambda t: -t[1])
    total = sum(acc.values())
    if include_adamw_over is not None:
        acc["adamw"] = optimizer_traffic_bytes(include_adamw_over)
        total += acc["adamw"]
    return {"total": total, "by_kind": acc, "top_ops": ops}
