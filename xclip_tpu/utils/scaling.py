"""Analytic multi-chip scaling model: single-chip roofline + ICI collectives.

Extends the perfect-fusion HBM traffic floor (`utils/traffic.py`) to a
cluster prediction: on an N-chip v5e mesh the data-parallel CLIP step adds
exactly two collective flows to the single-chip program —

1. the differentiable feature ``all_gather`` in the contrastive loss
   (forward: (B_local, D) per tower; backward: the mirrored
   ``reduce_scatter`` of feature grads), and
2. the gradient ``pmean`` (ring all-reduce: each chip moves
   2 * S * (N-1)/N bytes of gradient over its ICI links, S = grad bytes),
   paid once per OPTIMIZER step — grad accumulation amortizes it over
   ``accum_freq`` microbatches.

ZeRO changes the flow shape (reduce_scatter grads + all_gather params) but
not the per-chip byte count (2 * S * (N-1)/N), which is why the model covers
``--parallelism dp`` and ``zero`` with one formula.

The per-chip compute/HBM time is dp-invariant (per-chip batch fixed), so

    step_time(N) = compute_time + collective_time(N)        (serial bound)
    step_time(N) = max(compute_time, collective_time(N))    (overlap bound)

Real XLA lands between the two (the latency-hiding scheduler overlaps the
grad all-reduce with the tail of the backward); both bounds are reported.
Above ``ici_domain`` chips (one v5e pod = 256) the all-reduce crosses DCN
and the per-chip link budget drops to ``dcn_gbps``.

Datasheet constants (overridable): v5e ICI 1,600 Gbps/chip = 200 GB/s/chip
aggregate; inter-pod DCN taken at 25 GB/s per host (8 chips/host).
Reference scaling path for comparison: 4-GPU NCCL DDP
(slurm/train-clip.sh:120-127), which pays the same 2S ring traffic over
NVLink/PCIe.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

V5E_ICI_GBPS = 200.0  # per chip, datasheet (1,600 Gbps)
V5E_DCN_GBPS_PER_CHIP = 25.0 / 8.0  # 25 GB/s NIC shared by 8 chips/host
V5E_POD_CHIPS = 256


@dataclasses.dataclass
class ScalingPoint:
    n_chips: int
    images_per_sec_per_chip: float
    images_per_sec_total: float
    efficiency: float  # vs the single-chip rate
    collective_ms: float
    compute_ms: float
    dominant: str  # "compute" | "ici" | "dcn"
    link_gbps: float


def ring_allreduce_bytes_per_chip(grad_bytes: int, n_chips: int) -> float:
    """Bytes each chip sends (== receives) in a bandwidth-optimal ring
    all-reduce: reduce-scatter + all-gather, each (N-1)/N of the payload."""
    if n_chips <= 1:
        return 0.0
    return 2.0 * grad_bytes * (n_chips - 1) / n_chips


def feature_gather_bytes_per_chip(local_batch: int, embed_dim: int,
                                  n_chips: int, *, towers: int = 2,
                                  feat_bytes: int = 2) -> float:
    """Forward all_gather + backward reduce_scatter of the contrastive
    features, both towers; each chip receives (N-1)/N of the global matrix."""
    if n_chips <= 1:
        return 0.0
    global_feats = local_batch * n_chips * embed_dim * feat_bytes * towers
    return 2.0 * global_feats * (n_chips - 1) / n_chips


def predict(
    n_chips: int,
    *,
    step_time_ms: float,
    local_batch: int,
    grad_bytes: int,
    embed_dim: int = 1024,
    accum_freq: int = 1,
    overlap: bool = True,
    ici_gbps: float = V5E_ICI_GBPS,
    dcn_gbps_per_chip: float = V5E_DCN_GBPS_PER_CHIP,
    ici_domain: int = V5E_POD_CHIPS,
) -> ScalingPoint:
    """Predicted throughput at ``n_chips``, given the MEASURED single-chip
    optimizer-step time (which already contains ``accum_freq`` microbatches)."""
    cross_pod = n_chips > ici_domain
    link_gbps = dcn_gbps_per_chip if cross_pod else ici_gbps

    grad_flow = ring_allreduce_bytes_per_chip(grad_bytes, n_chips)
    # feature gathers happen per MICROBATCH (the cached-negatives accum
    # gathers every pass), grad all-reduce once per optimizer step
    feat_flow = accum_freq * feature_gather_bytes_per_chip(
        local_batch, embed_dim, n_chips)
    collective_ms = (grad_flow + feat_flow) / (link_gbps * 1e9) * 1e3

    if overlap:
        total_ms = max(step_time_ms, collective_ms)
    else:
        total_ms = step_time_ms + collective_ms

    images = local_batch * accum_freq
    per_chip = images / (total_ms * 1e-3)
    base = images / (step_time_ms * 1e-3)
    if collective_ms <= 0 or total_ms <= step_time_ms + 1e-9:
        dominant = "compute"
    else:
        dominant = "dcn" if cross_pod else "ici"
    return ScalingPoint(
        n_chips=n_chips,
        images_per_sec_per_chip=per_chip,
        images_per_sec_total=per_chip * n_chips,
        efficiency=per_chip / base,
        collective_ms=collective_ms,
        compute_ms=step_time_ms,
        dominant=dominant,
        link_gbps=link_gbps,
    )


def sweep(n_list, **kw):
    return [predict(n, **kw) for n in n_list]


def param_bytes(params, dtype_bytes: int = 4) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params)) * dtype_bytes
