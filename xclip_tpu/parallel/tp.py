"""Tensor parallelism for the transformer towers: a 2D (data, model) mesh.

The reference stack scales with NCCL data-parallel DDP only (SURVEY §2e);
this module goes beyond it the TPU-native way — megatron-style tensor
parallelism expressed purely as GSPMD sharding annotations, with XLA's SPMD
partitioner inserting every collective:

- column-parallel: ``attn.{q,k,v}.kernel`` and ``mlp.c_fc.kernel`` are
  sharded on their OUTPUT dim (heads / hidden split across ``model``);
- row-parallel: ``attn.out.kernel`` and ``mlp.c_proj.kernel`` are sharded
  on their INPUT dim (the partitioner emits the psum that completes the
  contraction);
- the text token embedding is vocab-sharded (ZeRO-style memory win for the
  largest single parameter);
- everything else (LN, biases of row-parallel layers, pos-embeds, convs)
  is replicated; the batch is sharded over ``data``.

Optimizer state needs no rules of its own: ``tx.init`` on already-sharded
params produces moments with inherited shardings, and the jitted step takes
its in_shardings from the committed arguments.

No torch/NCCL analogue exists in the reference; collectives ride the ICI
mesh via ``jax.sharding`` + ``jit`` exactly as in the public scaling-book
recipe (mesh -> annotate -> let XLA place collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xclip_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def create_mesh_2d(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, model) mesh over ``n_data * n_model`` devices. The model
    axis is minor (contiguous device ids) so TP collectives ride the
    fastest ICI hops."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _tp_spec_for(path: Tuple[str, ...], shape: Tuple[int, ...], n_model: int) -> P:
    """Megatron sharding rule for one CLIP parameter, by its tree path."""
    name = path[-1] if path else ""
    parent = path[-2] if len(path) >= 2 else ""
    grandparent = path[-3] if len(path) >= 3 else ""

    def ok(dim: int) -> bool:  # only shard dims the axis divides evenly
        return shape[dim] % n_model == 0

    # column-parallel (shard output dim): q/k/v projections + mlp up-proj
    if name == "kernel" and parent in ("q", "k", "v") and grandparent == "attn":
        return P(None, MODEL_AXIS) if ok(1) else P()
    if name == "bias" and parent in ("q", "k", "v") and grandparent == "attn":
        return P(MODEL_AXIS) if ok(0) else P()
    if name == "kernel" and parent == "c_fc":
        return P(None, MODEL_AXIS) if ok(1) else P()
    if name == "bias" and parent == "c_fc":
        return P(MODEL_AXIS) if ok(0) else P()
    # row-parallel (shard input dim): attention out-proj + mlp down-proj
    if name == "kernel" and parent == "out" and grandparent == "attn":
        return P(MODEL_AXIS, None) if ok(0) else P()
    if name == "kernel" and parent == "c_proj":
        return P(MODEL_AXIS, None) if ok(0) else P()
    # vocab-sharded token embedding (the largest single parameter)
    if name == "token_embedding":
        return P(MODEL_AXIS, None) if ok(0) else P()
    return P()


def _path_names(key_path) -> Tuple[str, ...]:
    names = []
    for k in key_path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(f"[{k.idx}]")
        else:  # pragma: no cover - future jax key types
            names.append(str(k))
    return tuple(names)


def tp_param_sharding(mesh: Mesh, params):
    """NamedSharding tree for a CLIP param pytree under (data, model)."""
    n_model = mesh.shape[MODEL_AXIS]

    def leaf(key_path, x):
        spec = _tp_spec_for(_path_names(key_path), tuple(jax.numpy.shape(x)), n_model)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params_tp(mesh: Mesh, params):
    """device_put the params with their TP shardings."""
    return jax.device_put(params, tp_param_sharding(mesh, params))


def make_train_step_tp(model, optimizer, mesh: Mesh, cfg=None):
    """Jitted TP train step over a (data, model) mesh.

    This IS :func:`xclip_tpu.train.step_pjit.make_train_step_pjit` in its
    committed-inputs mode: params/opt_state shardings come from the
    committed arguments (use :func:`shard_params_tp` + ``tx.init`` on the
    sharded params), the batch is sharded over ``data`` only, and the SPMD
    partitioner derives every TP collective from the annotations.
    """
    from xclip_tpu.train.step import TrainStepCfg
    from xclip_tpu.train.step_pjit import make_train_step_pjit

    return make_train_step_pjit(
        model, optimizer, mesh, cfg or TrainStepCfg(), committed_inputs=True)
