"""Worker for the two-process jax.distributed integration test
(tests/test_distributed_multiprocess.py). Launched torchrun-style:
RANK/WORLD_SIZE/LOCAL_RANK/MASTER_ADDR/MASTER_PORT env vars, one CPU
process per "host" with 2 virtual local devices each. Runs ONE real CLIP
train step over the global 2x2-device mesh and writes a JSON digest of the
updated params; the parent asserts both hosts computed identical params
(the reference's DDP invariant, training/distributed.py:43-99).
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    from xclip_tpu.parallel.mesh import (
        DistInfo, create_mesh, init_distributed_from_env, shard_batch)

    local_rank, global_rank, world_size = init_distributed_from_env("env://")
    assert world_size == 2, world_size
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()  # 2 hosts x 2 local
    assert jax.local_device_count() == 2

    import jax.numpy as jnp

    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1], "width": 8,
                       "patch_size": None},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 16,
                     "heads": 2, "layers": 1},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.2)
    opt_state = tx.init(params)
    mesh = create_mesh()  # global: all 4 devices across both processes
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))

    # per-process batch: this host's rows only (DistributedSampler contract);
    # rows differ per rank so the collective math is actually exercised
    rng = np.random.RandomState(100 + global_rank)
    local = {
        "images": rng.randn(4, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 64, size=(4, 12)).astype(np.int32),
    }
    batch = shard_batch(mesh, local)
    params, state, opt_state, metrics = step(params, state, opt_state, batch)

    digest = {
        "rank": global_rank,
        "world": world_size,
        "dist_world": DistInfo.current().world_size,
        "dist_process": DistInfo.current().process_index,
        "loss": float(metrics["loss"]),
        "param_sum": float(sum(
            jnp.sum(jnp.abs(l.astype(jnp.float64))) for l in
            jax.tree_util.tree_leaves(params))),
        "first_kernel": np.asarray(
            params["visual"]["stem"]["conv1"]["kernel"]).ravel()[:8].tolist(),
    }
    with open(out_path, "w") as fh:
        json.dump(digest, fh)


if __name__ == "__main__":
    main()
