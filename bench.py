"""Benchmark: RN50 CLIP contrastive training throughput (images/sec/chip).

Measures the reference's headline meter — samples_per_second_per_gpu =
accum_freq * batch_size / batch_time (deps/open_clip/src/training/
train.py:216-217) — for the full jitted train step (forward + backward +
AdamW + logit-scale clamp) on synthetic device-resident data, isolating
device throughput exactly like the reference's gpu_time meter.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 3000 images/sec/chip (BASELINE.md north star, TPU v5e).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_SEC_PER_CHIP = 3000.0


def main():
    import jax
    import numpy as np

    from xclip_tpu.core.precision import get_policy
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    model_name = os.environ.get("BENCH_MODEL", "RN50")
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "96"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))

    n_chips = jax.device_count()
    mesh = create_mesh()
    model, params, state = create_model(model_name, precision="bf16")
    tx = optim.adamw(schedule.cosine_lr(1e-3, 500, 10000), weight_decay=0.2)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, mesh,
        TrainStepCfg(precision="bf16", accum_freq=1, grad_checkpointing=False, local_loss=True),
    )

    global_batch = per_chip_batch * n_chips
    size = model.cfg.image_size
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "images": rng.randn(global_batch, size, size, 3).astype(np.float32),
        "texts": rng.randint(1, 49000, size=(global_batch, 77)).astype(np.int32),
    })

    for _ in range(warmup):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])  # value fetch = hard sync (block_until_ready is
    # unreliable over the experimental axon relay)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])  # every step chains through donated params
    dt = time.perf_counter() - t0

    imgs_per_sec = global_batch * steps / dt
    per_chip = imgs_per_sec / n_chips

    # secondary: eval-path (encode_image, the LSO feature-extraction hot
    # loop) throughput — reported as an extra key on the same JSON line.
    eval_batch = int(os.environ.get("BENCH_EVAL_BATCH", "250"))
    eval_imgs = jax.device_put(rng.randn(eval_batch, size, size, 3).astype(np.float32))

    @jax.jit
    def encode(p, s, images):
        feats, _, _ = model.encode_image(
            p, images, state=s, normalize=True, dtype=get_policy("bf16").compute_dtype
        )
        return feats

    feats = encode(params, state, eval_imgs)
    float(np.asarray(feats)[0, 0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        feats = encode(params, state, eval_imgs)
    float(np.asarray(feats)[0, 0])
    eval_per_chip = eval_batch * steps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"{model_name} CLIP train throughput",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        "eval_images_per_sec_per_chip": round(eval_per_chip, 2),
    }))


if __name__ == "__main__":
    main()
