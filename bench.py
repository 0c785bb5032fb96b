"""Benchmark: RN50 CLIP contrastive training throughput (images/sec/chip).

Measures the reference's headline meter — samples_per_second_per_gpu =
accum_freq * batch_size / batch_time (deps/open_clip/src/training/
train.py:216-217) — for the full jitted train step (forward + backward +
AdamW + logit-scale clamp) on synthetic device-resident data, isolating
device throughput exactly like the reference's gpu_time meter.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
roofline accounting (model TFLOPs/step, achieved TF/s + MFU, effective
HBM GB/s from the compiled HLO cost analysis), the eval-path encode rate,
the host-fed end-to-end rate with data/batch-time meters, and a
decode-only host microbenchmark (the input-pipeline ceiling on this host).
Baseline: 3000 images/sec/chip (BASELINE.md north star, TPU v5e).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_SEC_PER_CHIP = 3000.0
# TPU v5e peak: 197 bf16 TFLOP/s and ~819 GB/s HBM per chip
V5E_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _build_synthetic_tsv_tree(root: str, n_images: int = 512, size: int = 320) -> str:
    """Random-JPEG TSV tree for the host-fed pipeline bench."""
    import numpy as np
    from PIL import Image

    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rng = np.random.RandomState(0)
    rows = ["filepath\ttitle"]
    for i in range(n_images):
        path = os.path.join(root, "imgs", f"{i}.jpg")
        if not os.path.exists(path):
            Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(
                path, quality=90
            )
        rows.append(f"{path}\ta photo of synthetic noise number {i} for benchmarking")
    tsv = os.path.join(root, "train.tsv")
    with open(tsv, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    return tsv


def decode_only_rate(tsv: str, image_size: int, n: int = 192) -> float:
    """Host decode+crop+resize ceiling (images/sec, all host cores): how fast
    the input pipeline can possibly go on this machine, independent of the
    device. Proves/refutes the decode-bound hypothesis for the e2e number."""
    from xclip_tpu.data.datasets import TsvDataset
    from xclip_tpu.data.fastimage import FastFileTransform

    ds = TsvDataset(tsv, img_transform=FastFileTransform(image_size, is_train=True, to_uint8=True))
    # warm the page cache + any lazy init
    for i in range(8):
        ds[i % len(ds)]
    t0 = time.perf_counter()
    for i in range(n):
        ds[i % len(ds)]
    return n / (time.perf_counter() - t0)


def run_e2e(model_name: str, per_chip_batch: int, steps: int, warmup: int):
    """Host-fed end-to-end training: the jitted step consumes batches decoded
    by the real fastimage/DataLoader pipeline from a synthetic TSV tree;
    reports data_time/batch_time (reference meters, training/train.py:
    82-85,216-233) and the host-stall fraction. Returns a metrics dict."""
    import jax
    import numpy as np

    from xclip_tpu.data.datasets import TsvDataset
    from xclip_tpu.data.fastimage import FastFileTransform
    from xclip_tpu.data.loader import DataLoader, tokenizing_collate
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.tokenizer import SimpleTokenizer
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    workers = int(os.environ.get("BENCH_WORKERS", str(os.cpu_count() or 1)))
    tsv = _build_synthetic_tsv_tree(os.environ.get("BENCH_TREE", "/tmp/bench_tsv_tree"))

    mesh = create_mesh()
    model, params, state = create_model(model_name, precision="bf16")
    tx = optim.adamw(schedule.cosine_lr(1e-3, 500, 10000), weight_decay=0.2)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, mesh,
        TrainStepCfg(precision="bf16", accum_freq=1, grad_checkpointing=False, local_loss=True),
    )

    global_batch = per_chip_batch * jax.device_count()
    # uint8 host->device transfer + on-device normalize (4x fewer bytes)
    ds = TsvDataset(
        tsv, img_transform=FastFileTransform(model.cfg.image_size, is_train=True, to_uint8=True)
    )
    loader = DataLoader(
        ds, global_batch, shuffle=True, seed=0, drop_last=True,
        num_threads=workers, collate=tokenizing_collate(SimpleTokenizer()),
    )

    def batches():
        while True:
            loader.set_epoch(int(time.time()))
            yield from loader

    it = batches()
    # warmup (includes compile) with a hard sync at the end
    for _ in range(warmup):
        batch = shard_batch(mesh, next(it))
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])

    # steady state: per-step host wait is measured directly; device work is
    # pipelined (donated params chain step-to-step) and synced once at the
    # end — per-step value fetches would add a relay RTT to every step.
    data_t = []
    t0 = time.perf_counter()
    end = t0
    for _ in range(steps):
        batch = shard_batch(mesh, next(it))
        data_t.append(time.perf_counter() - end)
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
        end = time.perf_counter()
    float(metrics["loss"])
    batch_time = (time.perf_counter() - t0) / steps
    data_time = float(np.mean(data_t))
    return {
        "images_per_sec_per_chip": round(global_batch / batch_time / jax.device_count(), 2),
        "data_time": round(data_time, 4),
        "batch_time": round(batch_time, 4),
        "stall_fraction": round(max(data_time, 0.0) / batch_time, 4),
        "workers": workers,
        "decode_only_images_per_sec": round(
            decode_only_rate(tsv, model.cfg.image_size), 1),
        "host_cores": os.cpu_count(),
    }


def main_e2e():
    """Standalone host-fed mode (BENCH_E2E=1)."""
    model_name = os.environ.get("BENCH_MODEL", "RN50")
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    import jax

    e2e = run_e2e(model_name, per_chip_batch, steps, warmup)
    del jax
    print(json.dumps(dict({
        "metric": f"{model_name} CLIP host-fed e2e train throughput",
        "value": e2e["images_per_sec_per_chip"],
        "unit": "images/sec/chip",
        "vs_baseline": round(e2e["images_per_sec_per_chip"] / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    }, **{k: v for k, v in e2e.items() if k != "images_per_sec_per_chip"})))


def _step_cost_analysis(step, args):
    """HLO cost analysis of the compiled train step: total model FLOPs and
    HLO-boundary bytes accessed per step (reference analogue: the FLOPs
    profiler, deps/open_clip/src/training/profiler.py)."""
    try:
        compiled = getattr(step, "jitted", step).lower(*args).compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        flops = float(costs.get("flops", 0.0))
        bytes_accessed = float(costs.get("bytes accessed", 0.0))
        return flops, bytes_accessed
    except Exception as exn:  # pragma: no cover - backend dependent
        sys.stderr.write(f"cost analysis unavailable: {exn}\n")
        return 0.0, 0.0


def _roofline_anchors(steps: int = 10):
    """Measured speed-of-light anchors on THIS device/terminal: peak HBM
    streaming GB/s (elementwise copy+scale over a large bf16 buffer) and
    peak MXU TF/s (8192^3 bf16 matmul). The datasheet numbers (819 GB/s,
    197 TF/s for v5e) can be unreachable through a given client stack —
    these anchor the MFU/bandwidth ratios to reality."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((512, 1024, 1024), jnp.bfloat16)  # 1 GiB

    @jax.jit
    def stream(x):
        return x * jnp.bfloat16(1.000001)

    y = stream(x)
    float(jnp.sum(y[0, 0, :2]).astype(jnp.float32))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(steps):
        y = stream(y)
    float(jnp.sum(y[0, 0, :2]).astype(jnp.float32))
    dt = time.perf_counter() - t0
    gbps = 2 * x.size * x.dtype.itemsize * steps / dt / 1e9  # read + write

    a = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return jnp.dot(a, a, preferred_element_type=jnp.bfloat16)

    b = mm(a)
    float(jnp.sum(b[0, :2]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        b = mm(a)  # in-order device queue: syncing the last syncs them all
    float(jnp.sum(b[0, :2]).astype(jnp.float32))
    dt = time.perf_counter() - t0
    tflops = 2 * (8192 ** 3) * steps / dt / 1e12
    return round(gbps, 1), round(tflops, 1)


def main():
    import jax
    import numpy as np

    from xclip_tpu.core.precision import get_policy
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    model_name = os.environ.get("BENCH_MODEL", "RN50")
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))

    n_chips = jax.device_count()
    mesh = create_mesh()
    model, params, state = create_model(model_name, precision="bf16")
    tx = optim.adamw(schedule.cosine_lr(1e-3, 500, 10000), weight_decay=0.2)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, mesh,
        TrainStepCfg(precision="bf16", accum_freq=1,
                     grad_checkpointing=os.environ.get("BENCH_REMAT") == "1",
                     local_loss=True),
    )

    # A/B knob: TPU compiler flags via PJRT compiler_options (XLA_FLAGS is
    # parsed client-side on this relay terminal and rejects TPU flags, but
    # per-compile options reach the server-side compiler).
    # e.g. BENCH_COMPILER_OPTIONS='{"xla_tpu_scoped_vmem_limit_kib":"65536"}'
    compiler_options = os.environ.get("BENCH_COMPILER_OPTIONS")
    if compiler_options:
        opts = json.loads(compiler_options)
        base_jitted = step.jitted

        class _CompiledWithOpts:
            """Single lower+compile with the A/B options; the SAME
            executable serves the timing loop and the cost analysis, so
            the roofline numbers describe the executable being timed."""

            def __init__(self):
                self.compiled = None

            def _get(self, *args):
                if self.compiled is None:
                    self.compiled = base_jitted.lower(*args).compile(
                        compiler_options=opts)
                return self.compiled

            def __call__(self, *args):
                return self._get(*args)(*args)

            def lower(self, *args):  # _step_cost_analysis surface
                outer = self

                class _L:
                    def compile(self_inner):
                        return outer._get(*args)

                return _L()

        step = _CompiledWithOpts()
        step.jitted = step  # cost analysis goes through our lower()

    global_batch = per_chip_batch * n_chips
    size = model.cfg.image_size
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "images": rng.randn(global_batch, size, size, 3).astype(np.float32),
        "texts": rng.randint(1, 49000, size=(global_batch, 77)).astype(np.int32),
    })

    if os.environ.get("BENCH_SKIP_COST") == "1":
        flops_per_step, bytes_per_step = 0.0, 0.0
    else:
        flops_per_step, bytes_per_step = _step_cost_analysis(
            step, (params, state, opt_state, batch))

    for _ in range(warmup):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])  # value fetch = hard sync (block_until_ready is
    # unreliable over the experimental axon relay)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])  # every step chains through donated params
    dt = time.perf_counter() - t0

    step_time = dt / steps
    imgs_per_sec = global_batch * steps / dt
    per_chip = imgs_per_sec / n_chips

    # secondary: eval-path (encode_image, the LSO feature-extraction hot
    # loop) throughput — reported as an extra key on the same JSON line.
    eval_per_chip = None
    if os.environ.get("BENCH_SKIP_EVAL") != "1":
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

    result = {
        "metric": f"{model_name} CLIP train throughput",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        "step_time_ms": round(step_time * 1e3, 2),
    }
    if eval_per_chip is not None:
        result["eval_images_per_sec_per_chip"] = round(eval_per_chip, 2)
    if flops_per_step > 0:
        # roofline accounting: is the step compute- or bandwidth-limited,
        # and how far from the v5e speed of light is it?
        achieved_tflops = flops_per_step / step_time / 1e12 / n_chips
        effective_gbps = bytes_per_step / step_time / 1e9 / n_chips
        result.update({
            "model_tflops_per_step": round(flops_per_step / 1e12, 3),
            "achieved_tflops_per_chip": round(achieved_tflops, 2),
            "mfu": round(achieved_tflops / V5E_PEAK_TFLOPS, 4),
            "hlo_bytes_per_step_gb": round(bytes_per_step / 1e9, 3),
            "effective_hbm_gbps": round(effective_gbps, 1),
            "hbm_utilization": round(effective_gbps / V5E_HBM_GBPS, 4),
        })
        if os.environ.get("BENCH_SKIP_ANCHORS") != "1":
            try:
                streaming_gbps, matmul_tflops = _roofline_anchors()
                result.update({
                    # measured speed of light on THIS terminal: the honest
                    # denominators for the mfu / bandwidth ratios above
                    "measured_peak_hbm_gbps": streaming_gbps,
                    "measured_peak_matmul_tflops": matmul_tflops,
                    "mfu_vs_measured_peak": round(
                        achieved_tflops / matmul_tflops, 4) if matmul_tflops else None,
                })
            except Exception as exn:  # pragma: no cover - backend dependent
                sys.stderr.write(f"roofline anchors unavailable: {exn}\n")

    if os.environ.get("BENCH_SKIP_E2E") != "1":
        try:
            result["e2e"] = run_e2e(model_name, per_chip_batch,
                                    steps=min(steps, 12), warmup=2)
        except Exception as exn:  # pragma: no cover - host/env dependent
            sys.stderr.write(f"e2e bench unavailable: {exn}\n")

    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_E2E") == "1":
        main_e2e()
    else:
        main()
