"""Benchmark: RN50 CLIP contrastive training throughput (images/sec/chip).

Measures the reference's headline meter — samples_per_second_per_gpu =
accum_freq * batch_size / batch_time (deps/open_clip/src/training/
train.py:216-217) — for the full jitted train step (forward + backward +
AdamW + logit-scale clamp) on synthetic device-resident data, isolating
device throughput exactly like the reference's gpu_time meter.

Artifact contract (hard-learned in round 3, where a 9-minute default run
timed out and produced zero output): the HEADLINE JSON line — {"metric",
"value", "unit", "vs_baseline", "step_time_ms"} plus the roofline keys,
which are free because the timing loop and the cost analysis share ONE
compiled executable — is printed and flushed IMMEDIATELY after the device
timing loop. Everything else (speed-of-light anchors, eval-path rate, the
reference's accum-freq-2 headline config, the host-fed e2e pipeline) runs
afterwards under a wall-clock budget (BENCH_BUDGET_S, default 330s from
process start; BENCH_FULL=1 removes the budget), each phase appending its
own flushed JSON line as it completes. A final consolidated headline line
(same metric name, superset of keys) is printed last so a last-line parser
sees everything that landed.

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

_T0 = time.monotonic()


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _trace(phase: str):
    """BENCH_TRACE=1: stderr timestamps for the headline phases, to attribute
    the time-to-headline (the artifact's survival constraint) to import /
    init / transfer / compile / timing-loop on a given terminal."""
    if os.environ.get("BENCH_TRACE") == "1":
        sys.stderr.write(f"[trace +{time.monotonic() - _T0:7.1f}s] {phase}\n")
        sys.stderr.flush()


def _budget_left(estimate_s: float) -> bool:
    """True if the phase (estimated cost estimate_s) fits the wall budget."""
    if os.environ.get("BENCH_FULL") == "1":
        return True
    budget = float(os.environ.get("BENCH_BUDGET_S", "330"))
    return (time.monotonic() - _T0) + estimate_s < budget


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

    # double-buffered host->device placement: batch N+1 transfers while the
    # device runs step N (xclip_tpu.data.device_prefetch, same as the train
    # CLI's --batch-prefetch path), so batch_time ~ max(transfer, compute)
    # instead of their sum
    from xclip_tpu.data.device_prefetch import DevicePrefetcher

    depth = int(os.environ.get("BENCH_PREFETCH", "2"))
    it = iter(DevicePrefetcher(batches(), lambda b: shard_batch(mesh, b), depth=depth)) \
        if depth > 0 else map(lambda b: shard_batch(mesh, b), batches())
    try:
        # warmup (includes compile) with a hard sync at the end
        for _ in range(warmup):
            params, state, opt_state, metrics = step(params, state, opt_state, next(it))
        float(metrics["loss"])

        # steady state: per-step host wait (decode + any un-hidden transfer)
        # is measured directly; device work is pipelined (donated params
        # chain step-to-step) and synced once at the end — per-step value
        # fetches would add a relay RTT to every step.
        data_t = []
        t0 = time.perf_counter()
        end = t0
        for _ in range(steps):
            batch = next(it)
            data_t.append(time.perf_counter() - end)
            params, state, opt_state, metrics = step(params, state, opt_state, batch)
            end = time.perf_counter()
        float(metrics["loss"])
        batch_time = (time.perf_counter() - t0) / steps
        data_time = float(np.mean(data_t))
    finally:
        if hasattr(it, "close"):
            it.close()  # stop the producer before the decode-only probe
    # uint8 batch bytes shipped host->device per step: on a tunneled (axon
    # relay) terminal the ~18-23 MB/s link (session-varying) makes THIS the
    # e2e ceiling, not decode. With the double-buffered prefetcher the
    # steady state is batch_time ~ pure transfer time (decode + compute
    # fully hidden): measured r5, implied_transfer_mbps == the probe-
    # measured wire rate, i.e. ~100% wire utilization vs ~75% for the r4
    # serialized loop. On a real TPU host (PCIe/DMA) the decode ceiling
    # (decode_only_images_per_sec) governs instead.
    batch_mb = global_batch * model.cfg.image_size ** 2 * 3 / 1e6
    return {
        "images_per_sec_per_chip": round(global_batch / batch_time / jax.device_count(), 2),
        "data_time": round(data_time, 4),
        "batch_time": round(batch_time, 4),
        "stall_fraction": round(max(data_time, 0.0) / batch_time, 4),
        "workers": workers,
        "prefetch_depth": depth,
        "decode_only_images_per_sec": round(
            decode_only_rate(tsv, model.cfg.image_size), 1),
        "host_cores": os.cpu_count(),
        "host_to_device_mb_per_batch": round(batch_mb, 1),
        "implied_transfer_mbps": round(batch_mb / batch_time, 1),
    }


def main_e2e():
    """Standalone host-fed mode (BENCH_E2E=1)."""
    model_name = os.environ.get("BENCH_MODEL", "RN50")
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    import jax

    _force_platform()
    e2e = run_e2e(model_name, per_chip_batch, steps, warmup)
    del jax
    _emit(dict({
        "metric": f"{model_name} CLIP host-fed e2e train throughput",
        "value": e2e["images_per_sec_per_chip"],
        "unit": "images/sec/chip",
        "vs_baseline": round(e2e["images_per_sec_per_chip"] / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    }, **{k: v for k, v in e2e.items() if k != "images_per_sec_per_chip"}))


class CompiledStep:
    """One lower+compile serving BOTH the timing loop and the cost analysis:
    the roofline numbers always describe the executable being timed, and the
    headline never pays a second compile (round 3's artifact killer).
    Optionally forwards PJRT compiler_options (the A/B knob — XLA_FLAGS is
    parsed client-side on this relay terminal and rejects TPU flags, but
    per-compile options reach the server-side compiler)."""

    def __init__(self, jitted, options=None):
        self.jitted = jitted
        self.options = options
        self.compiled = None

    def compile(self, *args):
        if self.compiled is None:
            lowered = self.jitted.lower(*args)
            self.compiled = (
                lowered.compile(compiler_options=self.options)
                if self.options else lowered.compile()
            )
        return self.compiled

    def __call__(self, *args):
        return self.compile(*args)(*args)

    def cost_analysis(self):
        """(model_flops, hlo_bytes_accessed) per step, or (0, 0)."""
        try:
            costs = self.compiled.cost_analysis()
            if isinstance(costs, (list, tuple)):
                costs = costs[0]
            return float(costs.get("flops", 0.0)), float(costs.get("bytes accessed", 0.0))
        except Exception as exn:  # pragma: no cover - backend dependent
            sys.stderr.write(f"cost analysis unavailable: {exn}\n")
            return 0.0, 0.0


def _time_step(step, params, state, opt_state, batch, warmup, steps):
    """Warmup + timed loop; returns (step_time_s, final carry). Syncs via a
    scalar fetch (block_until_ready is unreliable over the axon relay)."""
    for _ in range(warmup):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
    float(metrics["loss"])  # every step chains through donated params
    return (time.perf_counter() - t0) / steps, (params, state, opt_state)


def _env_versions():
    """Client vs terminal stack versions (VERDICT r3 #2c: the Pallas/Mosaic
    122 GB/s wall was attributed to a client/terminal libtpu mismatch —
    record both sides so the comparison is in the artifact)."""
    import jax
    import jaxlib

    out = {
        "metric": "bench environment",
        "jax": jax.__version__,
        "jaxlib": jaxlib.version.__version__,
    }
    try:
        import libtpu
        out["client_libtpu"] = getattr(libtpu, "__version__", "unknown")
    except Exception:
        out["client_libtpu"] = None
    try:
        dev = jax.devices()[0]
        out["terminal_platform_version"] = dev.client.platform_version
        out["device_kind"] = dev.device_kind
    except Exception as exn:  # pragma: no cover
        out["terminal_platform_version"] = f"unavailable: {exn}"
    return out


def _roofline_anchors(steps: int = 10):
    """Measured speed-of-light anchors on THIS device/terminal, as a dict.

    Three INDEPENDENT bandwidth probes with different access patterns —
    bf16 copy*scale (read+write, the r2-r4 anchor), fp32 axpy (2 reads +
    1 write, different dtype/arity), and a large fp32 sum-reduction (read-
    only) — plus the 8192^3 bf16 matmul MXU anchor. If the three bandwidth
    numbers agree, the "terminal HBM ceiling" claim is corroborated (the
    wall is the memory system as seen through this client stack, not one
    kernel's schedule); if they diverge, the highest one is recoverable
    bandwidth the step schedule is leaving on the table. The datasheet
    numbers (819 GB/s, 197 TF/s for v5e) can be unreachable through a
    given client stack — these anchor the MFU/bandwidth ratios to reality."""
    import jax
    import jax.numpy as jnp

    out = {}

    def timed(fn, *args):
        y = fn(*args)
        float(jnp.sum(jnp.ravel(y)[:2]).astype(jnp.float32))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(steps):
            y = fn(*args)  # in-order device queue: syncing the last syncs all
        float(jnp.sum(jnp.ravel(y)[:2]).astype(jnp.float32))
        return (time.perf_counter() - t0) / steps

    # Probe ops are sized so DEVICE time (~15-30ms each) dominates the
    # ~10ms relay enqueue latency: the async in-order queue then pipelines
    # dispatch under execution and the measurement is execution-bound.
    # (r5 finding: the previous 1 GiB/768 MiB shapes ran ~5ms on device and
    # the per-dispatch numbers were relay-deflated — 122-134 TF/s for the
    # matmul vs 163 TF/s measured with dispatch amortized; do NOT shrink
    # these, and do NOT "fix" it with chained elementwise ops instead —
    # XLA fuses/folds chains so their pass count is not what you wrote.)

    # 1) bf16 streaming copy*scale: 1 read + 1 write (8 GiB traffic)
    x = jnp.ones((2048, 1024, 1024), jnp.bfloat16)  # 4 GiB
    stream = jax.jit(lambda x: x * jnp.bfloat16(1.000001))
    dt = timed(stream, x)
    out["hbm_gbps_bf16_stream"] = round(2 * x.size * x.dtype.itemsize / dt / 1e9, 1)
    del x

    # 2) fp32 axpy: 2 reads + 1 write, fp32 lanes (6 GiB traffic)
    xa = jnp.ones((512, 1024, 1024), jnp.float32)  # 2 GiB each
    ya = jnp.full((512, 1024, 1024), 0.5, jnp.float32)
    axpy = jax.jit(lambda x, y: jnp.float32(1.0000001) * x + y)
    dt = timed(axpy, xa, ya)
    out["hbm_gbps_fp32_axpy"] = round(3 * xa.size * 4 / dt / 1e9, 1)
    del ya

    # 3) fp32 reduction: read-only traffic (no write stream at all)
    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
    dt = timed(red, xa)
    out["hbm_gbps_fp32_reduce"] = round(xa.size * 4 / dt / 1e9, 1)
    del xa

    # 4) MXU: 12288^3 bf16 matmul (3.7 TFLOP -> ~23ms at the measured peak)
    a = jnp.ones((12288, 12288), jnp.bfloat16)
    mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.bfloat16))
    dt = timed(mm, a)
    out["matmul_tflops"] = round(2 * (12288 ** 3) / dt / 1e12, 1)
    del a

    # spread over the two STREAMING probes (read+write patterns, the step's
    # traffic shape). r5 correction: with dispatch-hidden sizing these
    # measure 429 (bf16) / 507 (fp32 axpy) GB/s — the r2-r4 "350±16 wall"
    # was deflated by ~10ms relay enqueue latency on ~5ms ops, NOT a
    # terminal ceiling; the probes now bracket a pattern-dependent
    # 52-62%-of-datasheet range (spread ~0.15 is the bf16-vs-fp32 lane
    # difference, not noise). The reduce-only probe is reported but
    # excluded from the peak (it lands below streaming).
    bws = [out["hbm_gbps_bf16_stream"], out["hbm_gbps_fp32_axpy"]]
    out["hbm_gbps_best"] = max(bws + [out["hbm_gbps_fp32_reduce"]])
    out["hbm_stream_anchor_spread"] = round((max(bws) - min(bws)) / max(bws), 4)
    return out


def _force_platform():
    """BENCH_PLATFORM=cpu pins the backend via the CONFIG (the axon
    sitecustomize hook overrides the JAX_PLATFORMS env var) — used by the
    artifact-contract test to exercise the real bench flow off-TPU."""
    import jax

    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    try:
        # Persistent client-side compile cache (same scheme as the dryrun's):
        # the headline's time-to-print is dominated by the train-step compile
        # over the relay (164-380s observed across sessions), so a primed
        # cache is the difference between a comfortable artifact and a
        # timeout. BENCH_NO_CACHE=1 forces a cold compile for A/B honesty;
        # BENCH_CACHE_DIR overrides the (per-user) default location.
        if os.environ.get("BENCH_NO_CACHE") != "1":
            import tempfile

            cache_dir = os.environ.get("BENCH_CACHE_DIR") or os.path.join(
                tempfile.gettempdir(), f"xclip_bench_cache_{os.getuid()}")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            _trace(f"persistent compile cache enabled at {cache_dir}")
    except Exception as exn:  # pragma: no cover - jax-version dependent
        sys.stderr.write(f"warning: compile cache config failed ({exn}); "
                         "compiles will be cold\n")


def main():
    import jax
    import numpy as np

    _force_platform()

    from xclip_tpu.core.precision import get_policy
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    model_name = os.environ.get("BENCH_MODEL", "RN50")
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))
    compiler_options = os.environ.get("BENCH_COMPILER_OPTIONS")
    options = json.loads(compiler_options) if compiler_options else None

    _trace("imports done")
    n_chips = jax.device_count()
    _trace("device_count (backend up)")
    mesh = create_mesh()
    model, params, state = create_model(model_name, precision="bf16")
    _trace("model created (params on device)")
    # BENCH_MU_DTYPE=bfloat16 A/Bs a bf16 first-moment store (saves ~0.8GB
    # of HBM traffic per step on RN50); default fp32 = reference parity.
    mu_dtype = os.environ.get("BENCH_MU_DTYPE")
    if mu_dtype is not None and mu_dtype not in ("bfloat16", "float32"):
        raise SystemExit(
            f"BENCH_MU_DTYPE={mu_dtype!r} invalid: use 'bfloat16' or 'float32'")
    tx = optim.adamw(schedule.cosine_lr(1e-3, 500, 10000), weight_decay=0.2,
                     mu_dtype=mu_dtype)
    opt_state = tx.init(params)
    _trace("optimizer state init")
    step = CompiledStep(
        make_train_step(
            model, tx, mesh,
            TrainStepCfg(precision="bf16", accum_freq=1,
                         grad_checkpointing=os.environ.get("BENCH_REMAT") == "1",
                         local_loss=True),
        ).jitted,
        options,
    )

    global_batch = per_chip_batch * n_chips
    size = model.cfg.image_size
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "images": rng.randn(global_batch, size, size, 3).astype(np.float32),
        "texts": rng.randint(1, 49000, size=(global_batch, 77)).astype(np.int32),
    })

    _trace("batch on device")
    step.compile(params, state, opt_state, batch)
    _trace("train step compiled")
    if os.environ.get("BENCH_SKIP_COST") == "1":
        flops_per_step, bytes_per_step = 0.0, 0.0
    else:
        flops_per_step, bytes_per_step = step.cost_analysis()
    _trace("cost analysis done")

    step_time, (params, state, opt_state) = _time_step(
        step, params, state, opt_state, batch, warmup, steps)
    _trace("timing loop done")
    per_chip = global_batch / step_time / n_chips

    # ---- HEADLINE: printed + flushed the moment the timing loop ends ----
    result = {
        "metric": f"{model_name} CLIP train throughput",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        "step_time_ms": round(step_time * 1e3, 2),
        "elapsed_s": round(time.monotonic() - _T0, 1),
    }
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
    _emit(result)

    # ---- extras: budget-gated, each appends its own flushed JSON line ----
    try:
        _emit(_env_versions())
    except Exception as exn:  # pragma: no cover
        sys.stderr.write(f"env versions unavailable: {exn}\n")

    if os.environ.get("BENCH_SKIP_ANCHORS") != "1" and _budget_left(20):
        try:
            t0 = time.monotonic()
            probes = _roofline_anchors()
            peak_gbps = probes["hbm_gbps_best"]
            matmul_tflops = probes["matmul_tflops"]
            anchors = {
                # measured speed of light on THIS terminal: the honest
                # denominators for the mfu / bandwidth ratios above. Three
                # independent bandwidth probes (VERDICT r4 #1) corroborate
                # or refute the terminal-ceiling claim; the normalized value
                # extrapolates the headline to datasheet HBM bandwidth —
                # the step is streaming-bound at the measured wall.
                "metric": f"{model_name} roofline anchors",
                "measured_peak_hbm_gbps": peak_gbps,
                "measured_peak_matmul_tflops": matmul_tflops,
                **{k: v for k, v in probes.items()
                   if k not in ("hbm_gbps_best", "matmul_tflops")},
                "hbm_fraction_of_datasheet": round(peak_gbps / V5E_HBM_GBPS, 4),
                "bandwidth_normalized_value": round(
                    per_chip * V5E_HBM_GBPS / peak_gbps, 1) if peak_gbps else None,
                "phase_seconds": round(time.monotonic() - t0, 1),
            }
            if flops_per_step > 0 and matmul_tflops:
                anchors["mfu_vs_measured_peak"] = round(
                    flops_per_step / step_time / 1e12 / n_chips / matmul_tflops, 4)
            # perfect-fusion traffic floor (jaxpr walk, no device compute):
            # floor/measured-bandwidth is the bandwidth-roofline step time;
            # attainment near 1.0 == the schedule moves ~minimum bytes at
            # the measured wall (the committed answer to VERDICT r4 #1)
            try:
                from xclip_tpu.utils.traffic import (
                    bandwidth_roofline_seconds, min_bytes_per_step)

                fl = min_bytes_per_step(
                    lambda p, s, o, b: step.jitted(p, s, o, b),
                    params, state, opt_state, batch,
                    include_adamw_over=params)
                floor = fl["total"]
                # two-class roofline: the AdamW pass is fp32 axpy-shaped
                # (charged at the fp32 streaming rate), everything else in
                # the bf16 compute path at the bf16 streaming rate — using
                # one max-rate for all bytes overstates the roofline
                adamw_b = fl["by_kind"].get("adamw", 0)
                bf16_rate = probes.get("hbm_gbps_bf16_stream", peak_gbps)
                fp32_rate = probes.get("hbm_gbps_fp32_axpy", peak_gbps)
                roofline_s = bandwidth_roofline_seconds(
                    floor, adamw_b, bf16_rate, fp32_rate)
                anchors["min_bytes_per_step_gb"] = round(floor / 1e9, 3)
                anchors["bandwidth_roofline_ms"] = round(roofline_s * 1e3, 1)
                anchors["roofline_attainment"] = round(roofline_s / step_time, 4)
            except Exception as exn:  # pragma: no cover
                sys.stderr.write(f"traffic floor unavailable: {exn}\n")
            result.update({k: v for k, v in anchors.items() if k != "metric"})
            _emit(anchors)
        except Exception as exn:  # pragma: no cover - backend dependent
            sys.stderr.write(f"roofline anchors unavailable: {exn}\n")

    if os.environ.get("BENCH_SKIP_EVAL") != "1" and _budget_left(35):
        try:
            t0 = time.monotonic()
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
            t1 = time.perf_counter()
            for _ in range(steps):
                feats = encode(params, state, eval_imgs)
            float(np.asarray(feats)[0, 0])
            eval_per_chip = eval_batch * steps / (time.perf_counter() - t1)
            result["eval_images_per_sec_per_chip"] = round(eval_per_chip, 2)
            _emit({
                "metric": f"{model_name} eval-path encode throughput",
                "value": round(eval_per_chip, 2),
                "unit": "images/sec/chip",
                "phase_seconds": round(time.monotonic() - t0, 1),
            })
        except Exception as exn:  # pragma: no cover
            sys.stderr.write(f"eval bench unavailable: {exn}\n")

    # SAE trainer throughput at the reference config — 1024-d activations,
    # 4096 learned features, train batch 4096 (scripts/train_sae.py:326-377)
    # — on device-synthesized activations (the shard IO is benched by the
    # e2e/decode phases; this isolates the jitted step rate).
    if os.environ.get("BENCH_SKIP_SAE") != "1" and _budget_left(30):
        try:
            t0 = time.monotonic()
            import jax.numpy as jnp

            from xclip_tpu.sae.losses import SAELossCfg
            from xclip_tpu.sae.model import SAECfg, sae_init
            from xclip_tpu.sae.optim import adam as sae_adam
            from xclip_tpu.sae.pipeline import Pipeline

            sae_bs = int(os.environ.get("BENCH_SAE_BATCH", "4096"))
            pipe = Pipeline(
                sae_init(jax.random.PRNGKey(0), SAECfg(1024, 4096)),
                SAELossCfg(), sae_adam(1e-4), checkpoint_directory="/tmp",
            )
            acts = jax.random.normal(jax.random.PRNGKey(1), (sae_bs, 1024), jnp.float32)
            p, o = pipe.params, pipe.opt_state
            # K steps per dispatch via lax.scan: the ~3ms SAE step is
            # dispatch-bound over the relay when dispatched one-at-a-time
            # (measured 183-350 steps/s swinging with relay-day latency);
            # scanning isolates the device step rate
            K = 10

            @jax.jit
            def k_steps(p, o):
                def body(carry, _):
                    p, o = carry
                    p2, o2, m, _ = pipe._train_step(p, o, acts)
                    return (p2, o2), m["total_loss"]
                (p, o), losses = jax.lax.scan(body, (p, o), None, length=K)
                return p, o, losses[-1]

            p, o, last = k_steps(p, o)  # compile
            float(last)
            reps = max(2, max(20, steps) // K)
            t1 = time.perf_counter()
            for _ in range(reps):
                p, o, last = k_steps(p, o)
            float(last)
            sae_rate = reps * K / (time.perf_counter() - t1)
            result["sae_steps_per_sec"] = round(sae_rate, 2)
            result["sae_activations_per_sec"] = round(sae_rate * sae_bs, 1)
            _emit({
                "metric": "SAE train throughput (1024->4096, batch 4096)",
                "value": round(sae_rate, 2),
                "unit": "steps/sec",
                "activations_per_sec": round(sae_rate * sae_bs, 1),
                "phase_seconds": round(time.monotonic() - t0, 1),
            })
            del p, o, acts, pipe
        except Exception as exn:  # pragma: no cover
            sys.stderr.write(f"sae bench unavailable: {exn}\n")

    # features-caching rate: encode + fetch to host (save_domainnet_features
    # hot loop — evals/features.py extract_image_features) with uint8 input
    # shipping and fp16 feature fetch; on a tunneled terminal the fetch link
    # bounds this, on a real host it is encode-bound (~eval rate).
    if os.environ.get("BENCH_SKIP_FEATCACHE") != "1" and _budget_left(45):
        try:
            t0 = time.monotonic()
            import jax.numpy as jnp

            from xclip_tpu.core.precision import get_policy as _gp

            fc_batch = int(os.environ.get("BENCH_FEATCACHE_BATCH", "250"))
            imgs_u8 = rng.randint(0, 255, (fc_batch, size, size, 3), np.uint8)

            @jax.jit
            def encode_u8(p, s, images):
                x = (images.astype(jnp.float32) / 255.0 - 0.45) / 0.27
                feats, _, _ = model.encode_image(
                    p, x, state=s, normalize=True, dtype=_gp("bf16").compute_dtype)
                return feats.astype(jnp.float16)

            out = np.asarray(encode_u8(params, state, jax.device_put(imgs_u8)))
            fc_steps = max(6, steps // 3)
            t1 = time.perf_counter()
            for _ in range(fc_steps):
                dev = jax.device_put(imgs_u8)
                out = np.asarray(encode_u8(params, state, dev))  # host fetch = cache write
            fc_rate = fc_batch * fc_steps / (time.perf_counter() - t1)
            result["feature_cache_images_per_sec"] = round(fc_rate, 1)
            _emit({
                "metric": f"{model_name} feature-cache throughput (encode + host fetch)",
                "value": round(fc_rate, 1),
                "unit": "images/sec/chip",
                "feature_dim": int(out.shape[-1]),
                "phase_seconds": round(time.monotonic() - t0, 1),
            })
        except Exception as exn:  # pragma: no cover
            sys.stderr.write(f"feature-cache bench unavailable: {exn}\n")

    # the reference's actual headline config: per-device batch 128 with
    # --accum-freq 2 (effective 1024 over 4 GPUs; slurm/train-clip.sh:120-127,
    # BASELINE.md). samples_per_second_per_gpu counts accum_freq*batch per
    # step (train.py:216-217).
    if os.environ.get("BENCH_SKIP_ACCUM2") != "1" and _budget_left(150):
        try:
            t0 = time.monotonic()
            model2, params2, state2 = create_model(model_name, precision="bf16")
            opt_state2 = tx.init(params2)
            step2 = CompiledStep(
                make_train_step(
                    model2, tx, mesh,
                    TrainStepCfg(precision="bf16", accum_freq=2,
                                 grad_checkpointing=False, local_loss=True),
                ).jitted,
                options,
            )
            batch2 = shard_batch(mesh, {
                "images": rng.randn(2 * global_batch, size, size, 3).astype(np.float32),
                "texts": rng.randint(1, 49000, size=(2 * global_batch, 77)).astype(np.int32),
            })
            st2, _ = _time_step(step2, params2, state2, opt_state2, batch2,
                                max(2, warmup - 2), max(8, steps // 2))
            accum2_per_chip = 2 * global_batch / st2 / n_chips
            result["accum2_images_per_sec_per_chip"] = round(accum2_per_chip, 2)
            _emit({
                "metric": f"{model_name} CLIP train throughput (accum-freq 2, reference headline config)",
                "value": round(accum2_per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(accum2_per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
                "step_time_ms": round(st2 * 1e3, 2),
                "phase_seconds": round(time.monotonic() - t0, 1),
            })
            del params2, state2, opt_state2, batch2, step2
        except Exception as exn:  # pragma: no cover
            sys.stderr.write(f"accum2 bench unavailable: {exn}\n")

    if os.environ.get("BENCH_SKIP_E2E") != "1" and _budget_left(180):
        try:
            t0 = time.monotonic()
            e2e = run_e2e(model_name, per_chip_batch, steps=min(steps, 12), warmup=2)
            e2e["phase_seconds"] = round(time.monotonic() - t0, 1)
            result["e2e"] = e2e
            _emit(dict({"metric": f"{model_name} host-fed e2e pipeline"}, **e2e))
        except Exception as exn:  # pragma: no cover - host/env dependent
            sys.stderr.write(f"e2e bench unavailable: {exn}\n")

    # ---- consolidated headline (superset) as the LAST line ----
    _emit(result)


if __name__ == "__main__":
    if os.environ.get("BENCH_E2E") == "1":
        main_e2e()
    else:
        main()
