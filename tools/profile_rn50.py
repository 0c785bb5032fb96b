"""Per-component timing attribution for the RN50 CLIP train step.

Measurement rules for the axon relay (learned the hard way):
- fetch ONLY scalars (device_get of an array streams it at ~23 MB/s);
- loop on device via lax.scan inside one jit (per-dispatch RTT ~27ms);
- make the loop body depend on the carry so XLA cannot hoist it.

Roofline: TPU v5e ~197 TF/s bf16 MXU peak, ~819 GB/s HBM
(measured on this relay: 162 TF/s matmul, ~520 GB/s elementwise).

Usage: python tools/profile_rn50.py [component|stages|micro|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def timeit_scan(fn_scalar, x, iters=20, reps=3):
    """Time ``fn_scalar(x) -> scalar`` per-iteration: scan on device with a
    carry-perturbed input so the body can't be hoisted, fetch one scalar.

    The timed dispatch carries the relay RTT (~10-27ms) ONCE per
    measurement, so the per-iteration error is RTT/iters — keep ``iters``
    large enough that it's negligible against the body time (a 10-iter
    measurement of a 2ms body reads ~2.5ms/iter too high; this bit the
    r5 per-stage numbers). ``reps`` takes the best of several dispatches
    to shed scheduling outliers."""
    iters = max(iters, 50)

    @jax.jit
    def run(x):
        def body(carry, _):
            xp = jax.tree_util.tree_map(
                lambda a: a + jnp.asarray(carry * 1e-30, a.dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
                x,
            )
            return carry + fn_scalar(xp), None

        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return carry

    float(run(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def fmt(name, sec, flops=None, bytes_=None):
    line = f"{name:<44s} {sec*1e3:8.3f} ms"
    if flops:
        line += f"  {flops/sec/1e12:6.1f} TF/s ({100*flops/sec/1e12/PEAK_TFLOPS:4.1f}%)"
    if bytes_:
        line += f"  {bytes_/sec/1e9:6.1f} GB/s ({100*bytes_/sec/1e9/PEAK_GBS:4.1f}%)"
    print(line, flush=True)
    return sec


def component_breakdown(batch_size=96):
    from xclip_tpu.models.factory import create_model

    model, params, state = create_model("RN50", precision="bf16")
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch_size, 224, 224, 3).astype(np.float32))
    texts = jnp.asarray(rng.randint(1, 49000, size=(batch_size, 77)).astype(np.int32))
    bf16 = jnp.bfloat16

    print(f"== component breakdown (batch={batch_size}) ==", flush=True)

    def image_fwd(img):
        f, _, _ = model.encode_image(params, img, state=state, normalize=True, dtype=bf16, train=True)
        return jnp.sum(f.astype(jnp.float32))

    def image_fwdbwd(img):
        def loss_fn(p):
            f, _, _ = model.encode_image(p, img, state=state, normalize=True, dtype=bf16, train=True)
            return jnp.sum(f.astype(jnp.float32))
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g["visual"])) * 1e-30

    def text_fwd(img):
        f, _ = model.encode_text(params, texts, normalize=True, dtype=bf16)
        return jnp.sum(f.astype(jnp.float32)) + jnp.sum(img) * 1e-30

    def text_fwdbwd(img):
        def loss_fn(p):
            f, _ = model.encode_text(p, texts, normalize=True, dtype=bf16)
            return jnp.sum(f.astype(jnp.float32))
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jnp.sum(img) * 1e-30 + sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g["text"])) * 1e-30

    fmt("image fwd", timeit_scan(image_fwd, images, iters=10))
    fmt("image fwd+bwd", timeit_scan(image_fwdbwd, images, iters=10))
    fmt("text fwd", timeit_scan(text_fwd, images, iters=10))
    fmt("text fwd+bwd", timeit_scan(text_fwdbwd, images, iters=10))


def stage_breakdown(batch_size=96):
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.models.resnet import resnet_apply, resnet_stage_names

    model, params, state = create_model("RN50", precision="bf16")
    vp, vs = params["visual"], state["visual"]
    cfg = model.cfg.vision
    names = resnet_stage_names(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch_size, 224, 224, 3).astype(np.float32))
    bf16 = jnp.bfloat16

    print(f"== per-stage fwd / fwd+bwd (batch={batch_size}) ==", flush=True)
    total_f = total_fb = 0.0
    for idx, name in enumerate(names):
        def fwd(inp, _i=idx):
            out, _, _ = resnet_apply(vp, vs, inp, cfg, train=True, dtype=bf16, start=_i, stop=_i + 1)
            return jnp.sum(out.astype(jnp.float32))

        def fwdbwd(inp, _i=idx):
            def loss(p, inp):
                out, _, _ = resnet_apply(p, vs, inp, cfg, train=True, dtype=bf16, start=_i, stop=_i + 1)
                return jnp.sum(out.astype(jnp.float32))
            l, (gp, gi) = jax.value_and_grad(loss, argnums=(0, 1))(vp, inp)
            return l + sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(gp)) * 1e-30 \
                     + jnp.sum(gi.astype(jnp.float32)) * 1e-30

        tf_ = timeit_scan(fwd, x, iters=10)
        tfb = timeit_scan(fwdbwd, x, iters=10)
        total_f += tf_
        total_fb += tfb
        print(f"{name:<14s} in={str(x.shape):<22s} fwd {tf_*1e3:7.3f} ms   fwd+bwd {tfb*1e3:7.3f} ms", flush=True)
        x, _, _ = resnet_apply(vp, vs, x, cfg, train=True, dtype=bf16, start=idx, stop=idx + 1)
    print(f"sum fwd {total_f*1e3:.2f} ms   sum fwd+bwd {total_fb*1e3:.2f} ms", flush=True)


def micro(batch_size=96):
    from xclip_tpu.models import layers as L

    rng = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16
    print(f"== microbenchmarks (batch={batch_size}) ==", flush=True)

    shapes = [
        ("stem c1 3x3s2 3->32 @224", 224, 3, 32, 3, 2),
        ("stem c2 3x3 32->32 @112", 112, 32, 32, 3, 1),
        ("stem c3 3x3 32->64 @112", 112, 32, 64, 3, 1),
        ("L1 1x1 256->64 @56", 56, 256, 64, 1, 1),
        ("L1 3x3 64->64 @56", 56, 64, 64, 3, 1),
        ("L1 1x1 64->256 @56", 56, 64, 256, 1, 1),
        ("L2 1x1 512->128 @28", 28, 512, 128, 1, 1),
        ("L2 3x3 128->128 @28", 28, 128, 128, 3, 1),
        ("L2 1x1 128->512 @28", 28, 128, 512, 1, 1),
        ("L3 3x3 256->256 @14", 14, 256, 256, 3, 1),
        ("L4 3x3 512->512 @7", 7, 512, 512, 3, 1),
    ]
    for name, hw, cin, cout, k, stride in shapes:
        x = jax.random.normal(rng, (batch_size, hw, hw, cin), bf16)
        w = jax.random.normal(rng, (k, k, cin, cout), bf16) * 0.01
        pad = k // 2

        def conv_sum(x, _w=w, _s=stride, _p=pad):
            y = jax.lax.conv_general_dilated(
                x, _w, (_s, _s), [(_p, _p)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        out_hw = -(-hw // stride)
        flops = 2 * batch_size * out_hw * out_hw * cout * cin * k * k
        nbytes = 2 * batch_size * (hw * hw * cin + out_hw * out_hw * cout)
        fmt(name, timeit_scan(conv_sum, x, iters=20), flops=flops, bytes_=nbytes)

    x = jax.random.normal(rng, (batch_size, 56, 56, 256), bf16)
    p, s = L.batchnorm_init(256)

    def bn_sum(x):
        y, _ = L.batchnorm_apply(p, s, x, train=True)
        return jnp.sum(y.astype(jnp.float32))

    nbytes = 2 * 2 * batch_size * 56 * 56 * 256
    fmt("bn train (96,56,56,256)", timeit_scan(bn_sum, x, iters=20), bytes_=nbytes)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    bs = int(os.environ.get("BENCH_BATCH", "96"))
    if what in ("component", "all"):
        component_breakdown(bs)
    if what in ("stages", "all"):
        stage_breakdown(bs)
    if what in ("micro", "all"):
        micro(bs)
