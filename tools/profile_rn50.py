"""Per-component timing attribution for the RN50 CLIP train step.

Decomposes the bench.py step into towers/stages and runs shape-level
microbenchmarks (conv, batchnorm, copy) against the v5e roofline
(197 TF/s bf16 peak MXU, 819 GB/s HBM) to pick Pallas kernel targets.

Usage: python tools/profile_rn50.py [component|stages|micro|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # value-fetch sync (axon relay: block_until_ready may be unreliable)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def fmt(name, sec, flops=None, bytes_=None):
    line = f"{name:<42s} {sec*1e3:8.3f} ms"
    if flops:
        line += f"  {flops/sec/1e12:6.1f} TF/s ({100*flops/sec/1e12/PEAK_TFLOPS:4.1f}%)"
    if bytes_:
        line += f"  {bytes_/sec/1e9:6.1f} GB/s ({100*bytes_/sec/1e9/PEAK_GBS:4.1f}%)"
    print(line, flush=True)
    return sec


def component_breakdown(batch_size=96):
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.train import optim, schedule

    model, params, state = create_model("RN50", precision="bf16")
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch_size, 224, 224, 3).astype(np.float32))
    texts = jnp.asarray(rng.randint(1, 49000, size=(batch_size, 77)).astype(np.int32))
    bf16 = jnp.bfloat16

    @jax.jit
    def image_fwd(p, s):
        f, ns, _ = model.encode_image(p, images, state=s, normalize=True, dtype=bf16, train=True)
        return f, ns

    @jax.jit
    def image_fwdbwd(p, s):
        def loss_fn(p):
            f, ns, _ = model.encode_image(p, images, state=s, normalize=True, dtype=bf16, train=True)
            return jnp.sum(f.astype(jnp.float32)), ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return l, g

    @jax.jit
    def text_fwd(p):
        return model.encode_text(p, texts, normalize=True, dtype=bf16)

    @jax.jit
    def text_fwdbwd(p):
        def loss_fn(p):
            return jnp.sum(model.encode_text(p, texts, normalize=True, dtype=bf16).astype(jnp.float32))
        return jax.value_and_grad(loss_fn)(p)

    tx = optim.adamw(schedule.cosine_lr(1e-3, 500, 10000), weight_decay=0.2)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def opt_step(g, os_, p):
        u, nos = tx.update(g, os_, p)
        import optax
        return optax.apply_updates(p, u), nos

    print(f"== component breakdown (batch={batch_size}) ==", flush=True)
    t_if = fmt("image fwd", timeit(image_fwd, params, state))
    t_ifb = fmt("image fwd+bwd", timeit(image_fwdbwd, params, state))
    t_tf = fmt("text fwd", timeit(text_fwd, params))
    t_tfb = fmt("text fwd+bwd", timeit(text_fwdbwd, params))
    t_opt = fmt("adamw update (full 102M params)", timeit(opt_step, grads, opt_state, params))
    print(f"sum(image_fb + text_fb + opt) = {(t_ifb + t_tfb + t_opt)*1e3:.2f} ms", flush=True)

    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train.step import TrainStepCfg, make_train_step
    mesh = create_mesh()
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="bf16", accum_freq=1, local_loss=True))
    batch = shard_batch(mesh, {"images": np.asarray(images), "texts": np.asarray(texts)})

    def run_step(p, s, os_):
        return step(p, s, os_, batch)
    p2, s2, os2 = params, state, opt_state
    for _ in range(3):
        p2, s2, os2, m = run_step(p2, s2, os2)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        p2, s2, os2, m = run_step(p2, s2, os2)
    float(m["loss"])
    t_step = (time.perf_counter() - t0) / 20
    fmt("FULL train step", t_step)
    print(f"  -> {batch_size/t_step:.0f} img/s/chip", flush=True)


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
        def fwd(p, s, inp, _i=idx):
            out, ns, _ = resnet_apply(p, s, inp, cfg, train=True, dtype=bf16, start=_i, stop=_i + 1)
            return out, ns

        def fwdbwd(p, s, inp, _i=idx):
            def loss(p, inp):
                out, ns, _ = resnet_apply(p, s, inp, cfg, train=True, dtype=bf16, start=_i, stop=_i + 1)
                return jnp.sum(out.astype(jnp.float32)), ns
            (l, ns), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(p, inp)
            return l, g

        jf = jax.jit(fwd)
        jfb = jax.jit(fwdbwd)
        tf_ = timeit(jf, vp, vs, x, iters=10)
        tfb = timeit(jfb, vp, vs, x, iters=10)
        total_f += tf_
        total_fb += tfb
        print(f"{name:<14s} in={str(x.shape):<22s} fwd {tf_*1e3:7.3f} ms   fwd+bwd {tfb*1e3:7.3f} ms", flush=True)
        x, _, _ = resnet_apply(vp, vs, x, cfg, train=True, dtype=bf16, start=idx, stop=idx + 1)
        x = jax.block_until_ready(x)
    print(f"sum fwd {total_f*1e3:.2f} ms   sum fwd+bwd {total_fb*1e3:.2f} ms", flush=True)


def micro(batch_size=96):
    from xclip_tpu.models import layers as L

    rng = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16
    print(f"== microbenchmarks (batch={batch_size}) ==", flush=True)

    # --- layout/copy probe: does C<128 NHWC cost padded traffic?
    for C in (32, 64, 128, 256):
        hw = 56
        x = jax.random.normal(rng, (batch_size, hw, hw, C), bf16)
        f = jax.jit(lambda x: x + jnp.bfloat16(1.0))
        nbytes = 2 * 2 * batch_size * hw * hw * C
        fmt(f"copy+1 NHWC C={C:<4d} ({batch_size},{hw},{hw},{C})", timeit(f, x), bytes_=nbytes)
    # flat reference copy
    x = jax.random.normal(rng, (batch_size * 56 * 56, 256), bf16)
    fmt("copy+1 flat (301056,256)", timeit(jax.jit(lambda x: x + jnp.bfloat16(1.0)), x),
        bytes_=2 * 2 * batch_size * 56 * 56 * 256)

    # --- conv shapes from RN50 stages (fwd only)
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

        def conv(x, w, _s=stride, _p=pad):
            return jax.lax.conv_general_dilated(
                x, w, (_s, _s), [(_p, _p)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        jc = jax.jit(conv)
        out_hw = hw // stride
        flops = 2 * batch_size * out_hw * out_hw * cout * cin * k * k
        nbytes = 2 * batch_size * (hw * hw * cin + out_hw * out_hw * cout)
        fmt(name, timeit(jc, x, w), flops=flops, bytes_=nbytes)

    # --- batchnorm train-mode at stage-1 shape
    x = jax.random.normal(rng, (batch_size, 56, 56, 256), bf16)
    p, s = L.batchnorm_init(256)
    jbn = jax.jit(lambda p, s, x: L.batchnorm_apply(p, s, x, train=True))
    nbytes = 2 * 2 * batch_size * 56 * 56 * 256  # 1r stats + 1r+1w norm at minimum -> report vs 2x
    fmt("bn train (96,56,56,256)", timeit(jbn, p, s, x), bytes_=nbytes)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    bs = int(os.environ.get("BENCH_BATCH", "96"))
    if what in ("component", "all"):
        component_breakdown(bs)
    if what in ("stages", "all"):
        stage_breakdown(bs)
    if what in ("micro", "all"):
        micro(bs)
