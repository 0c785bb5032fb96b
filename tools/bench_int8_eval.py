"""A/B: int8-MLP vs bf16 eval-path encode throughput on the real TPU.

Drives the same jitted encode_image loop as bench.py's eval phase on a
transformer tower (ViT-B-32 by default — the MLP linears int8 quantization
targets are 2/3 of its FLOPs), once with fp/bf16 params and once with
core.quant.quantize_params (the --use-bnb-linear inference mode).

Usage:  python tools/bench_int8_eval.py [--model ViT-B-32] [--batch 250]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(model_name: str, batch: int, steps: int, warmup: int):
    import jax
    import jax.numpy as jnp

    from xclip_tpu.core import quant
    from xclip_tpu.models.factory import create_model

    model, params, state = create_model(model_name, precision="bf16")
    size = model.cfg.image_size
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3).astype(np.float32))

    def encode(p, x):
        feats, _, _ = model.encode_image(p, x, state=state, dtype=jnp.bfloat16,
                                         normalize=True)
        return feats

    results = {}
    for tag, p in (("bf16", params), ("int8", quant.quantize_params(params))):
        fn = jax.jit(encode)
        out = fn(p, imgs)
        np.asarray(out[:1])  # sync via fetch (relay-safe)
        t0 = time.perf_counter()
        for i in range(steps):
            out = fn(p, imgs)
            if i == warmup - 1:
                np.asarray(out[:1])
                t0 = time.perf_counter()
        np.asarray(out[:1])
        dt = time.perf_counter() - t0
        rate = batch * (steps - warmup) / dt
        results[tag] = rate
        print(f"{tag}: {rate:.1f} img/s/chip ({dt / (steps - warmup) * 1e3:.2f} ms/batch)")
    print(f"int8 speedup: {results['int8'] / results['bf16']:.3f}x")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--batch", type=int, default=250)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    a = ap.parse_args()
    run(a.model, a.batch, a.steps, a.warmup)
