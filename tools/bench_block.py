"""Single-bottleneck-block micro-experiment at stage-1 shapes (the most
bandwidth-bound part of RN50): fwd and fwd+bwd, with the input-derived-BN
fusion on/off. Validates the HBM-traffic model that drives kernel work.

Relay-safe measurement: one jit, on-device scan, scalar fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit_scan(fn_scalar, x, iters=10):
    @jax.jit
    def run(x):
        def body(carry, _):
            xp = jax.tree_util.tree_map(
                lambda a: a + jnp.asarray(carry * 1e-30, a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, x)
            return carry + fn_scalar(xp), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c
    float(run(x))
    t1 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t1) / iters


def main():
    import xclip_tpu.models.resnet as R
    from xclip_tpu.models.resnet import _bottleneck_apply, _bottleneck_init

    b = int(os.environ.get("BENCH_BATCH", "96"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, 56, 56, 256).astype(np.float32)).astype(jnp.bfloat16)
    params, state = _bottleneck_init(jax.random.PRNGKey(0), 256, 64, stride=1)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    bf16 = jnp.bfloat16

    for fused in (True, False):
        R.FUSED_CONV_BN = fused

        def fwd(x):
            out, _ = _bottleneck_apply(params, state, x, stride=1, train=True, dtype=bf16)
            return jnp.sum(out.astype(jnp.float32))

        def fwdbwd(x):
            def loss(p, x):
                out, _ = _bottleneck_apply(p, state, x, stride=1, train=True, dtype=bf16)
                return jnp.sum(out.astype(jnp.float32))
            l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return l + sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(gp)) * 1e-30 \
                     + jnp.sum(gx.astype(jnp.float32)) * 1e-30

        tf_ = timeit_scan(fwd, x, iters=20)
        tfb = timeit_scan(fwdbwd, x, iters=20)
        print(f"L1 block fused={int(fused)}: fwd {tf_*1e3:7.3f} ms   fwd+bwd {tfb*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
