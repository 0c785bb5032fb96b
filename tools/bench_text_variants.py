"""Text-block backward-excess attribution: 12-block stacks with one factor
changed at a time (activation fn, attention masking, LN) to locate the
~8ms of backward time above the matmul roofline (profile_rn50.py data)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import layers as L
from xclip_tpu.models.factory import create_model


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
    model, params, state = create_model("RN50", precision="bf16")
    tp = params["text"]
    cfg = model.cfg.text
    rng = np.random.RandomState(0)
    bf16 = jnp.bfloat16
    x0 = jnp.asarray(rng.randn(96, 77, 512).astype(np.float32)).astype(bf16)

    def block(p, x, *, act, causal, use_ln):
        act_fn = {"gelu": L.gelu, "relu": jax.nn.relu, "quick": L.quick_gelu}[act]
        y = L.layernorm_apply(p["ln_1"], x) if use_ln else x
        x = x + L.mha_apply(p["attn"], y, num_heads=cfg.heads, dtype=bf16, causal=causal)
        y = L.layernorm_apply(p["ln_2"], x) if use_ln else x
        y = L.linear_apply(p["mlp"]["c_fc"], y, dtype=bf16)
        y = act_fn(y)
        y = L.linear_apply(p["mlp"]["c_proj"], y, dtype=bf16)
        return x + y

    def stack_fwdbwd(**kw):
        def fn(x0):
            def loss(bp):
                x = x0
                for i in range(cfg.layers):
                    x = block(bp[i], x, **kw)
                return jnp.sum(x.astype(jnp.float32))
            l, g = jax.value_and_grad(loss)(tp["blocks"])
            return l + sum(jnp.sum(v.astype(jnp.float32))
                           for v in jax.tree_util.tree_leaves(g)) * 1e-30
        return fn

    def stack_fwd(**kw):
        def fn(x0):
            x = x0
            for i in range(cfg.layers):
                x = block(tp["blocks"][i], x, **kw)
            return jnp.sum(x.astype(jnp.float32))
        return fn

    base_kw = dict(act="gelu", causal=True, use_ln=True)
    t_fwd = timeit_scan(stack_fwd(**base_kw), x0)
    print(f"text blocks x12 FWD-ONLY [baseline]: {t_fwd*1e3:7.3f} ms", flush=True)

    cases = [
        ("baseline (gelu,causal,ln)", dict(act="gelu", causal=True, use_ln=True)),
        ("relu act", dict(act="relu", causal=True, use_ln=True)),
        ("quick_gelu act", dict(act="quick", causal=True, use_ln=True)),
        ("no causal mask", dict(act="gelu", causal=False, use_ln=True)),
        ("no LN", dict(act="gelu", causal=True, use_ln=False)),
    ]
    for name, kw in cases:
        t = timeit_scan(stack_fwdbwd(**kw), x0)
        print(f"text blocks x12 fwd+bwd [{name:<28s}]: {t*1e3:7.3f} ms", flush=True)

    # bf16-LN variant (stats fp32, normalize+affine bf16; layers.XCLIP_LN_BF16)
    os.environ["XCLIP_LN_BF16"] = "1"
    t = timeit_scan(stack_fwdbwd(**base_kw), x0)
    print(f"text blocks x12 fwd+bwd [{'bf16 LN':<28s}]: {t*1e3:7.3f} ms", flush=True)
    t_fwd16 = timeit_scan(stack_fwd(**base_kw), x0)
    print(f"text blocks x12 FWD-ONLY [bf16 LN]: {t_fwd16*1e3:7.3f} ms", flush=True)
    del os.environ["XCLIP_LN_BF16"]


if __name__ == "__main__":
    main()
