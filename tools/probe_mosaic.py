"""Per-round Mosaic/Pallas health probe for this terminal.

The Pallas kernels (ops/flash_attention.py, ops/fused_conv.py) are correct
and tested but default-off. History: the r2/r4 probes measured Mosaic at
93-122 GB/s "vs 360-379 XLA", but those per-dispatch numbers were deflated
by the ~10ms relay enqueue latency on ~3ms kernels; the r5 chained probe
(--chain: 20 pallas_calls inside one jit — opaque kernels, so the pass
count is guaranteed) measures Mosaic at ~324 GB/s, ~0.76x the XLA clean
streaming rate. The fused 1x1-conv kernels still REGRESS the train step
(XCLIP_PALLAS_BLOCK=1: 974 vs 1505 img/s/chip, r5) — the gap is Mosaic
matmul/pipeline quality on conv-shaped kernels, not raw streaming.

    python tools/probe_mosaic.py           # per-dispatch (dispatch-bound!)
    python tools/probe_mosaic.py --chain   # dispatch-amortized, the honest one

CAUTION: do not wrap the pallas_call in lax.fori_loop or add
lax.optimization_barrier chains — both HANG this terminal's compile, and a
killed-mid-compile client wedges the terminal for 20-60 min. For the XLA
side prefer bench.py's resized anchors (dispatch-hidden by op size);
chained XLA elementwise is fusion/folding-contaminated.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n = 8192
    x = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32)
                    ).astype(jnp.bfloat16)
    nbytes = n * n * 2

    # NOTE: run this on an IDLE host. Timing is per-dispatch (matches the
    # r2/r4 probes); a busy host makes both sides dispatch-bound and the
    # ratio meaningless. Wrapping the pallas_call in an on-device fori_loop
    # hangs this terminal's Mosaic compile — do not "fix" it that way (a
    # killed-mid-compile client wedges the terminal for ~20 min).
    @jax.jit
    def xla_scale(x):
        return x * jnp.bfloat16(1.0001)

    def timed(fn, reps=20):
        y = fn(x)
        np.asarray(y[:1, :1])  # sync via fetch (relay-safe)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(x)
        np.asarray(y[:1, :1])
        dt = (time.perf_counter() - t0) / reps
        return 2 * nbytes / dt / 1e9  # read + write GB/s

    xla_rate = timed(xla_scale)

    # optional: amortize the ~10ms relay dispatch latency by chaining K
    # executions inside ONE jitted program (Python-unrolled — wrapping the
    # pallas_call in lax.fori_loop hangs this terminal's Mosaic compile).
    # Per-dispatch timing under ~10ms relay latency is dispatch-bound for
    # a 2-3ms kernel, so --chain is the number that means anything here.
    chain = int(os.environ.get("PROBE_CHAIN", "0") or
                ("10" if "--chain" in sys.argv else "0"))

    # Pallas copy+scale kernel, 128-row blocks (the r2/r4 probe shape)
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.bfloat16(1.0001)

    block = 128
    pallas_scale = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.bfloat16),
        grid=(n // block,),
        in_specs=[pl.BlockSpec((block, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block, n), lambda i: (i, 0)),
    )
    if chain:
        @jax.jit
        def xla_chained(x):
            for _ in range(chain):
                x = x * jnp.bfloat16(1.0001)
            return x

        @jax.jit
        def pallas_chained(x):
            for _ in range(chain):
                x = pallas_scale(x)
            return x

        def timed_chain(fn, reps=5):
            y = fn(x)
            np.asarray(y[:1, :1])
            t0 = time.perf_counter()
            for _ in range(reps):
                y = fn(x)
            np.asarray(y[:1, :1])
            dt = (time.perf_counter() - t0) / (reps * chain)
            return 2 * nbytes / dt / 1e9

        xla_rate = timed_chain(xla_chained)
        try:
            pallas_rate = timed_chain(pallas_chained)
        except Exception as exn:
            print(f"pallas chained: FAILED ({type(exn).__name__}: {exn})")
            pallas_rate = 0.0
        print(f"chain={chain} xla_stream_gbps: {xla_rate:.1f}")
        print(f"chain={chain} pallas_stream_gbps: {pallas_rate:.1f}")
        print(f"ratio: {pallas_rate / xla_rate:.3f}")
        return

    try:
        pallas_rate = timed(jax.jit(pallas_scale))
    except Exception as exn:  # Mosaic unavailable/broken on this stack
        print(f"pallas: FAILED ({type(exn).__name__}: {exn})")
        pallas_rate = 0.0

    print(f"xla_stream_gbps: {xla_rate:.1f}")
    print(f"pallas_stream_gbps: {pallas_rate:.1f}")
    print(f"ratio: {pallas_rate / xla_rate:.3f}"
          + ("  -> keep XCLIP_PALLAS_BLOCK off" if pallas_rate < 0.8 * xla_rate
             else "  -> Mosaic healthy: A/B the fused kernels in bench.py"))


if __name__ == "__main__":
    main()
