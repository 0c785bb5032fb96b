"""Print the multi-chip scaling prediction table for the RN50 CLIP step.

Combines the measured single-chip step time (bench.py headline; override
with --step-ms) with the analytic ICI/DCN collective model
(xclip_tpu/utils/scaling.py). No TPU needed — the model is closed-form;
--params recomputes the gradient payload from the real model pytree.

Usage: python tools/scaling_model.py [--step-ms 84.5] [--batch 128]
       [--accum 1] [--model RN50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xclip_tpu.utils import scaling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=84.5,
                    help="measured single-chip optimizer-step time (bench.py)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--model", default="RN50")
    ap.add_argument("--embed-dim", type=int, default=1024)
    ap.add_argument("--no-overlap", action="store_true",
                    help="serial bound instead of the overlap bound")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from xclip_tpu.models.factory import create_model

    model, params, _ = create_model(args.model, precision="fp32")
    grad_bytes = scaling.param_bytes(params)  # fp32 grads, reference AdamW
    embed_dim = model.cfg.embed_dim

    rows = scaling.sweep(
        [1, 2, 4, 8, 16, 32, 64, 128, 256, 512],
        step_time_ms=args.step_ms, local_batch=args.batch,
        grad_bytes=grad_bytes, embed_dim=embed_dim,
        accum_freq=args.accum, overlap=not args.no_overlap)

    print(f"# {args.model} b{args.batch}/chip accum{args.accum}, "
          f"grads {grad_bytes / 1e6:.1f} MB fp32, "
          f"{'overlap' if not args.no_overlap else 'serial'} bound")
    print(f"{'chips':>6} {'img/s/chip':>11} {'img/s total':>12} "
          f"{'eff':>6} {'coll ms':>8} {'bound':>8}")
    for r in rows:
        print(f"{r.n_chips:>6} {r.images_per_sec_per_chip:>11.1f} "
              f"{r.images_per_sec_total:>12.0f} {r.efficiency:>6.3f} "
              f"{r.collective_ms:>8.2f} {r.dominant:>8}")
    summary = {
        "grad_mb": round(grad_bytes / 1e6, 1),
        "pod_efficiency_256": round(rows[-2].efficiency, 4),
        "cross_pod_efficiency_512": round(rows[-1].efficiency, 4),
        "first_ici_bound": next((r.n_chips for r in rows
                                 if r.dominant != "compute"), None),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
