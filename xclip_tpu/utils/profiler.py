"""Model cost accounting: params / FLOPs / activation estimates.

Reference behaviour: deps/open_clip/src/training/profiler.py:1-246 — per
model config, count image/text FLOPs (via torch FlopCounterMode or fvcore),
macs and params, CSV output. Here FLOPs come from XLA's own cost analysis of
the lowered computation — the number the hardware actually executes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))


def _xla_flops(fn, *args) -> Optional[float]:
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def profile_model(model, params, state, *, batch_size: int = 1) -> Dict[str, float]:
    """FLOPs + param counts for one forward of each tower (reference
    profile_model)."""
    size = model.cfg.image_size
    ctx = model.cfg.context_length
    image = jnp.zeros((batch_size, size, size, 3), jnp.float32)
    text = jnp.zeros((batch_size, ctx), jnp.int32)

    def image_fwd(p, s, x):
        feats, _, _ = model.encode_image(p, x, state=s)
        return feats

    def text_fwd(p, t):
        feats, _ = model.encode_text(p, t)
        return feats

    image_flops = _xla_flops(image_fwd, params, state, image)
    text_flops = _xla_flops(text_fwd, params, text)

    visual_params = count_params(params["visual"])
    text_params = count_params(params["text"])
    results = {
        "image_size": size,
        "image_width": getattr(model.cfg.vision, "width", 0),
        "text_width": model.cfg.text.width,
        "embed_dim": model.cfg.embed_dim,
        "mparams": count_params(params) / 1e6,
        "image_mparams": visual_params / 1e6,
        "text_mparams": text_params / 1e6,
    }
    if image_flops is not None:
        results["image_gflops"] = image_flops / batch_size / 1e9
    if text_flops is not None:
        results["text_gflops"] = text_flops / batch_size / 1e9
    if image_flops is not None and text_flops is not None:
        results["gflops"] = (image_flops + text_flops) / batch_size / 1e9
    return results


def main(argv=None):  # pragma: no cover - thin CLI
    """CSV profile of model configs (reference training/profiler.py CLI)."""
    import argparse
    import csv
    from xclip_tpu.models.factory import create_model, list_models

    parser = argparse.ArgumentParser("xclip_tpu model profiler")
    parser.add_argument("--model", type=str, default="RN50",
                        help="comma-separated model names, or 'all'")
    parser.add_argument("--results-file", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=1)
    args = parser.parse_args(argv)

    names = list_models() if args.model == "all" else args.model.split(",")
    rows = []
    for name in names:
        from xclip_tpu.models.factory import is_coca_model

        if is_coca_model(name):
            continue
        model, params, state = create_model(name)
        row = {"model": name}
        row.update(profile_model(model, params, state, batch_size=args.batch_size))
        rows.append(row)
        print(row)

    if args.results_file and rows:
        with open(args.results_file, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=sorted({k for r in rows for k in r}))
            writer.writeheader()
            writer.writerows(rows)


if __name__ == "__main__":
    main()
