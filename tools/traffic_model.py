"""Minimum-bytes/step report for the CLIP train step (VERDICT r4 #1).

Thin CLI over xclip_tpu.utils.traffic (the jaxpr-walking perfect-fusion
floor): prints the by-kind table, the top single ops, the per-stage
attribution of the floor across the visual stages / text tower / loss+opt,
and — when a measured bandwidth + step time are passed — the roofline
attainment.

Runs entirely on the CPU backend — the jaxpr is abstract (no device compute).

Usage:
  python tools/traffic_model.py [batch_size]
  MEASURED_GBPS=363.7 STEP_MS=84.2 python tools/traffic_model.py 128
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from xclip_tpu.utils.traffic import min_bytes_per_step  # noqa: E402


def build_step(model_name: str, batch_size: int):
    from xclip_tpu.models.factory import create_model
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    mesh = create_mesh()
    model, params, state = create_model(model_name, precision="bf16")
    tx = optim.adamw(schedule.cosine_lr(1e-3, 500, 10000), weight_decay=0.2)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, mesh,
        TrainStepCfg(precision="bf16", accum_freq=1, grad_checkpointing=False,
                     local_loss=True),
    )
    batch = {
        "images": jnp.zeros((batch_size, model.cfg.image_size, model.cfg.image_size, 3),
                            jnp.float32),
        "texts": jnp.zeros((batch_size, 77), jnp.int32),
    }
    return model, params, state, opt_state, step, batch


def stage_attribution(model, params, state, batch_size: int):
    """Per-stage floor of the BACKWARD-inclusive pass: each visual stage and
    the text tower get their own fwd+bwd jaxpr walk, so the floor's GB are
    attributed to named layers (VERDICT r4 #1's per-layer traffic table)."""
    from xclip_tpu.models.resnet import resnet_apply, resnet_stage_names

    bf16 = jnp.bfloat16
    vp, vs = params["visual"], state["visual"]
    cfg = model.cfg.vision
    rows = []
    x = jnp.zeros((batch_size, model.cfg.image_size, model.cfg.image_size, 3), jnp.float32)
    for idx, name in enumerate(resnet_stage_names(cfg)):
        def fwdbwd(p, inp, _i=idx):
            def loss(p, inp):
                out, _, _ = resnet_apply(p, vs, inp, cfg, train=True, dtype=bf16,
                                         start=_i, stop=_i + 1)
                return jnp.sum(out.astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1))(p, inp)

        res = min_bytes_per_step(fwdbwd, vp, x)
        rows.append((name, res["total"]))
        x, _, _ = jax.eval_shape(
            lambda p, s, inp: resnet_apply(p, s, inp, cfg, train=True, dtype=bf16,
                                           start=idx, stop=idx + 1), vp, vs, x)
        x = jnp.zeros(x.shape, x.dtype)

    texts = jnp.zeros((batch_size, 77), jnp.int32)

    def text_fwdbwd(p, t):
        def loss(p):
            f, _ = model.encode_text(p, t, normalize=True, dtype=bf16)
            return jnp.sum(f.astype(jnp.float32))
        return jax.value_and_grad(loss)(p)

    rows.append(("text tower", min_bytes_per_step(text_fwdbwd, params, texts)["total"]))
    return rows


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model_name = os.environ.get("BENCH_MODEL", "RN50")
    model, params, state, opt_state, step, batch = build_step(model_name, bs)
    res = min_bytes_per_step(lambda p, s, o, b: step(p, s, o, b),
                             params, state, opt_state, batch,
                             include_adamw_over=params)

    print(f"== minimum-bytes/step model: {model_name} b{bs} bf16 ==")
    for kind, b in sorted(res["by_kind"].items(), key=lambda kv: -kv[1]):
        print(f"  {kind:<10s} {b/1e9:8.3f} GB")
    print(f"  {'TOTAL':<10s} {res['total']/1e9:8.3f} GB  <- perfect-fusion floor")

    print("\ntop-12 single ops by charged bytes:")
    for name, b, shapes in res["top_ops"][:12]:
        print(f"  {b/1e9:7.3f} GB  {name:<22s} {shapes}")

    print("\nper-stage floor attribution (fwd+bwd, GB):")
    rows = stage_attribution(model, params, state, bs)
    total_attr = sum(b for _, b in rows)
    for name, b in sorted(rows, key=lambda r: -r[1]):
        print(f"  {name:<14s} {b/1e9:8.3f} GB  ({100*b/total_attr:4.1f}% of towers)")

    gbps = float(os.environ.get("MEASURED_GBPS", "0") or 0)
    step_ms = float(os.environ.get("STEP_MS", "0") or 0)
    if gbps and step_ms:
        roofline_ms = res["total"] / gbps / 1e6
        print(f"\nbandwidth roofline @ {gbps} GB/s: {roofline_ms:.1f} ms; "
              f"measured {step_ms:.1f} ms -> attainment "
              f"{100*roofline_ms/step_ms:.1f}% (recoverable "
              f"{100*max(0, 1 - roofline_ms/step_ms):.1f}%)")


if __name__ == "__main__":
    main()
