"""Alternative train step: pjit global math with optional ZeRO sharding.

The shard_map step (train/step.py) is the reference-faithful default
(per-device BN stats, explicit collectives). This variant writes the step as
*global* math and lets XLA's SPMD partitioner place everything from sharding
annotations — the idiomatic pjit style:

- batch sharded over ('data',); XLA derives the all-gather for the logit
  matrix and the grad reduce automatically;
- ``shard_params=True`` additionally shards every large parameter (and its
  Adam moments) over the same axis — ZeRO-3-style memory scaling, the TPU
  equivalent of the reference's Lightning `fsdp` strategy flag
  (scripts/train_combined_captions.py:140-145);
- BatchNorm statistics become global-batch (synced-BN semantics — the
  reference's --force-sync-bn / SyncBatchNorm path, training/main.py:293).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xclip_tpu.parallel.mesh import DATA_AXIS
from xclip_tpu.train.loss import clip_loss, siglip_loss
from xclip_tpu.train.step import TrainStepCfg, _norm_tree


def zero_sharding(mesh: Mesh, tree, min_size: int = 2**14):
    """NamedSharding tree: leaves big enough and divisible on axis 0 are
    sharded over the data axis (ZeRO param/optimizer partitioning); the rest
    replicated."""
    n = mesh.devices.size

    def leaf_sharding(x):
        shape = jnp.shape(x)
        if len(shape) >= 1 and shape[0] % n == 0 and int(jnp.size(x)) >= min_size:
            return NamedSharding(mesh, P(DATA_AXIS, *([None] * (len(shape) - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, tree)


def make_train_step_pjit(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: TrainStepCfg = TrainStepCfg(),
    *,
    shard_params: bool = False,
    example_params=None,
    example_opt_state=None,
    min_shard_size: int = 2**14,
    committed_inputs: bool = False,
    trace_context=None,
    batch_spec=None,
) -> Callable:
    """Build the pjit step. With ``shard_params`` the caller should
    device_put params/opt_state with :func:`zero_sharding` (the returned
    shardings are also used as in/out annotations). With
    ``committed_inputs`` the params/state/opt-state shardings are taken
    from the committed arguments instead of annotations (the TP path:
    parallel/tp.py shards the params, tx.init inherits them)."""
    from xclip_tpu.core.precision import get_policy

    compute_dtype = get_policy(cfg.precision).compute_dtype
    replicated_ = NamedSharding(mesh, P())

    def step(params, state, opt_state, batch):
        from xclip_tpu.train.step import normalize_images

        images = normalize_images(batch["images"], cfg)

        def gathered(p):
            if shard_params:
                # ZeRO semantics: parameters are STORED sharded but COMPUTE
                # with a replicated (all-gathered) copy. Without this
                # constraint the partitioner propagates the dim-0 param
                # shards into attention internals and falls back to
                # "involuntary full rematerialization" on the backward
                # transposes. The constraint's transpose reduce-scatters the
                # grads straight back to the param sharding.
                return jax.lax.with_sharding_constraint(
                    p, jax.tree_util.tree_map(lambda _: replicated_, p))
            return p

        def feat_loss(p, img_f, txt_f):
            # global math: the full feature matrices are in hand, so SigLIP
            # needs no ppermute ring — the pairwise sigmoid loss over the
            # global B x B logits equals the ring-accumulated per-device
            # losses pmean'd (both normalize by the global batch)
            scale = jnp.exp(p["logit_scale"])
            if cfg.siglip:
                return siglip_loss(img_f, txt_f, scale, p.get("logit_bias", 0.0))
            return clip_loss(img_f, txt_f, scale)

        if cfg.coca:
            from xclip_tpu.models.coca import coca_loss

            def loss_fn(p):
                # CoCa towers carry no BN state; loss = weighted contrastive
                # + caption CE over the global batch (global math: no axis)
                out = model.forward(gathered(p), images, batch["texts"], dtype=compute_dtype)
                loss, _parts = coca_loss(
                    out,
                    caption_loss_weight=cfg.coca_caption_loss_weight,
                    clip_loss_weight=cfg.coca_contrastive_loss_weight,
                    pad_id=model.cfg.pad_id,
                )
                return loss, state
        else:
            def loss_fn(p):
                out = model.forward(
                    gathered(p), images, batch["texts"], state=state, train=True,
                    dtype=compute_dtype, remat=cfg.grad_checkpointing,
                )
                loss = feat_loss(p, out["image_features"], out["text_features"])
                return loss, out["state"]

        def accum_grads(params):
            # reference cached-negatives accumulation (train.py:115-164) in
            # global math — same two-phase scan structure as the shard_map
            # step (train/step.py): no-grad feature caching, then per-micro
            # re-forward with the cached others as constant negatives
            accum = cfg.accum_freq
            b_micro = images.shape[0] // accum
            images_m = images.reshape(accum, b_micro, *images.shape[1:])
            texts_m = batch["texts"].reshape(accum, b_micro, *batch["texts"].shape[1:])

            if cfg.coca:
                # reference accum with CoCa (train.py:115-164): every
                # model_out tensor — features AND caption logits/labels —
                # is cached and concatenated so each microbatch's loss sees
                # the full effective batch (mirrors the shard_map variant,
                # train/step.py, in global math)
                from xclip_tpu.models.coca import coca_loss

                def coca_out(p, imgs, txts):
                    out = model.forward(gathered(p), imgs, txts, dtype=compute_dtype)
                    return (out["image_features"], out["text_features"],
                            out["logits"], out["labels"])

                def cache_coca(carry, xs):
                    return carry, coca_out(params, xs[0], xs[1])

                _, cached = jax.lax.scan(cache_coca, 0, (images_m, texts_m))
                cached = jax.lax.stop_gradient(cached)

                def micro_coca(carry, xs):
                    g_acc, loss_acc = carry
                    j, imgs, txts = xs

                    def loss_j(p):
                        cur = coca_out(p, imgs, txts)
                        full = [
                            jax.lax.dynamic_update_index_in_dim(c, v, j, 0).reshape(
                                accum * b_micro, *c.shape[2:])
                            for c, v in zip(cached, cur)
                        ]
                        out = {
                            "image_features": full[0], "text_features": full[1],
                            "logits": full[2], "labels": full[3],
                            "logit_scale": jnp.exp(p["logit_scale"]),
                        }
                        loss, _parts = coca_loss(
                            out,
                            caption_loss_weight=cfg.coca_caption_loss_weight,
                            clip_loss_weight=cfg.coca_contrastive_loss_weight,
                            pad_id=model.cfg.pad_id,
                        )
                        return loss

                    lj, gj = jax.value_and_grad(loss_j)(params)
                    return (jax.tree_util.tree_map(jnp.add, g_acc, gj), loss_acc + lj), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                (grads, loss_sum), _ = jax.lax.scan(
                    micro_coca, (zeros, 0.0), (jnp.arange(accum), images_m, texts_m))
                # CoCa towers carry no BN state
                return loss_sum / accum, state, grads

            def fwd(p, s, imgs, txts):
                out = model.forward(gathered(p), imgs, txts, state=s, train=True,
                                    dtype=compute_dtype, remat=cfg.grad_checkpointing)
                return out["image_features"], out["text_features"], out["state"]

            def cache_one(s, xs):
                fi, ft, s2 = fwd(params, s, xs[0], xs[1])
                return s2, (fi, ft)

            _, (cached_img, cached_txt) = jax.lax.scan(cache_one, state, (images_m, texts_m))
            cached_img = jax.lax.stop_gradient(cached_img)
            cached_txt = jax.lax.stop_gradient(cached_txt)

            def micro(carry, xs):
                g_acc, loss_acc, s_c = carry
                j, imgs, txts = xs

                def loss_j(p):
                    fi, ft, s2 = fwd(p, s_c, imgs, txts)
                    ai = jax.lax.dynamic_update_index_in_dim(cached_img, fi, j, 0)
                    at = jax.lax.dynamic_update_index_in_dim(cached_txt, ft, j, 0)
                    loss = feat_loss(p, ai.reshape(accum * b_micro, -1),
                                     at.reshape(accum * b_micro, -1))
                    return loss, s2

                (lj, s2), gj = jax.value_and_grad(loss_j, has_aux=True)(params)
                return (jax.tree_util.tree_map(jnp.add, g_acc, gj), loss_acc + lj, s2), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (grads, loss_sum, new_state), _ = jax.lax.scan(
                micro, (zeros, 0.0, state), (jnp.arange(accum), images_m, texts_m))
            return loss_sum / accum, new_state, grads

        import contextlib

        with (trace_context() if trace_context else contextlib.nullcontext()):
            if cfg.accum_freq > 1:
                loss, new_state, grads = accum_grads(params)
            else:
                (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(new_params["logit_scale"], 0.0, jnp.log(100.0))
        metrics = {
            "loss": loss,
            "grad_norm": _norm_tree(grads),
            "logit_scale": jnp.exp(new_params["logit_scale"]),
        }
        return new_params, new_state, new_opt_state, metrics

    replicated = NamedSharding(mesh, P())
    bspec = P(DATA_AXIS) if batch_spec is None else batch_spec
    batch_sh = {
        "images": NamedSharding(mesh, bspec),
        "texts": NamedSharding(mesh, bspec),
    }
    if committed_inputs:
        return jax.jit(
            step,
            in_shardings=(None, None, None, batch_sh),
            out_shardings=(None, replicated, None, replicated),
            donate_argnums=(0, 1, 2),
        )
    if shard_params:
        assert example_params is not None and example_opt_state is not None
        param_sh = zero_sharding(mesh, example_params, min_size=min_shard_size)
        opt_sh = zero_sharding(mesh, example_opt_state, min_size=min_shard_size)
    else:
        param_sh = jax.tree_util.tree_map(lambda _: replicated, example_params) if example_params is not None else replicated
        opt_sh = jax.tree_util.tree_map(lambda _: replicated, example_opt_state) if example_opt_state is not None else replicated

    return jax.jit(
        step,
        in_shardings=(param_sh, replicated, opt_sh, batch_sh),
        out_shardings=(param_sh, replicated, opt_sh, replicated),
        donate_argnums=(0, 1, 2),
    )


def make_distill_train_step_pjit(
    model,
    teacher_model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: TrainStepCfg = TrainStepCfg(),
    *,
    shard_params: bool = False,
    example_params=None,
    example_opt_state=None,
    min_shard_size: int = 2**14,
) -> Callable:
    """Distillation step (reference --distill-model, training/main.py:259-267
    + DistillClipLoss, loss.py:180-216) in global pjit math: the frozen
    teacher runs inside the same compiled program on replicated params; the
    student composes with ZeRO sharding exactly like make_train_step_pjit.

    Returned signature::

        params, state, opt_state, metrics = step(
            params, state, opt_state, teacher_params, teacher_state, batch)
    """
    from xclip_tpu.core.precision import get_policy
    from xclip_tpu.train.loss import distill_clip_loss

    compute_dtype = get_policy(cfg.precision).compute_dtype
    replicated = NamedSharding(mesh, P())

    def step(params, state, opt_state, t_params, t_state, batch):
        from xclip_tpu.train.step import normalize_images

        images = normalize_images(batch["images"], cfg)
        t_out = teacher_model.forward(
            t_params, images, batch["texts"], state=t_state, train=False,
            dtype=compute_dtype,
        )

        def gathered(p):
            if shard_params:
                # see make_train_step_pjit: compute on a replicated copy;
                # the constraint's transpose reduce-scatters the grads back
                return jax.lax.with_sharding_constraint(
                    p, jax.tree_util.tree_map(lambda _: replicated, p))
            return p

        def loss_fn(p):
            out = model.forward(
                gathered(p), images, batch["texts"], state=state, train=True,
                dtype=compute_dtype, remat=cfg.grad_checkpointing,
            )
            contrastive, distill = distill_clip_loss(
                out["image_features"], out["text_features"], out["logit_scale"],
                t_out["image_features"], t_out["text_features"], t_out["logit_scale"],
            )
            return contrastive + distill, (out["state"], contrastive, distill)

        (loss, (new_state, contrastive, distill)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(new_params["logit_scale"], 0.0, jnp.log(100.0))
        metrics = {
            "loss": loss,
            "contrastive_loss": contrastive,
            "distill_loss": distill,
            "grad_norm": _norm_tree(grads),
            "logit_scale": jnp.exp(new_params["logit_scale"]),
        }
        return new_params, new_state, new_opt_state, metrics

    if shard_params:
        assert example_params is not None and example_opt_state is not None
        param_sh = zero_sharding(mesh, example_params, min_size=min_shard_size)
        opt_sh = zero_sharding(mesh, example_opt_state, min_size=min_shard_size)
    else:
        param_sh = replicated
        opt_sh = replicated
    batch_sh = {
        "images": NamedSharding(mesh, P(DATA_AXIS)),
        "texts": NamedSharding(mesh, P(DATA_AXIS)),
    }
    return jax.jit(
        step,
        in_shardings=(param_sh, replicated, opt_sh, replicated, replicated, batch_sh),
        out_shardings=(param_sh, replicated, opt_sh, replicated),
        donate_argnums=(0, 1, 2),
    )
