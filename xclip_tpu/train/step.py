"""The pjit/shard_map training step — THE hot loop.

Reference behaviour: deps/open_clip/src/training/train.py:64-264
(train_one_epoch): autocast forward -> ClipLoss -> backward -> grad clip ->
AdamW step -> logit_scale clamp, with an optional gradient-accumulation path
(:115-164) that caches features without grad and re-forwards each microbatch
against the cached others as negatives, preserving full-batch negatives.

TPU design: one compiled program per optimizer step. The per-device compute
(encoders + local-loss row block) runs inside ``shard_map`` over the
``('data',)`` mesh — BatchNorm uses per-device batch statistics exactly like
the reference's non-synced DDP BN — with the feature all_gather and the grad
``psum`` as the only collectives (both ride ICI). The optimizer update runs
on replicated params inside the same jit. Grad accumulation is a
``lax.scan`` over microbatches implementing the reference's cached-negatives
algorithm. Rematerialisation (``--grad-checkpointing``) is `jax.checkpoint`
per residual block.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from xclip_tpu.parallel.mesh import DATA_AXIS
from xclip_tpu.train.loss import clip_loss, distill_clip_loss, siglip_loss


@dataclasses.dataclass(frozen=True)
class TrainStepCfg:
    precision: str = "bf16"
    local_loss: bool = True
    gather_with_grad: bool = True
    grad_checkpointing: bool = False
    accum_freq: int = 1
    # NOTE: gradient clipping lives in the optimizer (optim.adamw's
    # grad_clip_norm arg wraps optax.clip_by_global_norm) — there is
    # deliberately no clip field here
    siglip: bool = False  # sigmoid pairwise loss with ppermute ring
    seed: int = 0  # base seed for in-step randomness (patch dropout)
    # CoCa training (reference CoCaLoss, open_clip/loss.py:134-177)
    coca: bool = False
    coca_caption_loss_weight: float = 2.0
    coca_contrastive_loss_weight: float = 1.0
    # normalization applied on-device when the loader ships uint8 images
    # (None = OpenAI CLIP mean/std)
    image_mean: Optional[tuple] = None
    image_std: Optional[tuple] = None


def _norm_tree(tree):
    return optax.global_norm(tree)


def normalize_images(images, cfg: TrainStepCfg):
    """uint8 batches are normalized on-device in fp32 — identical math to
    the host pipeline's (v/255 - mean)/std, 4x fewer host->device bytes."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        from xclip_tpu.data.transforms import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

        mean = jnp.asarray(cfg.image_mean or OPENAI_DATASET_MEAN, jnp.float32)
        std = jnp.asarray(cfg.image_std or OPENAI_DATASET_STD, jnp.float32)
        images = (images.astype(jnp.float32) / 255.0 - mean) / std
    return images


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: TrainStepCfg = TrainStepCfg(),
) -> Callable:
    """Build the jitted train step.

    Signature of the returned fn::

        params, state, opt_state, metrics = step(params, state, opt_state, batch)

    ``batch`` is ``{"images": (accum*B, H, W, C), "texts": (accum*B, L)}``
    host arrays sharded along the data axis; ``accum*B`` is the per-step
    global batch (reference "effective batch").
    """
    from xclip_tpu.core.precision import get_policy

    policy = get_policy(cfg.precision)
    compute_dtype = policy.compute_dtype
    accum = cfg.accum_freq
    # patch dropout (ViT) and stochastic depth (ConvNeXt drop_path) need
    # per-step randomness threaded into the compiled program; everything
    # else is deterministic, so the rng plumbing (an extra "step" scalar in
    # the batch) only exists when the tower uses it
    use_rng = (getattr(model.cfg.vision, "patch_dropout", 0.0) > 0.0
               or getattr(model.cfg.vision, "drop_path_rate", 0.0) > 0.0)

    def maybe_normalize(images):
        return normalize_images(images, cfg)

    def forward(params, state, images, texts, rng=None):
        images = maybe_normalize(images)
        out = model.forward(
            params,
            images,
            texts,
            state=state,
            train=True,
            dtype=compute_dtype,
            remat=cfg.grad_checkpointing,
            rng=rng,
        )
        return out["image_features"], out["text_features"], out["state"]

    def _loss(p, img_f, txt_f):
        scale = jnp.exp(p["logit_scale"])
        if cfg.siglip:
            return siglip_loss(img_f, txt_f, scale, p.get("logit_bias", 0.0), axis_name=DATA_AXIS)
        return clip_loss(
            img_f, txt_f, scale, axis_name=DATA_AXIS, local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
        )

    # ---- per-device loss+grad under shard_map -----------------------------
    def local_grads(params, state, images, texts, step_idx):
        """images/texts: the per-device shard. Returns pmean'd grads."""

        def mk_rng(micro_j=None):
            # distinct stream per (step, device, microbatch)
            if not use_rng:
                return None
            r = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step_idx)
            r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))
            if micro_j is not None:
                r = jax.random.fold_in(r, micro_j)
            return r

        if accum == 1:
            if cfg.coca:
                from xclip_tpu.models.coca import coca_loss

                def loss_fn(p):
                    out = model.forward(p, maybe_normalize(images), texts, dtype=compute_dtype)
                    loss, _parts = coca_loss(
                        out,
                        caption_loss_weight=cfg.coca_caption_loss_weight,
                        clip_loss_weight=cfg.coca_contrastive_loss_weight,
                        pad_id=model.cfg.pad_id,
                        axis_name=DATA_AXIS,
                    )
                    return loss, state  # CoCa towers carry no BN state
            else:

                def loss_fn(p):
                    img_f, txt_f, new_state = forward(p, state, images, texts, rng=mk_rng())
                    return _loss(p, img_f, txt_f), new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        elif cfg.coca:
            # reference accum with CoCa (train.py:115-164): EVERY model_out
            # tensor — features AND caption logits/labels — is cached and
            # concatenated, so each microbatch's loss sees the full
            # effective batch (only microbatch j's slice carries grad)
            from xclip_tpu.models.coca import coca_loss

            b_micro = images.shape[0] // accum
            images_m = images.reshape(accum, b_micro, *images.shape[1:])
            texts_m = texts.reshape(accum, b_micro, *texts.shape[1:])

            def coca_out(p, imgs, txts):
                out = model.forward(p, maybe_normalize(imgs), txts, dtype=compute_dtype)
                return out["image_features"], out["text_features"], out["logits"], out["labels"]

            def cache_coca(carry, batch_j):
                _, imgs, txts = batch_j
                return carry, coca_out(params, imgs, txts)

            js = jnp.arange(accum)
            _, cached = jax.lax.scan(cache_coca, 0, (js, images_m, texts_m))
            cached = jax.lax.stop_gradient(cached)

            def micro(carry, xs):
                g_acc, loss_acc = carry
                j, imgs, txts = xs

                def loss_fn(p):
                    cur = coca_out(p, imgs, txts)
                    full = [
                        jax.lax.dynamic_update_index_in_dim(c, v, j, 0).reshape(
                            accum * b_micro, *c.shape[2:]
                        )
                        for c, v in zip(cached, cur)
                    ]
                    out = {
                        "image_features": full[0], "text_features": full[1],
                        "logits": full[2], "labels": full[3],
                        "logit_scale": jnp.exp(p["logit_scale"]),
                    }
                    loss_j, _parts = coca_loss(
                        out,
                        caption_loss_weight=cfg.coca_caption_loss_weight,
                        clip_loss_weight=cfg.coca_contrastive_loss_weight,
                        pad_id=model.cfg.pad_id,
                        axis_name=DATA_AXIS,
                    )
                    return loss_j

                loss_j, g_j = jax.value_and_grad(loss_fn)(params)
                return (jax.tree_util.tree_map(jnp.add, g_acc, g_j), loss_acc + loss_j), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (grads, loss_sum), _ = jax.lax.scan(micro, (zeros, 0.0), (js, images_m, texts_m))
            loss = loss_sum / accum
            new_state = state
        else:
            # reference cached-negatives accumulation (train.py:115-164):
            # phase 1 — no-grad forward caching features for all microbatches
            b_micro = images.shape[0] // accum
            images_m = images.reshape(accum, b_micro, *images.shape[1:])
            texts_m = texts.reshape(accum, b_micro, *texts.shape[1:])

            def cache_one(carry_state, batch_j):
                j, imgs, txts = batch_j
                img_f, txt_f, new_s = forward(params, carry_state, imgs, txts, rng=mk_rng(j))
                return new_s, (img_f, txt_f)

            js = jnp.arange(accum)
            _, (cached_img, cached_txt) = jax.lax.scan(cache_one, state, (js, images_m, texts_m))
            cached_img = jax.lax.stop_gradient(cached_img)  # (accum, b, E)
            cached_txt = jax.lax.stop_gradient(cached_txt)

            # phase 2 — per microbatch, re-forward with grad; other
            # microbatches participate as constant negatives.
            def micro(carry, xs):
                g_acc, loss_acc, state_c = carry
                j, imgs, txts = xs

                def loss_fn(p):
                    # same rng as the caching pass so the re-forward sees the
                    # identical patch-dropout selection (reference re-forwards
                    # under the same autocast/module state, train.py:140-152)
                    img_f, txt_f, new_s = forward(p, state_c, imgs, txts, rng=mk_rng(j))
                    all_img = jax.lax.dynamic_update_index_in_dim(cached_img, img_f, j, 0)
                    all_txt = jax.lax.dynamic_update_index_in_dim(cached_txt, txt_f, j, 0)
                    all_img = all_img.reshape(accum * b_micro, -1)
                    all_txt = all_txt.reshape(accum * b_micro, -1)
                    return _loss(p, all_img, all_txt), new_s

                (loss_j, new_state), g_j = jax.value_and_grad(loss_fn, has_aux=True)(params)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_j)
                return (g_acc, loss_acc + loss_j, new_state), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (grads, loss_sum, new_state), _ = jax.lax.scan(
                micro, (zeros, 0.0, state), (js, images_m, texts_m)
            )
            loss = loss_sum / accum

        loss = jax.lax.pmean(loss, DATA_AXIS)  # global loss, not device-0's row block
        grads = jax.lax.pmean(grads, DATA_AXIS)
        # keep BN running stats identical across replicas
        new_state = jax.lax.pmean(new_state, DATA_AXIS)
        return loss, grads, new_state

    local_grads_sharded = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,

    )

    def step(params, state, opt_state, batch):
        step_idx = batch.get("step", jnp.zeros((), jnp.int32))
        loss, grads, new_state = local_grads_sharded(
            params, state, batch["images"], batch["texts"], step_idx
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # ln(100) clamp, reference train.py:190-191
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(new_params["logit_scale"], 0.0, jnp.log(100.0))
        metrics = {
            "loss": loss,
            "grad_norm": _norm_tree(grads),
            "logit_scale": jnp.exp(new_params["logit_scale"]),
        }
        return new_params, new_state, new_opt_state, metrics

    replicated = NamedSharding(mesh, P())
    batch_sharded = {"images": NamedSharding(mesh, P(DATA_AXIS)), "texts": NamedSharding(mesh, P(DATA_AXIS))}
    if use_rng:
        batch_sharded["step"] = replicated
    jitted = jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated, batch_sharded),
        out_shardings=(replicated, replicated, replicated, replicated),
        donate_argnums=(0, 1, 2),
    )

    def step_fn(params, state, opt_state, batch):
        if use_rng and "step" not in batch:
            raise ValueError(
                "this model uses patch dropout: the train step needs batch['step'] "
                "(int32 global step index) to derive the dropout rng"
            )
        return jitted(params, state, opt_state, batch)

    step_fn.needs_rng = use_rng  # callers inject batch["step"] when True
    step_fn.jitted = jitted  # exposed for lower()/cost-analysis (bench.py)
    return step_fn


def make_distill_train_step(
    model,
    teacher_model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: TrainStepCfg = TrainStepCfg(),
) -> Callable:
    """Distillation train step (reference --distill-model path,
    training/main.py:259-267 + DistillClipLoss): the frozen teacher runs
    inside the same compiled program; its features are stop-gradient.

    Returned signature::

        params, state, opt_state, metrics = step(
            params, state, opt_state, teacher_params, teacher_state, batch)
    """
    from xclip_tpu.core.precision import get_policy

    compute_dtype = get_policy(cfg.precision).compute_dtype

    def local_grads(params, state, t_params, t_state, images, texts):
        images = normalize_images(images, cfg)
        t_out = teacher_model.forward(
            t_params, images, texts, state=t_state, train=False, dtype=compute_dtype
        )

        def loss_fn(p):
            out = model.forward(
                p, images, texts, state=state, train=True, dtype=compute_dtype,
                remat=cfg.grad_checkpointing,
            )
            contrastive, distill = distill_clip_loss(
                out["image_features"], out["text_features"], out["logit_scale"],
                t_out["image_features"], t_out["text_features"], t_out["logit_scale"],
                axis_name=DATA_AXIS, local_loss=cfg.local_loss,
            )
            return contrastive + distill, (out["state"], contrastive, distill)

        (loss, (new_state, contrastive, distill)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        contrastive = jax.lax.pmean(contrastive, DATA_AXIS)
        distill = jax.lax.pmean(distill, DATA_AXIS)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_state = jax.lax.pmean(new_state, DATA_AXIS)
        return loss, contrastive, distill, grads, new_state

    sharded = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def step(params, state, opt_state, t_params, t_state, batch):
        loss, contrastive, distill, grads, new_state = sharded(
            params, state, t_params, t_state, batch["images"], batch["texts"]
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(new_params["logit_scale"], 0.0, jnp.log(100.0))
        metrics = {
            "loss": loss,
            "contrastive_loss": contrastive,
            "distill_loss": distill,
            "logit_scale": jnp.exp(new_params["logit_scale"]),
        }
        return new_params, new_state, new_opt_state, metrics

    replicated = NamedSharding(mesh, P())
    batch_sharded = {
        "images": NamedSharding(mesh, P(DATA_AXIS)),
        "texts": NamedSharding(mesh, P(DATA_AXIS)),
    }
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated, replicated, replicated, batch_sharded),
        out_shardings=(replicated, replicated, replicated, replicated),
        donate_argnums=(0, 1, 2),
    )


def make_eval_features_fn(model, mesh: Optional[Mesh] = None, precision: str = "fp32"):
    """Jitted normalized-feature extraction (eval hot loop:
    scripts/evaluate_domainnet_lso_openai.py:27-35)."""
    from xclip_tpu.core.precision import get_policy

    dtype = get_policy(precision).compute_dtype

    @functools.partial(jax.jit, static_argnames=())
    def encode_images(params, state, images):
        feats, _, _ = model.encode_image(params, images, state=state, normalize=True, dtype=dtype)
        return feats

    @jax.jit
    def encode_texts(params, texts):
        feats, _ = model.encode_text(params, texts, normalize=True, dtype=dtype)
        return feats

    return encode_images, encode_texts
