"""Supervised classifier baseline (the Lightning-learner replacement).

Reference behaviour: xclip/learner.py:12-88 (ImageNetCaptionsLearner: CLIP
visual tower or ViT backbone + ReLU + Linear head; CE loss; SGD momentum 0.9
nesterov wd 1e-4 with the gain/bias no-decay grouping; MultiStepLR
[30,50,70] gamma 0.1 stepped per epoch), trained by
scripts/train_combined_captions.py through a pl.Trainer with DDP and
16-mixed precision.

TPU design: the trainer is a plain loop over a single pjit/shard_map data-
parallel step (no Lightning); precision 16-mixed -> bf16 activations; the
MultiStepLR boundary schedule is traced into the step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xclip_tpu.models import layers as L
from xclip_tpu.models.factory import get_clip_cfg
from xclip_tpu.parallel.mesh import DATA_AXIS
from xclip_tpu.train.optim import wd_mask


@dataclasses.dataclass(frozen=True)
class ClassifierCfg:
    model: str = "rn50-clip"  # or 'vit-b-32-clip'
    num_classes: int = 1345
    lr: float = 0.1
    milestones: Tuple[int, ...] = (30, 50, 70)
    gamma: float = 0.1

    @property
    def backbone_name(self) -> str:
        return {"rn50-clip": "RN50", "vit-b-32-clip": "ViT-B-32", "vit-b-32-timm": "ViT-B-32"}[self.model]

    @property
    def feature_dim(self) -> int:
        return 1024 if self.model == "rn50-clip" else 512


class Classifier:
    """Backbone + ReLU + Linear head as explicit pytrees."""

    def __init__(self, cfg: ClassifierCfg):
        from xclip_tpu.models.clip import CLIPModel

        self.cfg = cfg
        self.clip = CLIPModel(get_clip_cfg(cfg.backbone_name))
        self.image_size = self.clip.cfg.image_size

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        clip_params, clip_state = self.clip.init(k1)
        params = {
            "backbone": clip_params["visual"],
            "head": L.linear_init(k2, self.cfg.feature_dim, self.cfg.num_classes),
        }
        return params, {"visual": clip_state["visual"]}

    def load_pretrained_backbone(self, params, state, ckpt_path: str):
        """Initialize the backbone from a CLIP checkpoint."""
        from xclip_tpu.core.checkpoint import load_checkpoint

        clip_params, clip_state = self.clip.init(jax.random.PRNGKey(0))
        full = {"visual": params["backbone"], "text": clip_params["text"],
                "logit_scale": clip_params["logit_scale"]}
        full, new_state = load_checkpoint(ckpt_path, self.clip, full, {"visual": state["visual"]})
        params = dict(params)
        params["backbone"] = full["visual"]
        return params, {"visual": new_state["visual"]}

    def apply(self, params, state, x, *, train: bool = False, dtype=None):
        feats, new_vstate, _ = self.clip.encode_image(
            {"visual": params["backbone"], "text": None, "logit_scale": None},
            x, state=state, train=train, dtype=dtype,
        )
        feats = jax.nn.relu(feats)
        logits = L.linear_apply(params["head"], feats.astype(jnp.float32))
        return logits, new_vstate


def make_classifier_train_step(model: Classifier, mesh: Mesh, *, steps_per_epoch: int,
                               precision: str = "bf16") -> Tuple[Callable, optax.GradientTransformation]:
    from xclip_tpu.core.precision import get_policy

    cfg = model.cfg
    boundaries = {int(m * steps_per_epoch): cfg.gamma for m in cfg.milestones}
    schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    tx = optax.chain(
        optax.add_decayed_weights(1e-4, mask=wd_mask),
        optax.sgd(learning_rate=schedule, momentum=0.9, nesterov=True),
    )
    dtype = get_policy(precision).compute_dtype

    def local_grads(params, state, images, labels):
        def loss_fn(p):
            logits, new_state = model.apply(p, state, images, train=True, dtype=dtype)
            logz = jax.scipy.special.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
            loss = jnp.mean(logz - picked)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, (new_state, acc)

        (loss, (new_state, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_state = jax.lax.pmean(new_state, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        acc = jax.lax.pmean(acc, DATA_AXIS)
        return loss, acc, grads, new_state

    sharded = shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    def step(params, state, opt_state, batch):
        loss, acc, grads, new_state = sharded(params, state, batch["images"], batch["labels"])
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, {"loss": loss, "accuracy": acc}

    replicated = NamedSharding(mesh, P())
    batch_sh = {"images": NamedSharding(mesh, P(DATA_AXIS)), "labels": NamedSharding(mesh, P(DATA_AXIS))}
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated, batch_sh),
        out_shardings=(replicated, replicated, replicated, replicated),
        donate_argnums=(0, 1, 2),
    ), tx


def make_classifier_eval_step(model: Classifier, mesh: Mesh, *,
                              precision: str = "bf16") -> Callable:
    """Forward-only loss/accuracy over a data-parallel batch (the reference
    Lightning validation_step, xclip/learner.py:60-71). Unlike the train
    step this does NOT donate its inputs, so the trainer's params survive
    the validation pass."""
    from xclip_tpu.core.precision import get_policy

    dtype = get_policy(precision).compute_dtype

    def local_eval(params, state, images, labels):
        logits, _ = model.apply(params, state, images, train=False, dtype=dtype)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        loss = jax.lax.pmean(jnp.mean(logz - picked), DATA_AXIS)
        acc = jax.lax.pmean(
            jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)), DATA_AXIS)
        return loss, acc

    sharded = shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def eval_step(params, state, batch):
        loss, acc = sharded(params, state, batch["images"], batch["labels"])
        return {"val_loss": loss, "val_accuracy": acc}

    return jax.jit(eval_step)


def save_classifier(path: str, model: Classifier, params, state, extras: Optional[dict] = None):
    from xclip_tpu.core.checkpoint import save_native

    save_native(path, params, state, extras=extras or {})


def load_classifier(path: str, model: Classifier):
    from xclip_tpu.core.checkpoint import load_native

    params, state = model.init(jax.random.PRNGKey(0))
    params, state, extras = load_native(path, model, params, state)
    return params, state, extras


def classifier_predictions(model: Classifier, params, state, dataset, *,
                           batch_size: int = 250, num_threads: int = 8,
                           logit_slice: Optional[Tuple[int, int]] = None) -> Dict[str, np.ndarray]:
    """Batched argmax predictions; ``logit_slice`` selects a label-space
    sub-range before the argmax (the supervised LSO protocol takes
    logits[:, 1000:], reference evaluate_domainnet_supervised_lso.py:29-30)."""
    from xclip_tpu.data.loader import DataLoader

    @jax.jit
    def forward(p, s, images):
        logits, _ = model.apply(p, s, images)
        return logits

    loader = DataLoader(dataset, batch_size, num_threads=num_threads)
    preds, labels = [], []
    for batch in loader:
        images, lab = batch
        n = images.shape[0]
        if n < batch_size:
            images = np.concatenate([images, np.zeros((batch_size - n, *images.shape[1:]), images.dtype)])
        logits = np.asarray(forward(params, state, images))[:n]
        if logit_slice is not None:
            logits = logits[:, logit_slice[0]: logit_slice[1]]
        preds.append(logits.argmax(axis=-1))
        labels.append(np.asarray(lab))
    return {"pred": np.concatenate(preds), "labels": np.concatenate(labels)}
