"""Cross-stack TRAIN-STEP trajectory parity: run the reference's actual
training loop (deps/open_clip/src/training/train.py:64-264 train_one_epoch —
its real code on torch CPU, not a re-implementation) and this repo's jitted
train step from BIT-IDENTICAL initial weights on IDENTICAL batches, and
assert per-step losses, the LR trajectory, and the final parameters agree.

This converts the engine's self-consistency into reference-anchored
correctness for the pieces forward-parity tests cannot see: AdamW weight-
decay masking (training/main.py:311-326), bias-corrected moments, global
grad clipping, the cosine-warmup schedule evaluated BEFORE each step
(scheduler.py:42-53 / train.py:87-89), the post-step ln(100) logit-scale
clamp (train.py:190-191), BatchNorm running-stat updates, and the
cached-negatives gradient-accumulation algorithm (train.py:115-164).
"""

import argparse
import os

import numpy as np
import pytest

HAS_REFERENCE = os.path.exists("/root/reference")
pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")

SMALL_RN = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16, "patch_size": None},
    "text_cfg": {"context_length": 77, "vocab_size": 512, "width": 64, "heads": 4, "layers": 2},
}
SMALL_VIT = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 64, "layers": 2, "width": 64, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 77, "vocab_size": 512, "width": 64, "heads": 4, "layers": 2},
}

LR, WD, BETA1, BETA2, EPS = 1e-3, 0.1, 0.9, 0.98, 1e-6
WARMUP, GRAD_CLIP = 2, 1.0
BATCH, N_STEPS = 8, 5


def _make_batches(cfg_dict, n_batches):
    rng = np.random.RandomState(7)
    size = cfg_dict["vision_cfg"]["image_size"]
    ctx = cfg_dict["text_cfg"]["context_length"]
    vocab = cfg_dict["text_cfg"]["vocab_size"]
    batches = []
    for _ in range(n_batches):
        images = rng.randn(BATCH, size, size, 3).astype(np.float32) * 0.5
        texts = rng.randint(1, vocab - 2, size=(BATCH, ctx)).astype(np.int64)
        texts[:, -1] = vocab - 1  # EOT = argmax position, shared by both stacks
        batches.append((images, texts))
    return batches


class _FakeLoader:
    """Duck-typed stand-in for the reference DataLoader: iterable of
    (images NCHW, texts) torch tensors with the num_batches/num_samples
    attributes train_one_epoch reads (train.py:74-76)."""

    def __init__(self, batches):
        import torch

        self._batches = [
            (torch.from_numpy(img).permute(0, 3, 1, 2).contiguous(), torch.from_numpy(txt))
            for img, txt in batches
        ]
        self.num_batches = len(batches)
        self.num_samples = len(batches) * BATCH

    def __iter__(self):
        return iter(self._batches)


class _FakeData:
    def __init__(self, batches):
        self.dataloader = _FakeLoader(batches)

    def set_epoch(self, epoch):
        pass


def _run_reference(cfg_dict, batches, accum_freq):
    """Drive the reference's real train_one_epoch for one epoch on CPU and
    return (model, per-backward losses, per-step lrs)."""
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch

    import training.train as ref_train
    from training.scheduler import cosine_lr as ref_cosine_lr

    torch.manual_seed(0)
    model = open_clip.CLIP(
        embed_dim=cfg_dict["embed_dim"],
        vision_cfg=cfg_dict["vision_cfg"],
        text_cfg=cfg_dict["text_cfg"],
        output_dict=True,  # main.py creates the train model with output_dict
    )
    model.train()

    # the reference optimizer construction, main.py:311-326
    exclude = lambda n, p: p.ndim < 2 or "bn" in n or "ln" in n or "bias" in n or "logit_scale" in n
    include = lambda n, p: not exclude(n, p)
    named = list(model.named_parameters())
    optimizer = torch.optim.AdamW(
        [
            {"params": [p for n, p in named if exclude(n, p)], "weight_decay": 0.0},
            {"params": [p for n, p in named if include(n, p)], "weight_decay": WD},
        ],
        lr=LR, betas=(BETA1, BETA2), eps=EPS,
    )
    scheduler = ref_cosine_lr(optimizer, LR, WARMUP, N_STEPS)

    losses, lrs = [], []

    class RecordingLoss(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.inner = open_clip.ClipLoss()

        def forward(self, output_dict=False, **kw):
            out = self.inner(output_dict=True, **kw)
            losses.append(float(sum(v.item() for v in out.values())))
            lrs.append(optimizer.param_groups[0]["lr"])
            return out

    args = argparse.Namespace(
        device="cpu", precision="fp32", distill=False, accum_freq=accum_freq,
        skip_scheduler=False, grad_clip_norm=GRAD_CLIP, horovod=False,
        world_size=1, rank=0, local_rank=0, distributed=False,
        batch_size=BATCH, log_every_n_steps=10_000, save_logs=False, wandb=False,
    )
    data = {"train": _FakeData(batches)}
    ref_train.train_one_epoch(
        model, data, RecordingLoss(), epoch=0, optimizer=optimizer, scaler=None,
        scheduler=scheduler, dist_model=None, args=args,
    )
    return model, losses, lrs


def _run_ours(cfg_dict, ref_state_dict, batches, accum_freq):
    """Our jitted train step on a 1-device mesh (BN batch stats span the full
    batch, exactly like the reference's single process) from the reference's
    initial weights. Returns (model, params, state, per-step losses, lrs)."""
    import jax

    from xclip_tpu.core.checkpoint import open_clip_state_dict_to_pytrees
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    model = CLIPModel(clip_cfg_from_dict(cfg_dict))
    params, state = open_clip_state_dict_to_pytrees(ref_state_dict, model)

    mesh = create_mesh(jax.devices()[:1])
    sched = schedule.cosine_lr(LR, WARMUP, N_STEPS)
    tx = optim.adamw(sched, beta1=BETA1, beta2=BETA2, eps=EPS,
                     weight_decay=WD, grad_clip_norm=GRAD_CLIP)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, mesh, TrainStepCfg(precision="fp32", accum_freq=accum_freq)
    )

    losses, lrs = [], []
    for i in range(0, len(batches), accum_freq):
        group = batches[i : i + accum_freq]
        batch = {
            "images": np.concatenate([b[0] for b in group]),
            "texts": np.concatenate([b[1] for b in group]).astype(np.int32),
        }
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
        losses.append(float(metrics["loss"]))
        lrs.append(float(sched(i // accum_freq)))
    return model, params, state, losses, lrs


def _final_state_dict_ours(model, params, state):
    from xclip_tpu.core.checkpoint import pytrees_to_open_clip_state_dict

    return pytrees_to_open_clip_state_dict(model, params, state)


def _assert_trajectory(cfg_dict, accum_freq, loss_atol, param_atol):
    batches = _make_batches(cfg_dict, N_STEPS * accum_freq)
    ref_model, ref_losses, ref_lrs = _run_reference(cfg_dict, batches, accum_freq)
    import torch

    init_sd = None  # reference model was trained in place; re-init to capture t=0
    with torch.no_grad():
        torch.manual_seed(0)
        from ref_compat import import_reference_open_clip

        open_clip = import_reference_open_clip()
        fresh = open_clip.CLIP(
            embed_dim=cfg_dict["embed_dim"],
            vision_cfg=cfg_dict["vision_cfg"],
            text_cfg=cfg_dict["text_cfg"],
        )
        init_sd = {k: v.detach().numpy().copy() for k, v in fresh.state_dict().items()}

    model, params, state, our_losses, our_lrs = _run_ours(
        cfg_dict, init_sd, batches, accum_freq)

    # LR trajectory: the reference evaluates scheduler(step) BEFORE each
    # optimizer step (train.py:87-89); optax evaluates schedule(update_count).
    ref_lr_per_step = ref_lrs[::accum_freq]
    np.testing.assert_allclose(our_lrs, ref_lr_per_step, rtol=1e-6,
                               err_msg="LR schedule trajectory diverged")

    # per-step losses: the reference records accum_freq identical losses per
    # optimizer step (each microbatch re-forward sees the same full-batch
    # features); ours records their mean.
    ref_loss_per_step = [
        float(np.mean(ref_losses[j * accum_freq : (j + 1) * accum_freq]))
        for j in range(N_STEPS)
    ]
    np.testing.assert_allclose(our_losses, ref_loss_per_step, atol=loss_atol, rtol=1e-4,
                               err_msg="per-step training losses diverged")

    ref_final = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    our_final = _final_state_dict_ours(model, params, state)
    assert set(our_final) == set(ref_final)
    worst_key, worst = None, 0.0
    for k in ref_final:
        if k.endswith("num_batches_tracked"):
            # torch-side step counter; unused with a fixed BN momentum
            # (torch BatchNorm2d only reads it when momentum=None)
            continue
        d = float(np.max(np.abs(np.asarray(our_final[k], np.float32)
                                - ref_final[k].astype(np.float32))))
        if d > worst:
            worst_key, worst = k, d
    assert worst < param_atol, (
        f"final params diverged: max |diff| {worst:.2e} at {worst_key!r} "
        f"after {N_STEPS} steps (lr={LR})"
    )
    # scalar logit_scale pins the clamp ordering exactly
    np.testing.assert_allclose(
        np.asarray(our_final["logit_scale"], np.float32),
        ref_final["logit_scale"].astype(np.float32), atol=1e-5,
    )


@pytest.mark.slow
def test_train_trajectory_parity_rn50():
    """RN50-family tower (BatchNorm state), accum_freq=1, grad clip 1.0:
    5 optimizer steps through the reference's real loop == ours."""
    _assert_trajectory(SMALL_RN, accum_freq=1, loss_atol=5e-4, param_atol=1.5e-3)


@pytest.mark.slow
def test_train_trajectory_parity_vit_accum():
    """ViT tower, the cached-negatives --accum-freq 2 path (train.py:115-164)
    vs our lax.scan re-implementation, end to end through the optimizer."""
    _assert_trajectory(SMALL_VIT, accum_freq=2, loss_atol=5e-4, param_atol=1.5e-3)
