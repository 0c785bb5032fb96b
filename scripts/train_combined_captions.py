"""Supervised 1345-way classifier training on CombinedNet (reference:
scripts/train_combined_captions.py through Lightning; here a plain loop over
a pjit data-parallel step — global batch/worker semantics preserved)."""

import argparse
import logging
import os
import time

import _common  # noqa: F401
import numpy as np

import jax

from xclip_tpu.data.datasets import CombinedNet
from xclip_tpu.data.loader import DataLoader
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.parallel.mesh import create_mesh
from xclip_tpu.train.learner import (
    Classifier,
    ClassifierCfg,
    load_classifier,
    make_classifier_eval_step,
    make_classifier_train_step,
    save_classifier,
)
from xclip_tpu.utils.meters import AverageMeter, setup_logging


def collate(items):
    images = np.stack([np.asarray(it[0]) for it in items])
    labels = np.asarray([it[1] for it in items], np.int32)
    return {"images": images, "labels": labels}


def train(args):
    setup_logging(None)
    if getattr(args, "detect_anomaly", False):
        # torch.autograd anomaly detection equivalent (reference :157)
        jax.config.update("jax_debug_nans", True)
    model = Classifier(ClassifierCfg(model=args.model, num_classes=1345, lr=args.learning_rate))
    params, state = model.init(jax.random.PRNGKey(args.seed or 0))

    train_ds = CombinedNet(
        args.train_index_path, args.in_class_index_path, args.class_mapping_path,
        transform=image_transform(model.image_size, is_train=True),
    )
    val_ds = CombinedNet(
        args.val_index_path, args.in_class_index_path, args.class_mapping_path,
        transform=image_transform(model.image_size, is_train=False),
    )
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, drop_last=True,
                              num_threads=args.num_workers or 8, collate=collate)
    val_loader = DataLoader(val_ds, args.batch_size, drop_last=True,
                            num_threads=args.num_workers or 8, collate=collate)

    mesh = create_mesh()
    precision = "bf16" if "16" in str(args.precision) else "fp32"
    step, tx = make_classifier_train_step(
        model, mesh, steps_per_epoch=train_loader.num_batches, precision=precision,
    )
    eval_step = make_classifier_eval_step(model, mesh, precision=precision)
    opt_state = tx.init(params)

    ckpt_dir = os.path.join(args.ws_path or ".", "checkpoints", args.experiment_name)
    os.makedirs(ckpt_dir, exist_ok=True)

    start_epoch = 0
    if args.ckpt_path:
        params, state, extras = load_classifier(args.ckpt_path, model)
        start_epoch = int(extras.get("epoch", 0))

    save_classifier(os.path.join(ckpt_dir, "epoch=0-step=0.npz"), model, params, state,
                    {"epoch": 0})  # save_first (reference CustomModelCheckpoint)

    for epoch in range(start_epoch, args.max_epochs):
        train_loader.set_epoch(epoch)
        loss_m, acc_m = AverageMeter(), AverageMeter()
        t0 = time.time()
        for i, batch in enumerate(train_loader):
            params, state, opt_state, metrics = step(params, state, opt_state, batch)
            if i % 50 == 0:
                loss = float(metrics["loss"])
                loss_m.update(loss)
                acc_m.update(float(metrics["accuracy"]))
                logging.info(
                    "epoch %d step %d loss %.4f acc %.4f (%.1f img/s)",
                    epoch, i, loss_m.val, acc_m.val,
                    args.batch_size * (i + 1) / (time.time() - t0),
                )
        completed = epoch + 1
        if completed % args.save_epochs == 0 or completed == args.max_epochs:
            save_classifier(
                os.path.join(ckpt_dir, f"epoch={completed}.npz"), model, params, state,
                {"epoch": completed},
            )
        save_classifier(os.path.join(ckpt_dir, "last.npz"), model, params, state,
                        {"epoch": completed})

        # validation pass: forward-only over the full val loader (reference
        # Lightning validation_step; the train step donates its inputs, so
        # it must not be reused here)
        v_loss, v_acc, n = 0.0, 0.0, 0
        for batch in val_loader:
            metrics = eval_step(params, state, batch)
            v_loss += float(metrics["val_loss"])
            v_acc += float(metrics["val_accuracy"])
            n += 1
        if n:
            logging.info("epoch %d done: val_loss %.4f val_acc %.4f",
                         completed, v_loss / n, v_acc / n)
        else:
            logging.info("epoch %d done", completed)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="rn50-clip",
                        choices=["vit-b-32-timm", "vit-b-32-clip", "rn50-clip"])
    parser.add_argument("--train_index_path", type=str, required=True)
    parser.add_argument("--val_index_path", type=str, required=True)
    parser.add_argument("--in_class_index_path", type=str, required=True)
    parser.add_argument("--class_mapping_path", type=str, required=True)
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--learning_rate", type=float, default=0.1)
    parser.add_argument("--batch_size", type=int, default=256, help="global batch size")
    parser.add_argument("--num_workers", type=int, default=32)
    parser.add_argument("--max_epochs", type=int, default=90)
    parser.add_argument("--save_epochs", type=int, default=5)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--ws_path", type=str, default=None)
    # accepted-for-compat Lightning flags (single pjit program replaces them)
    parser.add_argument("--accelerator", type=str, default="auto")
    parser.add_argument("--strategy", type=str, default="auto")
    parser.add_argument("--devices", type=int, default=-1)
    parser.add_argument("--num_nodes", type=int, default=1)
    parser.add_argument("--precision", type=str, default="16-mixed")
    parser.add_argument("--gradient_clip_val", type=float, default=None)
    parser.add_argument("--detect_anomaly", action="store_true")
    train(parser.parse_args())
