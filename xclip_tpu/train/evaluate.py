"""In-training evaluation: zero-shot ImageNet + val contrastive metrics.

Reference behaviour: deps/open_clip/src/training/train.py:267-393 (evaluate,
get_clip_metrics) and training/zero_shot.py:17-84 (80-template ImageNet
classifier, top1/top5).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import numpy as np

from xclip_tpu.evals.metadata import IMAGENET_CLASSNAMES, OPENAI_IMAGENET_TEMPLATES
from xclip_tpu.evals.zero_shot import build_zero_shot_classifier
from xclip_tpu.train.loss import clip_loss


def accuracy_topk(logits: np.ndarray, target: np.ndarray, topk=(1,)):
    order = np.argsort(-logits, axis=1)
    return [float(np.mean([t in row[:k] for t, row in zip(target, order)])) for k in topk]


def zero_shot_eval(model, params, state, data: Dict, epoch: int, args, tokenizer) -> Dict:
    """ImageNet(+v2) zero-shot eval during training (reference
    zero_shot.py:44-84)."""
    if "imagenet-val" not in data and "imagenet-v2" not in data:
        return {}
    if args.zeroshot_frequency == 0:
        return {}
    if (epoch % args.zeroshot_frequency) != 0 and epoch != args.epochs:
        return {}

    logging.info("Starting zero-shot imagenet.")
    classifier = build_zero_shot_classifier(
        model, params, tokenizer, IMAGENET_CLASSNAMES, OPENAI_IMAGENET_TEMPLATES
    )  # (E, C)

    @jax.jit
    def encode(p, s, images):
        feats, _, _ = model.encode_image(p, images, state=s, normalize=True)
        return feats

    results = {}
    for split in ("imagenet-val", "imagenet-v2"):
        if split not in data:
            continue
        top1s, top5s, n = [], [], 0
        for batch in data[split]:
            images, target = batch[0], np.asarray(batch[1])
            feats = np.asarray(encode(params, state, images))
            logits = 100.0 * feats @ classifier
            acc1, acc5 = accuracy_topk(logits, target, topk=(1, 5))
            bs = len(target)
            top1s.append(acc1 * bs)
            top5s.append(acc5 * bs)
            n += bs
        key = "imagenet-zeroshot-val-top1" if split == "imagenet-val" else "imagenetv2-zeroshot-val-top1"
        results[key] = sum(top1s) / n
        results[key.replace("top1", "top5")] = sum(top5s) / n
    logging.info("Finished zero-shot imagenet.")
    return results


def get_clip_metrics(image_features: np.ndarray, text_features: np.ndarray, logit_scale: float) -> Dict:
    """Retrieval metrics R@1/5/10 + mean/median rank (reference
    train.py:376-393)."""
    metrics = {}
    logits_per_image = logit_scale * image_features @ text_features.T
    logits = {"image_to_text": logits_per_image, "text_to_image": logits_per_image.T}
    n = len(text_features)
    ground_truth = np.arange(n)[:, None]
    for name, logit in logits.items():
        ranking = np.argsort(-logit, axis=1)
        preds = np.where(ranking == ground_truth)[1]
        metrics[f"{name}_mean_rank"] = float(preds.mean() + 1)
        metrics[f"{name}_median_rank"] = float(np.floor(np.median(preds)) + 1)
        for k in (1, 5, 10):
            metrics[f"{name}_R@{k}"] = float(np.mean(preds < k))
    return metrics


def evaluate(model, params, state, data: Dict, epoch: int, args, tokenizer=None) -> Dict:
    """Full eval pass (reference train.py:267-373): zero-shot + val
    contrastive loss + retrieval metrics; single process."""
    metrics: Dict = {}
    metrics.update(zero_shot_eval(model, params, state, data, epoch, args, tokenizer))

    if "val" in data and (
        args.val_frequency and ((epoch % args.val_frequency) == 0 or epoch == args.epochs)
    ):

        @jax.jit
        def fwd(p, s, images, texts):
            out = model.forward(p, images, texts, state=s)
            return out["image_features"], out["text_features"], out["logit_scale"]

        all_img, all_txt = [], []
        cumulative_loss, num_samples = 0.0, 0
        logit_scale = 1.0
        for batch in data["val"]:
            images, texts = batch["images"], batch["texts"]
            img_f, txt_f, logit_scale = fwd(params, state, images, texts)
            img_f, txt_f = np.asarray(img_f), np.asarray(txt_f)
            batch_loss = float(clip_loss(img_f, txt_f, float(logit_scale)))
            bs = images.shape[0]
            cumulative_loss += batch_loss * bs
            num_samples += bs
            all_img.append(img_f)
            all_txt.append(txt_f)

        metrics.update(
            get_clip_metrics(np.concatenate(all_img), np.concatenate(all_txt), float(logit_scale))
        )
        metrics.update(
            {"clip_val_loss": cumulative_loss / num_samples, "epoch": epoch, "num_samples": num_samples}
        )

    if metrics:
        logging.info(
            f"Eval Epoch: {epoch} " + "\t".join(f"{k}: {round(v, 4):.4f}" for k, v in metrics.items())
        )
    return metrics
