"""Checkpoint-series DomainNet-LSO evaluation drivers.

Reference behaviour: scripts/evaluate_domainnet_lso_openai.py (main zero-shot
evaluator), scripts/evaluate_domainnet_lso_openai_topk.py (adds top-k
accuracy + macro F1) and scripts/evaluate_domainnet_supervised_lso.py
(supervised 1345-way classifier protocol taking logits[:, 1000:] as the
DomainNet head).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from xclip_tpu.data.datasets import DomainNetCaptions, ImageNet
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.evals.features import extract_image_features
from xclip_tpu.evals.lso import (
    LSO_CLASS_TO_IDX,
    domain_ids_from_samples,
    domainnet_classes_from_samples,
    epoch_or_step_from_ckpt_file,
    evaluate_lso,
    merge_step_results,
    serialize_predictions,
    top_k_accuracy,
)
from xclip_tpu.evals.metadata import XCLIP_IMAGENET_CLASSES
from xclip_tpu.evals.zero_shot import OpenAIZeroShotClassifier
from xclip_tpu.models.factory import create_model
from xclip_tpu.tokenizer import get_tokenizer

EVAL_DOMAINS = ["clipart", "infograph", "painting", "quickdraw", "sketch"]


def load_eval_data(model_name: str, imagenet_path: str, domainnet_path: str, domain: str):
    """ImageNet val + DomainNet val (target domain + real)."""
    model, _, _ = create_model(model_name)
    preprocess_val = image_transform(model.cfg.image_size, is_train=False)
    exclude = [d for d in EVAL_DOMAINS if domain and d != domain]
    data = {
        "val": ImageNet(imagenet_path, split="val", transform=preprocess_val),
        "domain": DomainNetCaptions(
            domainnet_path, "val", transform=preprocess_val, exclude_domains=exclude
        ),
    }
    return data


def evaluate_checkpoint(
    model,
    params,
    state,
    tokenizer,
    data: Dict,
    domain: str,
    domainnet_classes: Dict[int, str],
    domain_invariant: bool = False,
    batch_size: int = 250,
    num_threads: int = 8,
    topk: Optional[List[int]] = None,
    precision: str = "fp32",
):
    """Single-checkpoint evaluation (reference evaluate_model:39-132).
    ``precision='bf16'`` approximates and ``precision='fp16'`` reproduces the
    reference's ``.half()`` eval encoders (evaluate_domainnet_lso_openai.py:30)
    — both ~2x image-encode throughput; fp16 additionally stores features and
    classifier weights as IEEE half so the score matmul rounds like torch's."""
    from xclip_tpu.core.precision import get_policy

    if precision in ("fp16", "float16"):
        precision = "float16"
    dtype = get_policy(precision).compute_dtype if precision != "fp32" else None
    half = np.float16 if precision == "float16" else None

    def maybe_half(feat):
        return feat.astype(half) if half is not None else feat

    val_data = extract_image_features(
        model, params, state, data["val"], batch_size=batch_size, num_threads=num_threads,
        dtype=dtype,
    )
    zs = OpenAIZeroShotClassifier(
        model, params, tokenizer, XCLIP_IMAGENET_CLASSES, domain_invariant, dtype=dtype
    )
    zs.prompt_feat = maybe_half(zs.prompt_feat)
    val_scores = zs.predict_from_features(maybe_half(val_data["img_feat"]), return_scores=True)["pred"]
    val_pred = val_scores.argmax(axis=1)
    val_labels = np.asarray(val_data["clss"])

    domain_data = extract_image_features(
        model, params, state, data["domain"], batch_size=batch_size, num_threads=num_threads,
        dtype=dtype,
    )
    domain_ids = domain_ids_from_samples(data["domain"].samples)
    assert np.unique(domain_ids).size == 2  # real + the target domain

    zs_dn = OpenAIZeroShotClassifier(model, params, tokenizer, domainnet_classes,
                                     domain_invariant, dtype=dtype)
    zs_dn.prompt_feat = maybe_half(zs_dn.prompt_feat)
    dn_scores = zs_dn.predict_from_features(maybe_half(domain_data["img_feat"]), return_scores=True)["pred"]
    domain_pred = dn_scores.argmax(axis=1)
    domain_labels = np.asarray(domain_data["clss"])

    res = evaluate_lso(
        val_labels=val_labels, val_pred=val_pred,
        domain_labels=domain_labels, domain_pred=domain_pred, domain_ids=domain_ids,
        domain=domain, domainnet_classes=domainnet_classes,
    )
    if topk:
        from sklearn.metrics import f1_score

        from xclip_tpu.data.datasets import DOMAIN_TO_IDX
        from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX as _LSO

        # reference topk layout (evaluate_domainnet_lso_openai_topk.py:51-130):
        # per-k accuracy dicts + macro F1 over the same id/ood splits
        for k in topk:
            res["imagenet-val"][f"top-{k}-accuracy"] = {
                "total": top_k_accuracy(val_scores, val_labels, k)
            }
            res["domainnet-val"].setdefault(f"top-{k}-accuracy", {})
        res["imagenet-val"]["f1-score"] = {
            "total": float(f1_score(val_labels, val_pred, average="macro"))
        }
        res["domainnet-val"]["f1-score"] = {}
        lso_vals = list(_LSO.values())
        for dom in [domain, "real"]:
            mask = domain_ids == DOMAIN_TO_IDX[dom]
            kw_labels = domain_labels[mask]
            kw_scores = dn_scores[mask]
            kw_pred = domain_pred[mask]
            lso_mask = np.isin(kw_labels, lso_vals)
            for k in topk:
                res["domainnet-val"][f"top-{k}-accuracy"][f"{dom}-lso-ood"] = top_k_accuracy(
                    kw_scores[lso_mask], kw_labels[lso_mask], k
                )
                res["domainnet-val"][f"top-{k}-accuracy"][f"{dom}-lso-id"] = top_k_accuracy(
                    kw_scores[~lso_mask], kw_labels[~lso_mask], k
                )
            res["domainnet-val"]["f1-score"][f"{dom}-lso-ood"] = float(
                f1_score(kw_labels[lso_mask], kw_pred[lso_mask], average="macro")
            )
            res["domainnet-val"]["f1-score"][f"{dom}-lso-id"] = float(
                f1_score(kw_labels[~lso_mask], kw_pred[~lso_mask], average="macro")
            )
    return res, (val_labels, val_pred, domain_labels, domain_pred, domain_ids)


def run_lso_evaluation(
    model_name: str,
    ckpt_files: List[str],
    out_path: str,
    imagenet_path: str,
    domainnet_path: str,
    domain: str,
    domain_invariant: bool = False,
    num_workers: int = 8,
    topk: Optional[List[int]] = None,
    precision: str = "fp32",
) -> Dict:
    """Full checkpoint-series protocol -> results.json + prediction .npy
    (reference main:155-251)."""
    ckpt_files = sorted(ckpt_files, key=epoch_or_step_from_ckpt_file)
    steps = [epoch_or_step_from_ckpt_file(f) for f in ckpt_files]

    data = load_eval_data(model_name, imagenet_path, domainnet_path, domain)
    domainnet_classes = domainnet_classes_from_samples(data["domain"].samples)
    for cls, label in LSO_CLASS_TO_IDX.items():
        assert domainnet_classes[label] == cls

    tokenizer = get_tokenizer(model_name)
    results_per_step, predictions = [], []
    for step, ckpt in zip(steps, ckpt_files):
        logging.info("Evaluating %s (step %d)", ckpt, step)
        model, params, state = create_model(model_name, pretrained=ckpt)
        res, preds = evaluate_checkpoint(
            model, params, state, tokenizer, data, domain, domainnet_classes,
            domain_invariant=domain_invariant, num_threads=num_workers, topk=topk,
            precision=precision,
        )
        results_per_step.append(res)
        predictions.append(preds)

    os.makedirs(out_path, exist_ok=True)
    serialize_predictions(predictions, out_path)
    results = merge_step_results(results_per_step, steps, domain)
    with open(os.path.join(out_path, "results.json"), "w") as fh:
        json.dump(results, fh)
    return results
