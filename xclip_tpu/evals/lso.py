"""DomainNet-LSO zero-shot evaluation protocol.

Reference behaviour: scripts/evaluate_domainnet_lso_openai.py — for each
checkpoint: encode ImageNet-val + DomainNet-val (target domain + real),
build 86-template zero-shot classifiers, report top-1 accuracy for
{domain, real} x {lso-id, lso-ood, per-class-ood, unweighted-id (330/329
classes), unweighted-ood (15 classes)} plus imagenet-val total; predictions
serialized as .npy and metrics appended per step into results.json.

The 15 fixed leave-some-out classes and their DomainNet indices are the
experiment's core constant (reference :187-203).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from xclip_tpu.data.datasets import DOMAIN_TO_IDX

# reference: scripts/evaluate_domainnet_lso_openai.py:187-203
LSO_CLASS_TO_IDX = {
    "aircraft carrier": 0,
    "axe": 11,
    "banana": 13,
    "barn": 15,
    "bed": 25,
    "candle": 58,
    "lion": 174,
    "mountain": 190,
    "necklace": 197,
    "penguin": 218,
    "pizza": 225,
    "saxophone": 250,
    "television": 305,
    "tractor": 319,
    "traffic light": 320,
}


def accuracy_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float(np.mean(y_true == y_pred)) if y_true.size else float("nan")


def top_k_accuracy(scores: np.ndarray, y_true: np.ndarray, k: int) -> float:
    """Top-k accuracy from a (N, C) score matrix."""
    topk = np.argpartition(-scores, kth=min(k, scores.shape[1] - 1), axis=1)[:, :k]
    return float(np.mean([y in row for y, row in zip(y_true, topk)]))


def domainnet_classes_from_samples(samples: Sequence[Tuple[str, int, str]]) -> Dict[int, str]:
    """label -> human classname, derived from sample paths
    (reference :182-185)."""
    classes: Dict[int, str] = {}
    for path, label, _ in samples:
        *_, clss, _ = path.split("/")
        classes[label] = clss.replace("_", " ")
    return classes


def domain_ids_from_samples(samples: Sequence[Tuple[str, int, str]]) -> np.ndarray:
    return np.array([DOMAIN_TO_IDX[s[0].split("/")[-3]] for s in samples])


def evaluate_lso(
    *,
    val_labels: Optional[np.ndarray] = None,
    val_pred: Optional[np.ndarray] = None,
    domain_labels: np.ndarray,
    domain_pred: np.ndarray,
    domain_ids: np.ndarray,
    domain: str,
    domainnet_classes: Dict[int, str],
    class_to_idx: Dict[str, int] = LSO_CLASS_TO_IDX,
) -> Dict:
    """Pure-metrics stage of the protocol (reference evaluate_model:49-131),
    computed from predictions so it is reusable across zero-shot, top-k and
    supervised evaluators.

    ``val_labels``/``val_pred`` are optional: the supervised protocol
    (reference scripts/evaluate_domainnet_supervised_lso.py:38-109) reports
    DomainNet only — pass neither and ``imagenet-val`` comes back empty.
    """
    if (val_labels is None) != (val_pred is None):
        raise ValueError("val_labels and val_pred must be provided together")
    res = {
        "imagenet-val": {
            "accuracy": {} if val_labels is None
            else {"total": accuracy_score(val_labels, val_pred)}
        },
        "domainnet-val": {"accuracy": {}, "num-samples": {}},
    }
    acc = res["domainnet-val"]["accuracy"]
    nums = res["domainnet-val"]["num-samples"]

    for dom in [domain, "real"]:
        dom_mask = domain_ids == DOMAIN_TO_IDX[dom]
        kw_labels = domain_labels[dom_mask]
        assert kw_labels.size > 0
        gen_pred = domain_pred[dom_mask]
        lso_mask = np.isin(kw_labels, list(class_to_idx.values()))
        assert not np.all(lso_mask)

        acc[f"{dom}-lso-ood"] = accuracy_score(kw_labels[lso_mask], gen_pred[lso_mask])
        acc[f"{dom}-lso-id"] = accuracy_score(kw_labels[~lso_mask], gen_pred[~lso_mask])
        nums[f"{dom}-lso-ood"] = int(lso_mask.sum())
        nums[f"{dom}-lso-id"] = int((~lso_mask).sum())

        for cls, cls_idx in class_to_idx.items():
            cls_mask = kw_labels == cls_idx
            assert not np.all(cls_mask)
            acc[f"{dom}-{cls}-ood"] = accuracy_score(kw_labels[cls_mask], gen_pred[cls_mask])
            nums[f"{dom}-{cls}-ood"] = int(cls_mask.sum())

        id_accs, ood_accs = [], []
        for label, cls in domainnet_classes.items():
            if cls in class_to_idx:
                assert label == class_to_idx[cls]
            cls_mask = kw_labels == label
            assert not np.all(cls_mask)
            if not np.any(cls_mask):
                # one painting class has no val samples (reference :115-118)
                assert domain == "painting"
                continue
            bucket = ood_accs if cls in class_to_idx else id_accs
            bucket.append(accuracy_score(kw_labels[cls_mask], gen_pred[cls_mask]))

        acc[f"{dom}-lso-unweighted-id"] = float(np.mean(id_accs))
        acc[f"{dom}-lso-unweighted-ood"] = float(np.mean(ood_accs))

    return res


def merge_step_results(results_per_step: List[Dict], steps: List[int], domain: str,
                       classes: Optional[List[str]] = None) -> Dict:
    """Stack per-step metric dicts into the reference results.json layout
    (reference main:233-248)."""
    results: Dict = {
        "steps": steps,
        "classes": classes if classes is not None else list(LSO_CLASS_TO_IDX),
        "domain": domain,
        "imagenet-val": {"accuracy": {}},
        "domainnet-val": {"accuracy": {}, "num-samples": {}},
    }
    for result in results_per_step:
        for metric in ("imagenet-val", "domainnet-val"):
            for split in result[metric]:
                results[metric].setdefault(split, {})
                for feature, val in result[metric][split].items():
                    results[metric][split].setdefault(feature, []).append(val)
    return results


def serialize_predictions(predictions: List[Tuple], out_path: str) -> None:
    """Save stacked predictions across checkpoints (reference :135-152)."""
    val_labels, val_pred, domain_labels, domain_pred, domain_ids = zip(*predictions)
    assert all(np.array_equal(v, val_labels[0]) for v in val_labels)
    assert all(np.array_equal(v, domain_labels[0]) for v in domain_labels)
    assert all(np.array_equal(v, domain_ids[0]) for v in domain_ids)
    os.makedirs(out_path, exist_ok=True)
    np.save(os.path.join(out_path, "val_labels.npy"), np.array(val_labels[0]))
    np.save(os.path.join(out_path, "val_pred.npy"), np.array(val_pred))
    np.save(os.path.join(out_path, "domain_labels.npy"), np.array(domain_labels[0]))
    np.save(os.path.join(out_path, "domain_pred.npy"), np.array(domain_pred))
    np.save(os.path.join(out_path, "domain_ids.npy"), np.array(domain_ids[0]))


def epoch_or_step_from_ckpt_file(filename: str) -> int:
    """Checkpoint series ordering key (reference main:157-161)."""
    filename = os.path.basename(filename)
    begin = filename.find("step") + 5 if "step" in filename else filename.find("epoch") + 6
    end = filename.find(".")
    return int(filename[begin:end])
