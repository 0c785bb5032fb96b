"""Supervised-classifier DomainNet-LSO evaluation (reference:
scripts/evaluate_domainnet_supervised_lso.py): 1345-way classifier,
logits[:, 1000:] = DomainNet predictions, same LSO metric protocol."""

import argparse
import json
import os
import re

import _common  # noqa: F401

from xclip_tpu.data.datasets import DomainNetCaptions
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.evals.lso import (
    domain_ids_from_samples,
    domainnet_classes_from_samples,
    evaluate_lso,
    merge_step_results,
)
from xclip_tpu.train.learner import Classifier, ClassifierCfg, classifier_predictions, load_classifier


def epoch_from_file(path):
    m = re.search(r"epoch=?(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def main(args):
    model = Classifier(ClassifierCfg(model=args.model, num_classes=1345))
    preprocess_val = image_transform(model.image_size, is_train=False)
    exclude = [d for d in ["clipart", "infograph", "painting", "quickdraw", "sketch"] if d != args.domain]
    dataset = DomainNetCaptions(args.domainnet_path, "val", transform=preprocess_val,
                                exclude_domains=exclude)
    domainnet_classes = domainnet_classes_from_samples(dataset.samples)
    domain_ids = domain_ids_from_samples(dataset.samples)

    ckpts = sorted(args.ckpt_files, key=epoch_from_file)
    steps = [epoch_from_file(f) for f in ckpts]
    results_per_step = []
    for ckpt in ckpts:
        params, state, _ = load_classifier(ckpt, model)
        data = classifier_predictions(
            model, params, state, dataset, num_threads=args.num_workers,
            logit_slice=(1000, 1345),
        )
        # no val_labels/val_pred: supervised protocol reports domainnet only
        res = evaluate_lso(
            domain_labels=data["labels"], domain_pred=data["pred"], domain_ids=domain_ids,
            domain=args.domain, domainnet_classes=domainnet_classes,
        )
        results_per_step.append(res)

    os.makedirs(args.out_path, exist_ok=True)
    results = merge_step_results(results_per_step, steps, args.domain)
    with open(os.path.join(args.out_path, "results.json"), "w") as fh:
        json.dump(results, fh)
    print(json.dumps(results["domainnet-val"]["accuracy"], indent=1)[:500])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="rn50-clip")
    parser.add_argument("--domain", type=str, required=True,
                        choices=["clipart", "infograph", "painting", "quickdraw", "sketch"])
    parser.add_argument("--ckpt_files", type=str, nargs="+", required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--num_workers", type=int, default=8)
    main(parser.parse_args())
