"""CKA representational similarity across domains, paper Fig. 6a (reference:
scripts/representational_analysis.py): capture RN50 stage activations
(spatial-mean pooled), class-mean them per domain, linear/RBF CKA with
unbiased HSIC1 over all/ood/id class subsets."""

import argparse
import itertools
import json
import os

import _common  # noqa: F401
import numpy as np

import jax

from xclip_tpu.data.datasets import ALL_DOMAINS, DomainNetCaptions
from xclip_tpu.data.loader import DataLoader
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX, domain_ids_from_samples
from xclip_tpu.interp.cka import class_mean_activations, hsic1, kernel_cka, linear_cka
from xclip_tpu.models.factory import create_model
from xclip_tpu.models.resnet import resnet_stage_names


def capture_pooled_activations(model, params, state, dataset, batch_size, num_threads):
    """All stage activations, spatial-mean pooled (reference hooks+pooling
    :126-131,237-259)."""
    names = resnet_stage_names(model.cfg.vision)

    @jax.jit
    def run(p, s, images):
        _, _, inters = model.encode_image(p, images, state=s, capture=names)
        pooled = {}
        for k, v in inters.items():
            pooled[k] = v.mean(axis=(1, 2)) if v.ndim == 4 else v
        return pooled

    loader = DataLoader(dataset, batch_size, num_threads=num_threads)
    acc = {k: [] for k in names}
    labels = []
    for batch in loader:
        images, lab = batch
        n = images.shape[0]
        if n < batch_size:
            images = np.concatenate([images, np.zeros((batch_size - n, *images.shape[1:]), images.dtype)])
        out = run(params, state, images)
        for k in names:
            acc[k].append(np.asarray(out[k])[:n])
        labels.append(lab)
    return {k: np.concatenate(v) for k, v in acc.items()}, np.concatenate(labels)


def main(args):
    ckpt = os.path.join(args.model_dir, "checkpoints/epoch_32.pt")
    assert os.path.isfile(ckpt), ckpt
    model, params, state = create_model(args.model, pretrained=ckpt)
    preprocess_val = image_transform(model.cfg.image_size, is_train=False)

    per_domain = {}
    for domain in ALL_DOMAINS:
        ds = DomainNetCaptions(
            args.domainnet_path, "val", transform=preprocess_val,
            exclude_domains=[d for d in ALL_DOMAINS if d != domain],
        )
        acts, labels = capture_pooled_activations(
            model, params, state, ds, args.batch_size, args.num_workers
        )
        per_domain[domain] = (acts, labels)

    ood = np.array(sorted(LSO_CLASS_TO_IDX.values()))
    layer_names = resnet_stage_names(model.cfg.vision)
    cka_fn = {"linear": linear_cka, "rbf": kernel_cka}[args.kernel]

    results = {"all": {}, "ood": {}, "id": {}}
    for layer in layer_names:
        for split in results:
            results[split][layer] = {}
        for da, db in itertools.combinations(ALL_DOMAINS, r=2):
            acts_a, labels_a = per_domain[da]
            acts_b, labels_b = per_domain[db]
            shared = np.intersect1d(np.unique(labels_a), np.unique(labels_b))
            splits = {
                "all": shared,
                "ood": shared[np.isin(shared, ood)],
                "id": shared[~np.isin(shared, ood)],
            }
            for split, classes in splits.items():
                if len(classes) < 5:
                    continue
                ma = class_mean_activations(
                    acts_a[layer][np.isin(labels_a, classes)], labels_a[np.isin(labels_a, classes)]
                )
                mb = class_mean_activations(
                    acts_b[layer][np.isin(labels_b, classes)], labels_b[np.isin(labels_b, classes)]
                )
                results[split][layer][f"{da}|{db}"] = cka_fn(ma, mb, hsic1)

    os.makedirs(args.out_path, exist_ok=True)
    with open(os.path.join(args.out_path, f"cka_{args.kernel}.json"), "w") as fh:
        json.dump(results, fh)
    for split in results:
        vals = [v for layer in results[split].values() for v in layer.values()]
        if vals:
            print(f"{split}: mean CKA {np.mean(vals):.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="RN50")
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--kernel", type=str, default="linear", choices=["linear", "rbf"])
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_workers", type=int, default=8)
    main(parser.parse_args())
