"""Cache normalized image features for a checkpoint series (reference:
scripts/save_domainnet_features.py -> img_feat.npy steps x N x D,
domain_labels.npy, domain_ids.npy)."""

import argparse
import os

import _common  # noqa: F401
import numpy as np

from xclip_tpu.data.datasets import DomainNetCaptions
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.evals.features import extract_image_features
from xclip_tpu.evals.lso import domain_ids_from_samples
from xclip_tpu.models.factory import create_model


def main(args):
    model, _, _ = create_model(args.model)
    preprocess_val = image_transform(model.cfg.image_size, is_train=False)
    dataset = DomainNetCaptions(args.domainnet_path, "val", transform=preprocess_val)

    img_feats, domain_labels, domain_ids = [], None, None
    for ckpt_file in args.ckpt_files:
        model, params, state = create_model(args.model, pretrained=ckpt_file)
        data = extract_image_features(
            model, params, state, dataset, batch_size=256, num_threads=args.num_workers
        )
        ids = domain_ids_from_samples(dataset.samples)
        assert np.unique(ids).size == 6
        img_feats.append(data["img_feat"])
        labels = np.asarray(data["clss"])
        if domain_labels is None:
            domain_labels, domain_ids = labels, ids
        else:
            assert np.all(domain_labels == labels) and np.all(domain_ids == ids)

    os.makedirs(args.out_path, exist_ok=True)
    np.save(os.path.join(args.out_path, "img_feat.npy"), np.stack(img_feats))
    np.save(os.path.join(args.out_path, "domain_labels.npy"), domain_labels)
    np.save(os.path.join(args.out_path, "domain_ids.npy"), domain_ids)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Configure CLIP models to evaluate.")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--ckpt_files", type=str, nargs="+", required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--num_workers", type=int, default=8)
    main(parser.parse_args())
