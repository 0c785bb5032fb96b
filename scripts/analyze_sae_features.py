"""SAE feature-sharing analysis, paper Fig. 4 (reference:
scripts/analyze_sae_features.py)."""

import argparse
import os

import _common  # noqa: F401
import numpy as np

from xclip_tpu.data.datasets import DomainNetCaptions
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.evals.features import extract_image_features
from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX, domain_ids_from_samples
from xclip_tpu.interp.feature_sharing import evaluate_feature_sharing
from xclip_tpu.models.factory import create_model
from xclip_tpu.sae.model import SAECfg, sae_state_dict_to_params


def main(args):
    import torch

    step = "final"
    sd_path = os.path.join(args.sae_path, "checkpoints", f"sparse_autoencoder_{step}.pt")
    sd = torch.load(sd_path, map_location="cpu", weights_only=False)
    n_learned = int(args.input_dim * args.expansion_factor)
    sae_params = sae_state_dict_to_params(
        {k: v.numpy() for k, v in sd.items()}, SAECfg(args.input_dim, n_learned, n_components=1)
    )

    model, params, state = create_model(args.model, pretrained=args.ckpt_path)
    preprocess_val = image_transform(model.cfg.image_size, is_train=False)
    dataset = DomainNetCaptions(args.domainnet_path, "val", transform=preprocess_val)
    data = extract_image_features(model, params, state, dataset, num_threads=args.num_workers)
    domain_ids = domain_ids_from_samples(dataset.samples)

    os.makedirs(args.out_path, exist_ok=True)
    results = evaluate_feature_sharing(
        sae_params, data["img_feat"], np.asarray(data["clss"]), domain_ids,
        LSO_CLASS_TO_IDX, domain=args.domain, out_path=args.out_path,
        n_learned_features=n_learned,
    )
    print("score:", results["score"])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="RN50")
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--sae_path", type=str, required=True)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--domain", type=str, required=True)
    parser.add_argument("--input_dim", type=int, default=1024)
    parser.add_argument("--expansion_factor", type=int, default=4)
    parser.add_argument("--num_workers", type=int, default=8)
    main(parser.parse_args())
