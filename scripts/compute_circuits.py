"""Feature-circuit extraction per domain x class (reference:
scripts/compute_circuits.py): IG node effects over 22 RN50 submodules with
IdentityDicts, top-10% nodes, pairwise IG edges; saves {label}_nodes.npz,
{label}_features_by_submod.npz, {label}_edges.npz per domain."""

import argparse
import os
import random
from collections import defaultdict

import _common  # noqa: F401
import numpy as np

from xclip_tpu.data.datasets import ALL_DOMAINS, DomainNetCaptions
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX, domainnet_classes_from_samples
from xclip_tpu.evals.zero_shot import OpenAIZeroShotClassifier
from xclip_tpu.interp.circuit_model import VisualCircuitModel
from xclip_tpu.interp.circuits import compute_class_circuit
from xclip_tpu.interp.dictionary import IdentityDict, load_sae_dictionary, resolve_sae_checkpoint
from xclip_tpu.models.factory import create_model
from xclip_tpu.tokenizer import get_tokenizer


def main(args):
    random.seed(args.seed)
    np.random.seed(args.seed)

    ckpt = os.path.join(args.model_dir, "checkpoints/epoch_32.pt")
    assert os.path.isfile(ckpt), f"Checkpoint file not found: {ckpt}"
    model, params, state = create_model(args.model, pretrained=ckpt)
    preprocess_val = image_transform(model.cfg.image_size, is_train=False)
    tokenizer = get_tokenizer(args.model)

    domains = ALL_DOMAINS if args.domain == "all" else [args.domain]
    ref_data = DomainNetCaptions(
        args.domainnet_path, "val", transform=preprocess_val,
        exclude_domains=[d for d in ALL_DOMAINS if d != "real"],
    )
    domainnet_classes = domainnet_classes_from_samples(ref_data.samples)

    clf = OpenAIZeroShotClassifier(model, params, tokenizer, domainnet_classes)
    circuit_model = VisualCircuitModel(model, params, state, clf.prompt_feat)

    # dictionaries: neuron basis (IdentityDict, the reference's default) unless
    # --sae_dir supplies trained SAEs for (some of) the submodules, in which
    # case those layers get feature-basis circuits instead.
    dictionaries = None
    if args.sae_dir:
        dictionaries = {}
        for stage in circuit_model.stages:
            ckpt_path = resolve_sae_checkpoint(args.sae_dir, stage.name)
            dictionaries[stage.name] = (
                load_sae_dictionary(ckpt_path) if ckpt_path else IdentityDict(stage.channels)
            )
        n_sae = sum(not isinstance(d, IdentityDict) for d in dictionaries.values())
        print(f"Using SAE dictionaries for {n_sae}/{len(dictionaries)} submodules from {args.sae_dir}")

    for domain in domains:
        data = DomainNetCaptions(
            args.domainnet_path, "val", transform=preprocess_val,
            exclude_domains=[d for d in ALL_DOMAINS if d != domain],
        )
        out_folder = os.path.join(args.model_dir, "circuit_analysis", domain)
        os.makedirs(out_folder, exist_ok=True)

        label_to_indices = defaultdict(list)
        for idx, (_, label, _) in enumerate(data.samples):
            label_to_indices[label].append(idx)

        ood_labels = list(LSO_CLASS_TO_IDX.values())
        id_labels = [l for l in label_to_indices if l not in ood_labels]
        all_labels = [args.class_idx] if args.class_idx is not None else ood_labels + id_labels

        for label in all_labels:
            if os.path.exists(os.path.join(out_folder, f"{label}_edges.npz")) and not args.regenerate:
                continue
            indices = list(label_to_indices[label])
            random.shuffle(indices)
            images = np.stack([data[i][0] for i in indices[: args.samples_per_class]])
            compute_class_circuit(
                circuit_model, images, label,
                node_threshold=args.node_threshold, out_folder=out_folder,
                dictionaries=dictionaries,
            )
    print("Done.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Configure CLIP models for neuron analysis.")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--domain", type=str, default="all",
                        choices=ALL_DOMAINS + ["all"])
    parser.add_argument("--class_idx", type=int, default=None)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--samples_per_class", type=int, default=50)
    parser.add_argument("--regenerate", action="store_true")
    parser.add_argument("--node_threshold", type=float, default=0.1)
    parser.add_argument("--sae_dir", type=str, default=None,
                        help="directory of trained SAE checkpoints ({submodule}.pt/.npz or "
                        "{submodule}/checkpoints/sparse_autoencoder_final.pt); layers without "
                        "one fall back to the neuron basis (IdentityDict)")
    parser.add_argument("--edge_threshold", type=float, default=0.01)
    parser.add_argument("--verbose", action="store_true")
    main(parser.parse_args())
