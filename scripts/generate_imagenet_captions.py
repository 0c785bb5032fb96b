"""ImageNet-Captions JSON -> train/val TSVs (reference:
scripts/generate_imagenet_captions.py)."""

import argparse

import _common  # noqa: F401

from xclip_tpu.data.captions import generate_imagenet_captions

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Configure ImageNet caption generation.")
    parser.add_argument("--imagenet_train_path", type=str, help="path to imagenet train directory")
    parser.add_argument("--imagenet_captions_path", type=str, default="data/imagenet_captions.json")
    parser.add_argument("--imagenet_captions_split_path", type=str,
                        default="data/imagenet_captions_train_val_split.json")
    parser.add_argument("--out_path", type=str, default="data/indices")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()
    generate_imagenet_captions(
        args.imagenet_train_path, args.imagenet_captions_path,
        args.imagenet_captions_split_path, args.out_path, seed=args.seed,
    )
