"""Synthesize ImageNet-Sketch captions (reference:
scripts/generate_sketch_captions.py)."""

import argparse

import _common  # noqa: F401

from xclip_tpu.data.captions import generate_sketch_captions

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Configure ImageNet-Sketch caption generation.")
    parser.add_argument("--imagenet_path", type=str, help="path to imagenet directory (containing sketch)")
    parser.add_argument("--seed", type=int, default=42, help="random seed")
    args = parser.parse_args()
    generate_sketch_captions(args.imagenet_path, seed=args.seed)
