"""Add ImageNet-Sketch captions to the paper mixtures (reference:
scripts/add_in_sketches.py)."""

import argparse

import _common  # noqa: F401

from xclip_tpu.data.mixtures import add_in_sketches

if __name__ == "__main__":
    parser = argparse.ArgumentParser("Configure Imagenet-Sketch integration.")
    parser.add_argument("--imagenet_path", type=str, required=True)
    parser.add_argument("--indices_path", type=str, default="data/indices")
    parser.add_argument("--class_mapping_path", type=str, default="data/in_to_dn_mapping.json")
    args = parser.parse_args()
    add_in_sketches(args.imagenet_path, args.indices_path, args.class_mapping_path)
