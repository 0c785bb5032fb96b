"""Synthesize DomainNet captions (reference:
scripts/generate_domainnet_captions.py)."""

import argparse

import _common  # noqa: F401

from xclip_tpu.data.captions import generate_domainnet_captions

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Configure DomainNet caption generation.")
    parser.add_argument("--domainnet_path", type=str, help="path to domainnet directory")
    parser.add_argument("--seed", type=int, default=42, help="random seed")
    args = parser.parse_args()
    generate_domainnet_captions(args.domainnet_path, seed=args.seed)
