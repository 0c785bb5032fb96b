"""Merge CC3M/CC12M train samples with the paper's domain mixtures
(reference: scripts/merge_ccxm.py)."""

import argparse

import _common  # noqa: F401

from xclip_tpu.data.mixtures import merge_ccxm

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Merge CC3M/CC12M train samples with our domain mixtures.")
    parser.add_argument("--mode", type=str, required=True, choices=["cc3m", "cc12m"])
    parser.add_argument("--indices_path", type=str, default="data/indices")
    args = parser.parse_args()
    merge_ccxm(args.mode, args.indices_path)
