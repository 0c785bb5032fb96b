"""End-to-end training smoke tests through the real main() entry point on
synthetic data — the reference's CPU test pattern
(deps/open_clip/tests/test_training_simple.py:17-103), here on an 8-virtual-
device CPU mesh so the sharded step, meters, checkpointing and resume all
exercise for real."""

import os

import numpy as np
import pytest

from xclip_tpu.train.main import main

SMALL_MODEL = "ViT-S-32"  # smallest bundled config


def _args(tmp_path, name, extra=()):
    return [
        "--save-frequency", "1",
        "--zeroshot-frequency", "1",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--warmup", "1",
        "--batch-size", "2",
        "--lr", "1e-3",
        "--wd", "0.1",
        "--epochs", "1",
        "--workers", "2",
        "--model", SMALL_MODEL,
        "--logs", str(tmp_path),
        "--name", name,
        "--log-every-n-steps", "1",
        *extra,
    ]


def test_training_synthetic(tmp_path):
    assert main(_args(tmp_path, "smoke")) == 0
    ckpt = tmp_path / "smoke" / "checkpoints" / "epoch_1.pt"
    assert ckpt.exists()
    # checkpoint is readable by torch in open_clip format
    import torch

    d = torch.load(str(ckpt), map_location="cpu", weights_only=False)
    assert d["epoch"] == 1
    assert "state_dict" in d and "logit_scale" in d["state_dict"]


def test_training_accum_and_remat(tmp_path):
    assert main(_args(tmp_path, "smoke-accum", ["--accum-freq", "2", "--grad-checkpointing"])) == 0


def test_training_resume_latest(tmp_path):
    assert main(_args(tmp_path, "resume")) == 0
    # second run resumes from epoch_1 and trains epoch 2
    args = _args(tmp_path, "resume", ["--resume", "latest"])
    idx = args.index("--epochs")
    args[idx + 1] = "2"
    assert main(args) == 0
    assert (tmp_path / "resume" / "checkpoints" / "epoch_2.pt").exists()


def test_training_native_ckpt(tmp_path):
    assert main(_args(tmp_path, "native", ["--native-ckpt"])) == 0
    assert (tmp_path / "native" / "checkpoints" / "epoch_1.npz").exists()


def test_training_with_val_data(tmp_path):
    """--val-data drives the in-training evaluate() path: contrastive val
    loss + retrieval metrics -> results.jsonl (reference train.py:267-373)."""
    import json

    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = ["filepath\ttitle"]
    for i in range(6):
        p = img_dir / f"{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        rows.append(f"{p}\ta photo number {i}")
    tsv = tmp_path / "val.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    assert main(_args(tmp_path, "with-val", ["--val-data", str(tsv), "--val-frequency", "1"])) == 0
    results = tmp_path / "with-val" / "checkpoints" / "results.jsonl"
    assert results.exists()
    rec = json.loads(results.read_text().splitlines()[-1])
    assert "clip_val_loss" in rec and np.isfinite(rec["clip_val_loss"])
    assert "image_to_text_R@1" in rec
