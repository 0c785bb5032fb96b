"""End-to-end user journey: train a tiny CLIP through the real entry point,
then run the full DomainNet-LSO evaluation protocol on the produced
checkpoints over a synthetic data tree — the complete reference workflow
(train-clip.sh -> evaluate_domainnet_lso_openai.py) in miniature."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import xclip_tpu.evals.run_lso as run_lso_mod
from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32, "heads": 4, "layers": 2},
}


def _classnames():
    names = [f"thing {i}" for i in range(345)]
    for cls, idx in LSO_CLASS_TO_IDX.items():
        names[idx] = cls
    return names


@pytest.fixture(scope="module")
def eval_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(0)

    def save_img(path):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(path)

    # tiny "ImageNet" val: 3 wnids x 2 images
    for ci in range(3):
        for j in range(2):
            save_img(root / "imagenet" / "val" / f"n{ci:08d}" / f"im{j}.jpg")

    # DomainNet val TSVs: real + sketch, every class once
    names = _classnames()
    dn = root / "domainnet"
    for domain in ("real", "sketch"):
        rows = []
        for ci, cls in enumerate(names):
            cls_dir = cls.replace(" ", "_")
            p = dn / domain / cls_dir / "0.jpg"
            save_img(p)
            rows.append(f"{domain}/{cls_dir}/0.jpg\t{ci}\ta photo.")
        (dn / f"{domain}_test.tsv").write_text("\n".join(rows) + "\n")
    return root


@pytest.mark.slow
def test_full_lso_protocol(eval_tree, tmp_path, monkeypatch):
    import xclip_tpu.models.factory as F

    F._MODEL_CONFIGS["TinyE2E"] = TINY

    # train 1 epoch on synthetic data through the real entry point
    from xclip_tpu.train.main import main as train_main

    assert train_main([
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--batch-size", "1", "--epochs", "1", "--warmup", "1", "--workers", "2",
        "--model", "TinyE2E", "--logs", str(tmp_path), "--name", "e2e",
        "--zeroshot-frequency", "0", "--precision", "fp32",
    ]) == 0
    ckpt = tmp_path / "e2e" / "checkpoints" / "epoch_1.pt"
    assert ckpt.exists()

    # shrink the ImageNet label space to the 3 synthetic classes
    monkeypatch.setattr(run_lso_mod, "XCLIP_IMAGENET_CLASSES", ["cat", "dog", "fish"])

    results = run_lso_mod.run_lso_evaluation(
        "TinyE2E",
        [str(ckpt)],
        str(tmp_path / "eval"),
        str(eval_tree / "imagenet"),
        str(eval_tree / "domainnet"),
        domain="sketch",
        num_workers=2,
    )
    acc = results["domainnet-val"]["accuracy"]
    assert results["steps"] == [1]
    # full metric surface present with one value per checkpoint
    for key in ("sketch-lso-ood", "sketch-lso-id", "real-lso-ood", "real-lso-id",
                "sketch-lso-unweighted-id", "sketch-lso-unweighted-ood",
                "sketch-banana-ood", "real-traffic light-ood"):
        assert key in acc and len(acc[key]) == 1
        assert 0.0 <= acc[key][0] <= 1.0
    assert len(results["imagenet-val"]["accuracy"]["total"]) == 1
    assert results["domainnet-val"]["num-samples"]["sketch-lso-ood"][0] == 15

    out = tmp_path / "eval"
    for f in ("results.json", "val_pred.npy", "domain_pred.npy", "domain_labels.npy", "domain_ids.npy"):
        assert (out / f).exists()
    with open(out / "results.json") as fh:
        assert json.load(fh)["domain"] == "sketch"
