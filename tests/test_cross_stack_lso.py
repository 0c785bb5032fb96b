"""Cross-stack eval-protocol parity: run the REFERENCE
scripts/evaluate_domainnet_lso_openai.py (torch CPU, fp16 — its real code,
not a re-implementation) and this repo's evaluator on the SAME synthetic
ImageNet+DomainNet tree with the SAME checkpoint, and diff results.json.

This is the test that converts the "LSO top-1 parity vs reference
checkpoints" north star from believed to measured: it exercises transform
resampling, classifier build order, and ID/OOD split bookkeeping through
both stacks end to end.
"""

import json
import os
import argparse

import numpy as np
import pytest
from PIL import Image

from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX

HAS_REFERENCE = os.path.exists("/root/reference")
pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32, "heads": 4, "layers": 2},
}
IMAGENET_TINY_CLASSES = ["cat", "dog", "fish"]


def _classnames():
    names = [f"thing {i}" for i in range(345)]
    for cls, idx in LSO_CLASS_TO_IDX.items():
        names[idx] = cls
    return names


def _build_tree(root):
    rng = np.random.RandomState(0)

    def save_img(path):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(path)

    for ci in range(len(IMAGENET_TINY_CLASSES)):
        for j in range(2):
            save_img(root / "imagenet" / "val" / f"n{ci:08d}" / f"im{j}.png")

    names = _classnames()
    dn = root / "domainnet"
    for domain in ("real", "sketch"):
        rows = []
        for ci, cls in enumerate(names):
            cls_dir = cls.replace(" ", "_")
            p = dn / domain / cls_dir / "0.png"
            save_img(p)
            rows.append(f"{domain}/{cls_dir}/0.png\t{ci}\ta photo.")
        (dn / f"{domain}_test.tsv").write_text("\n".join(rows) + "\n")
    return root


@pytest.mark.slow
def test_cross_stack_lso_results(tmp_path, monkeypatch):
    import jax

    import xclip_tpu.evals.run_lso as run_lso_mod
    import xclip_tpu.models.factory as F
    from xclip_tpu.core.checkpoint import save_open_clip_checkpoint
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    tree = _build_tree(tmp_path / "tree")

    # one shared checkpoint, produced by OUR stack
    F._MODEL_CONFIGS["TinyXS"] = TINY
    model = CLIPModel(clip_cfg_from_dict(TINY))
    params, state = model.init(jax.random.PRNGKey(7))
    ckpt = tmp_path / "ckpts" / "epoch_1.pt"
    ckpt.parent.mkdir()
    save_open_clip_checkpoint(str(ckpt), model, params, state)

    # ---- reference stack -------------------------------------------------
    from ref_compat import import_reference_module, import_reference_open_clip, setup_reference_xclip

    setup_reference_xclip()
    open_clip = import_reference_open_clip()
    cfg_dir = tmp_path / "ref_cfg"
    cfg_dir.mkdir()
    with open(cfg_dir / "TinyXS.json", "w") as fh:
        json.dump(TINY, fh)
    open_clip.add_model_config(cfg_dir / "TinyXS.json")

    ref_script = import_reference_module(
        "ref_eval_lso", "/root/reference/scripts/evaluate_domainnet_lso_openai.py"
    )
    ref_script.openai_imagenet_classes = IMAGENET_TINY_CLASSES
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    ref_script.main(argparse.Namespace(
        model="TinyXS", domain="sketch", ckpt_files=[str(ckpt)], out_path=str(ref_out),
        imagenet_path=str(tree / "imagenet"), domainnet_path=str(tree / "domainnet"),
        num_workers=0, domain_invariant=False, cls=None,
    ))

    # ---- this repo's stack ----------------------------------------------
    monkeypatch.setattr(run_lso_mod, "XCLIP_IMAGENET_CLASSES", IMAGENET_TINY_CLASSES)
    our_out = tmp_path / "our_out"
    run_lso_mod.run_lso_evaluation(
        "TinyXS", [str(ckpt)], str(our_out), str(tree / "imagenet"),
        str(tree / "domainnet"), domain="sketch", num_workers=2, precision="fp16",
    )

    with open(ref_out / "results.json") as fh:
        ref = json.load(fh)
    with open(our_out / "results.json") as fh:
        ours = json.load(fh)

    # protocol bookkeeping must be EXACT
    assert ours["steps"] == ref["steps"] == [1]
    assert ours["classes"] == ref["classes"]
    assert ours["domain"] == ref["domain"] == "sketch"
    assert ours["domainnet-val"]["num-samples"] == ref["domainnet-val"]["num-samples"]
    for f in ("val_labels.npy", "domain_labels.npy", "domain_ids.npy"):
        np.testing.assert_array_equal(
            np.load(our_out / f).astype(np.int64), np.load(ref_out / f).astype(np.int64),
            err_msg=f,
        )
    assert set(ours["domainnet-val"]["accuracy"]) == set(ref["domainnet-val"]["accuracy"])

    # prediction-level agreement: both stacks run fp16 encoders, so any
    # disagreement is a numerics tie-flip, not a protocol divergence
    dn_ref = np.load(ref_out / "domain_pred.npy")[0]
    dn_our = np.load(our_out / "domain_pred.npy")[0]
    agree = float(np.mean(dn_ref == dn_our))
    assert agree >= 0.95, f"domain prediction agreement {agree:.3f}"

    # aggregate accuracies track within the tie-flip budget
    for key in ("sketch-lso-id", "real-lso-id", "sketch-lso-unweighted-id",
                "real-lso-unweighted-id", "sketch-lso-ood", "real-lso-ood"):
        a, b = ours["domainnet-val"]["accuracy"][key][0], ref["domainnet-val"]["accuracy"][key][0]
        assert abs(a - b) <= 0.05, f"{key}: ours={a} ref={b}"
    a = ours["imagenet-val"]["accuracy"]["total"][0]
    b = ref["imagenet-val"]["accuracy"]["total"][0]
    assert abs(a - b) <= 1 / 3 + 1e-9, f"imagenet-val: ours={a} ref={b} (6 samples)"
