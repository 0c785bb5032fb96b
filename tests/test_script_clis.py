"""End-to-end smoke tests for the analysis/training script CLIs that only
had library-level coverage: the circuit-analysis chain (compute_circuits ->
compute_node_similarity -> compute_circuit_similarity), analyze_sae_features,
and train_combined_captions (multi-epoch — regression test for the
validation pass consuming donated train-step buffers)."""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax

pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")

TINY_RN = {
    "embed_dim": 16,
    "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1], "width": 8, "patch_size": None},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 16, "heads": 2, "layers": 1},
}


def _load_script(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, SCRIPTS)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(SCRIPTS)
    return mod


def _dn_tree(root, domains, n_classes=4, per_class=2, size=32):
    rng = np.random.RandomState(0)
    for domain in domains:
        rows = []
        for ci in range(n_classes):
            for j in range(per_class):
                p = root / domain / f"cls{ci}" / f"{j}.jpg"
                p.parent.mkdir(parents=True, exist_ok=True)
                Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(p)
                rows.append(f"{domain}/cls{ci}/{j}.jpg\t{ci}\ta photo.")
        (root / f"{domain}_test.tsv").write_text("\n".join(rows) + "\n")
    return root


def test_circuit_analysis_cli_chain(tmp_path, monkeypatch):
    """compute_circuits per domain, then node/circuit similarity across the
    produced artifacts — the paper's Fig. 6 pipeline end to end."""
    import xclip_tpu.models.factory as F
    from xclip_tpu.core.checkpoint import save_open_clip_checkpoint

    monkeypatch.setitem(F._MODEL_CONFIGS, "TinyCircRN", TINY_RN)
    dn = _dn_tree(tmp_path / "domainnet", ["real", "sketch"])

    model, params, state = F.create_model("TinyCircRN")
    model_dir = tmp_path / "model"
    (model_dir / "checkpoints").mkdir(parents=True)
    save_open_clip_checkpoint(
        str(model_dir / "checkpoints" / "epoch_32.pt"), model, params, state, epoch=32)

    circuits = _load_script("compute_circuits")
    for domain in ("real", "sketch"):
        circuits.main(argparse.Namespace(
            model="TinyCircRN", model_dir=str(model_dir), domain=domain,
            class_idx=2, domainnet_path=str(dn), batch_size=4, seed=0,
            samples_per_class=2, regenerate=False, node_threshold=0.25,
            sae_dir=None, edge_threshold=0.01, verbose=False))
        out = model_dir / "circuit_analysis" / domain
        for suffix in ("nodes", "features_by_submod", "edges"):
            assert (out / f"2_{suffix}.npz").exists(), (domain, suffix)

    node_sim = _load_script("compute_node_similarity")
    node_sim.main(argparse.Namespace(model_dir=str(model_dir), out_path=str(tmp_path / "ns")))
    with open(tmp_path / "ns" / "node_similarity.json") as fh:
        ns = json.load(fh)
    assert ns["all"], ns
    for layer, pairs in ns["all"].items():
        assert set(pairs) == {"real|sketch"}
        assert 0.0 <= pairs["real|sketch"] <= 1.0

    circ_sim = _load_script("compute_circuit_similarity")
    for metric in ("jaccard", "wl"):
        circ_sim.main(argparse.Namespace(
            model_dir=str(model_dir), out_path=str(tmp_path / "cs"),
            metric=metric, edge_k=2, wl_iterations=2))
        with open(tmp_path / "cs" / f"circuit_similarity_{metric}.json") as fh:
            cs = json.load(fh)
        assert set(cs["all"]) == {"real|sketch"}
        assert 0.0 <= cs["all"]["real|sketch"] <= 1.0 + 1e-6


def test_analyze_sae_features_cli(tmp_path, monkeypatch):
    """analyze_sae_features: feature-sharing score from a reference-format
    SAE checkpoint + an exported CLIP checkpoint on a 6-domain tree."""
    import torch

    import xclip_tpu.models.factory as F
    from xclip_tpu.core.checkpoint import save_open_clip_checkpoint
    from xclip_tpu.sae.model import SAECfg, sae_init, sae_params_to_state_dict

    monkeypatch.setitem(F._MODEL_CONFIGS, "TinySaeRN", TINY_RN)
    domains = ["clipart", "infograph", "painting", "quickdraw", "real", "sketch"]
    dn = _dn_tree(tmp_path / "domainnet", domains)

    model, params, state = F.create_model("TinySaeRN")
    ckpt = tmp_path / "clip.pt"
    save_open_clip_checkpoint(str(ckpt), model, params, state, epoch=1)

    sae_params = sae_init(jax.random.PRNGKey(0), SAECfg(16, 32))
    sae_dir = tmp_path / "sae" / "checkpoints"
    sae_dir.mkdir(parents=True)
    torch.save(
        {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in sae_params_to_state_dict(sae_params).items()},
        sae_dir / "sparse_autoencoder_final.pt")

    analyze = _load_script("analyze_sae_features")
    analyze.main(argparse.Namespace(
        model="TinySaeRN", ckpt_path=str(ckpt), sae_path=str(tmp_path / "sae"),
        domainnet_path=str(dn), out_path=str(tmp_path / "out"),
        domain="sketch", input_dim=16, expansion_factor=2, num_workers=2))
    assert os.listdir(tmp_path / "out")


def test_train_combined_captions_cli(tmp_path, monkeypatch):
    """train_combined_captions for TWO epochs on a tiny CombinedNet tree:
    checkpoints land, the save-first checkpoint exists, and the validation
    pass must not consume the donated train-step buffers (running epoch 2
    after validation is the regression)."""
    from xclip_tpu.train.learner import ClassifierCfg

    import xclip_tpu.models.factory as F

    monkeypatch.setitem(F._MODEL_CONFIGS, "TinySupRN", TINY_RN)
    monkeypatch.setattr(ClassifierCfg, "backbone_name", property(lambda self: "TinySupRN"))
    monkeypatch.setattr(ClassifierCfg, "feature_dim", property(lambda self: 16))

    # CombinedNet tree: one ImageNet wnid dir + one DomainNet classname dir
    rng = np.random.RandomState(0)
    with open(os.path.join(REPO, "data", "imagenet_class_index.json")) as fh:
        wnid = json.load(fh)["0"][0]
    rows = {"train": [], "val": []}
    for split, n in (("train", 8), ("val", 8)):
        for parent in (wnid, "banana"):
            for j in range(n):
                p = tmp_path / "imgs" / split / parent / f"{j}.jpg"
                p.parent.mkdir(parents=True, exist_ok=True)
                Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(p)
                rows[split].append(f"{p}\ta photo.\n")
    for split in rows:
        (tmp_path / f"{split}.tsv").write_text("filepath\ttitle\n" + "".join(rows[split]))

    train_mod = _load_script("train_combined_captions")
    train_mod.train(argparse.Namespace(
        model="rn50-clip",
        train_index_path=str(tmp_path / "train.tsv"),
        val_index_path=str(tmp_path / "val.tsv"),
        in_class_index_path=os.path.join(REPO, "data", "imagenet_class_index.json"),
        class_mapping_path=os.path.join(REPO, "data", "in_to_dn_mapping.json"),
        experiment_name="smoke", learning_rate=0.01, batch_size=8,
        num_workers=2, max_epochs=2, save_epochs=1, seed=0,
        ckpt_path=None, ws_path=str(tmp_path), precision="fp32",
        detect_anomaly=False,
    ))
    ckpt_dir = tmp_path / "checkpoints" / "smoke"
    for name in ("epoch=0-step=0.npz", "epoch=1.npz", "epoch=2.npz", "last.npz"):
        assert (ckpt_dir / name).exists(), name
