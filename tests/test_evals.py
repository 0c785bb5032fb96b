"""Zero-shot classifier + LSO metric tests."""

import numpy as np
import pytest

import jax

from xclip_tpu.evals.lso import (
    LSO_CLASS_TO_IDX,
    accuracy_score,
    evaluate_lso,
    epoch_or_step_from_ckpt_file,
    merge_step_results,
    top_k_accuracy,
)
from xclip_tpu.evals.metadata import (
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
    XCLIP_IMAGENET_CLASSES,
    XCLIP_OPENAI_TEMPLATES,
)
from xclip_tpu.evals.zero_shot import OpenAIZeroShotClassifier, ZeroShotClassifier
from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
from xclip_tpu.tokenizer import SimpleTokenizer

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32, "heads": 4, "layers": 2},
}


def test_metadata_shapes():
    assert len(IMAGENET_CLASSNAMES) == 1000
    assert len(XCLIP_IMAGENET_CLASSES) == 1000
    assert len(OPENAI_IMAGENET_TEMPLATES) == 80
    assert len(XCLIP_OPENAI_TEMPLATES) == 86
    # the 4 known divergences between the lists
    diffs = [i for i, (a, b) in enumerate(zip(XCLIP_IMAGENET_CLASSES, IMAGENET_CLASSNAMES)) if a != b]
    assert diffs == [27, 638, 744, 836]


def test_domain_invariant_filter():
    # reference filter keeps templates containing any domain keyword
    kept = [
        t for t in XCLIP_OPENAI_TEMPLATES
        if any(d in t for d in ["clipart", "infograph", "painting", "quickdraw", "sketch"])
    ]
    assert len(kept) == 10  # 2 painting + 2 sketch + 6 domain templates


@pytest.fixture(scope="module")
def tiny_model():
    model = CLIPModel(clip_cfg_from_dict(TINY))
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_openai_zero_shot_ensemble_math(tiny_model):
    """Classifier matrix equals manual per-class mean-then-renormalize."""
    model, params, _ = tiny_model
    tok = SimpleTokenizer()
    classes = ["banana", "candle", "lion"]
    tpls = XCLIP_OPENAI_TEMPLATES[:5]
    clf = OpenAIZeroShotClassifier(model, params, tok, classes, templates=tpls)
    assert clf.prompt_feat.shape == (3, 32)

    for ci, cls in enumerate(classes):
        tokens = tok([t.format(cls) for t in tpls])
        feats, _ = model.encode_text(params, tokens, normalize=True)
        mean = np.asarray(feats).mean(axis=0)
        mean /= np.linalg.norm(mean)
        np.testing.assert_allclose(clf.prompt_feat[ci], mean, atol=1e-5)

    # predictions = argmax of cosine
    rng = np.random.RandomState(0)
    img_feat = rng.randn(7, 32).astype(np.float32)
    img_feat /= np.linalg.norm(img_feat, axis=1, keepdims=True)
    pred = clf.predict_from_features(img_feat)["pred"]
    np.testing.assert_array_equal(pred, (img_feat @ clf.prompt_feat.T).argmax(1))


def test_zero_shot_classifier_single_prompt(tiny_model):
    model, params, _ = tiny_model
    tok = SimpleTokenizer()
    clf = ZeroShotClassifier(model, params, tok, ["dog", "cat"], prompt_fn=lambda c: f"a photo of a {c}.")
    assert clf.prompt_feat.shape == (2, 32)


def test_lso_metrics_synthetic():
    """Metric layout + math on a crafted example covering id/ood splits."""
    rng = np.random.RandomState(0)
    n_classes = 345
    classes = {i: f"class {i}" for i in range(n_classes)}
    for name, idx in LSO_CLASS_TO_IDX.items():
        classes[idx] = name

    # build a balanced synthetic eval: 2 domains (sketch=5, real=4), every class twice
    per_domain = np.repeat(np.arange(n_classes), 2)
    domain_labels = np.concatenate([per_domain, per_domain])
    domain_ids = np.array([5] * len(per_domain) + [4] * len(per_domain))
    domain_pred = domain_labels.copy()
    # corrupt predictions for all LSO-class samples in sketch -> ood acc 0 there
    lso_vals = np.array(list(LSO_CLASS_TO_IDX.values()))
    sketch_lso = (domain_ids == 5) & np.isin(domain_labels, lso_vals)
    domain_pred[sketch_lso] = (domain_labels[sketch_lso] + 1) % n_classes

    val_labels = rng.randint(0, 1000, 50)
    val_pred = val_labels.copy()
    val_pred[:25] = (val_pred[:25] + 1) % 1000

    res = evaluate_lso(
        val_labels=val_labels, val_pred=val_pred,
        domain_labels=domain_labels, domain_pred=domain_pred, domain_ids=domain_ids,
        domain="sketch", domainnet_classes=classes,
    )
    acc = res["domainnet-val"]["accuracy"]
    assert res["imagenet-val"]["accuracy"]["total"] == 0.5
    assert acc["sketch-lso-ood"] == 0.0
    assert acc["sketch-lso-id"] == 1.0
    assert acc["real-lso-ood"] == 1.0
    assert acc["sketch-lso-unweighted-ood"] == 0.0
    assert acc["sketch-lso-unweighted-id"] == 1.0
    assert res["domainnet-val"]["num-samples"]["sketch-lso-ood"] == 30
    assert acc["sketch-banana-ood"] == 0.0
    assert acc["real-banana-ood"] == 1.0

    merged = merge_step_results([res, res], steps=[1, 2], domain="sketch")
    assert merged["imagenet-val"]["accuracy"]["total"] == [0.5, 0.5]
    assert merged["steps"] == [1, 2]

    # domainnet-only mode (supervised protocol, reference
    # evaluate_domainnet_supervised_lso.py reports no imagenet-val)
    res_dn = evaluate_lso(
        domain_labels=domain_labels, domain_pred=domain_pred, domain_ids=domain_ids,
        domain="sketch", domainnet_classes=classes,
    )
    assert res_dn["imagenet-val"] == {"accuracy": {}}
    assert res_dn["domainnet-val"]["accuracy"] == acc
    with pytest.raises(ValueError):
        evaluate_lso(
            val_labels=val_labels,
            domain_labels=domain_labels, domain_pred=domain_pred, domain_ids=domain_ids,
            domain="sketch", domainnet_classes=classes,
        )


def test_eval_precision_numerics(tiny_model):
    """Quantify the fp16/bf16-vs-fp32 eval-path deltas underpinning the
    ±0.1% LSO parity target (the reference evaluates .half() encoders —
    evaluate_domainnet_lso_openai.py:30). fp16 ('float16' policy) must track
    fp32 features closely and the fp16-score matmul must bound-score any
    argmax flip to near-ties only."""
    import jax.numpy as jnp

    model, params, state = tiny_model
    tok = SimpleTokenizer()
    rng = np.random.RandomState(0)
    imgs = rng.randn(64, 32, 32, 3).astype(np.float32)
    classes = ["dog", "cat", "car", "tree", "fish"]

    feats, scores = {}, {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16), ("fp16", jnp.float16)):
        f, _, _ = model.encode_image(params, imgs, state=state, normalize=True, dtype=dtype)
        f = np.asarray(f, np.float32)
        clf = OpenAIZeroShotClassifier(model, params, tok, classes, dtype=dtype)
        pf = clf.prompt_feat.astype(np.float16 if name == "fp16" else np.float32)
        feats[name] = f
        scores[name] = (f.astype(pf.dtype) @ pf.T).astype(np.float32)

    # feature agreement: half precisions within ~1e-2 of fp32 on unit vectors
    assert np.abs(feats["fp16"] - feats["fp32"]).max() < 1e-2
    assert np.abs(feats["bf16"] - feats["fp32"]).max() < 4e-2
    # score agreement: any prediction flip can only happen on ties closer
    # than these bounds (scores are cosine similarities in [-1, 1])
    d16 = np.abs(scores["fp16"] - scores["fp32"]).max()
    dbf = np.abs(scores["bf16"] - scores["fp32"]).max()
    assert d16 < 1e-2, d16
    assert dbf < 4e-2, dbf
    # fp16 is the tighter mirror of the reference protocol
    assert d16 <= dbf


def test_topk_and_ckpt_key():
    scores = np.array([[0.1, 0.5, 0.4], [0.9, 0.05, 0.05]])
    y = np.array([2, 0])
    assert top_k_accuracy(scores, y, 1) == 0.5
    assert top_k_accuracy(scores, y, 2) == 1.0
    assert epoch_or_step_from_ckpt_file("/x/epoch_32.pt") == 32
    assert epoch_or_step_from_ckpt_file("step_1024.pt") == 1024
    assert accuracy_score([1, 2], [1, 3]) == 0.5
