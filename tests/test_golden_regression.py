"""Golden-output regression tests over the native tower zoo.

Reference pattern: deps/open_clip/tests/test_inference.py +
util_test.py:110-170 (create_test_data_for_model) — seeded random
image/text batches are run through each model config once, the outputs
are committed to the repo (tests/goldens/*.npz), and every future run is
compared against them. This is the only numerics pin available for the
tower families whose torch oracle (timm) is absent from this image:
any refactor that silently changes convnext/eva/swin/vitamin/mobileclip/
timm-vit math fails here even though no cross-implementation parity test
can run.

Regenerate (after an INTENDED numerics change, never to paper over an
accidental one): python tests/test_golden_regression.py --regen
"""

import os
import sys

import numpy as np
import pytest

import jax

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

# Smallest member of every native tower family (keeps CPU cost bounded the
# way the reference's test_inference.py models list does), plus the
# oracle-backed RN50/ViT as drift canaries, the exotic text towers, and —
# since round 5 (VERDICT r4 #6) — one config per head/pooling variant so
# every code path in models/ is pinned by at least one golden:
#   RN50x4/RN101 (wider/deeper ModifiedResNet + attnpool dims),
#   ViT-B-16 (p16 grid), ViT-B-32-quickgelu (quick_gelu),
#   ViT-M-16-alt (LayerScale), ViT-L-14-CLIPA (no_ln_pre + avg pool +
#   final_ln_after_pool + last-token no-causal text), roberta-ViT-B-32
#   (HF text tower), mt5-base-ViT-B-32 (flax T5 encoder text),
#   ViTamin-S-LTT (LTT text), convnext_large_d (mlp head proj),
#   coca_ViT-B-32 (vision attentional pool), nllb-clip-base-siglip
#   (M2M100 text x SigLIP vision), ViT-SO400M-14-SigLIP
#   (AttentionPoolLatent 'map' trunk pooling).
GOLDEN_MODELS = [
    "RN50",
    "ViT-B-32",
    "convnext_tiny",
    "ViT-B-16-SigLIP",
    "vit_medium_patch16_gap_256",
    "vit_relpos_medium_patch16_cls_224",
    "EVA02-B-16",
    "swin_tiny_patch4_window7_224",
    "ViTamin-S",
    "MobileCLIP-B",
    "MobileCLIP-S1",
    "nllb-clip-base",
    "coca_base",
    # round-5 variant coverage
    "RN50x4",
    "RN101",
    "ViT-B-16",
    "ViT-B-32-quickgelu",
    "ViT-M-16-alt",
    "ViT-L-14-CLIPA",
    "roberta-ViT-B-32",
    "mt5-base-ViT-B-32",
    "ViTamin-S-LTT",
    "convnext_large_d",
    "coca_ViT-B-32",
    "nllb-clip-base-siglip",
    "ViT-SO400M-14-SigLIP",
]


def _seeded_batch(model_name, model):
    """Deterministic image + token batch for a built model (the analogue of
    util_test.py's seeded random inputs)."""
    from xclip_tpu.models.factory import is_coca_model

    cfg = model.cfg
    size = cfg.image_size if hasattr(cfg, "image_size") else cfg.vision.image_size
    rng = np.random.RandomState(0)
    images = rng.rand(2, size, size, 3).astype(np.float32) * 2.0 - 1.0

    texts = None
    if is_coca_model(model_name):
        pass  # CoCa goldens pin the image branch (text needs labels plumbing)
    elif model.cfg.is_hf_text:
        # HF/native-HF text towers (roberta/mt5/m2m100): ids in [5, 1000)
        # never collide with any family's pad/bos/eos ids (0-2), so the
        # internal pad mask is all-ones and the golden is deterministic
        tcfg = model.cfg.text
        ctx = getattr(tcfg, "context_length", 77) or 77
        texts = rng.randint(5, 1000, size=(2, ctx)).astype(np.int32)
    else:
        tcfg = model.cfg.text
        ctx, vocab = tcfg.context_length, tcfg.vocab_size
        ids = rng.randint(1, vocab - 2, size=(2, ctx)).astype(np.int32)
        ids[:, 0] = vocab - 2  # sot
        ids[:, 6] = vocab - 1  # eot == argmax -> CLIP pooling site
        ids[:, 7:] = 0
        texts = ids
    return images, texts


def _run_model(model_name):
    from xclip_tpu.models.factory import create_model

    model, params, state = create_model(model_name, pretrained_hf=False)
    images, texts = _seeded_batch(model_name, model)
    out = {}
    feats, _, _ = model.encode_image(params, images, state=state, normalize=True)
    out["image_features"] = np.asarray(feats, np.float32)
    if texts is not None:
        res = model.encode_text(params, texts, normalize=True)
        feats = res[0] if isinstance(res, tuple) else res
        out["text_features"] = np.asarray(feats, np.float32)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("model_name", GOLDEN_MODELS)
def test_golden_regression(model_name):
    path = os.path.join(GOLDEN_DIR, model_name + ".npz")
    assert os.path.exists(path), (
        f"no golden for {model_name}; run `python tests/test_golden_regression.py --regen`"
    )
    golden = dict(np.load(path))
    got = _run_model(model_name)
    assert set(got) == set(golden), (model_name, set(got), set(golden))
    for key, ref in golden.items():
        np.testing.assert_allclose(
            got[key], ref, rtol=2e-3, atol=2e-4,
            err_msg=f"{model_name}:{key} drifted from the committed golden — "
                    "if the numerics change was intentional, regenerate with "
                    "`python tests/test_golden_regression.py --regen`",
        )


def _regen(only=None, missing_only=False):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in GOLDEN_MODELS:
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if only and name not in only:
            continue
        if missing_only and os.path.exists(path):
            continue
        out = _run_model(name)
        np.savez(path, **out)
        shapes = {k: v.shape for k, v in out.items()}
        print(f"regenerated {name}: {shapes}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        names = [a for a in sys.argv[1:] if not a.startswith("--")]
        _regen(only=set(names) or None, missing_only="--missing-only" in sys.argv)
    else:
        print(__doc__)
