"""CoCa golden parity vs the reference torch implementation + loss and
generation smoke tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.models.coca import (
    CoCaModel,
    coca_cfg_from_dict,
    coca_loss,
    coca_state_dict_to_params,
)

HAS_REFERENCE = os.path.exists("/root/reference")

SMALL_COCA = {
    "embed_dim": 64,
    "vision_cfg": {
        "image_size": 64, "layers": 2, "width": 64, "patch_size": 16, "head_width": 16,
        "attentional_pool": True, "attn_pooler_heads": 4, "attn_pooler_queries": 8,
        "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 20, "vocab_size": 512, "width": 64, "heads": 4, "layers": 2,
        "embed_cls": True, "output_tokens": True,
    },
    "multimodal_cfg": {
        "context_length": 20, "vocab_size": 512, "width": 64, "heads": 4, "layers": 2,
        "attn_pooler_heads": 4,
    },
    "custom_text": True,
}


def _inputs():
    rng = np.random.RandomState(0)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)
    text = np.zeros((2, 20), np.int64)
    text[:, 0] = 500
    text[0, 1:6] = [3, 7, 11, 2, 501]
    text[1, 1:4] = [9, 4, 501]
    return images, text


class TestCoCaLocal:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    def test_forward_shapes(self, model_and_params):
        model, params = model_and_params
        images, text = _inputs()
        out = model.forward(params, images, text)
        assert out["image_features"].shape == (2, 64)
        assert out["text_features"].shape == (2, 64)
        assert out["logits"].shape == (2, 19, 512)  # teacher-forced: L-1
        assert out["labels"].shape == (2, 19)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0, atol=1e-5
        )

    def test_loss(self, model_and_params):
        model, params = model_and_params
        images, text = _inputs()
        out = model.forward(params, images, text)
        loss, metrics = coca_loss(out)
        assert np.isfinite(float(loss))
        assert float(metrics["caption_loss"]) > 0

    def test_generate(self, model_and_params):
        model, params = model_and_params
        images, _ = _inputs()
        out = model.generate(
            params, images, seq_len=8, sot_token_id=500, eos_token_id=501, min_seq_len=2
        )
        assert out.shape == (2, 8)
        assert (out[:, 0] == 500).all()
        out_tp = model.generate(
            params, images, seq_len=6, sot_token_id=500, eos_token_id=501,
            generation_type="top_p", top_p=0.5, min_seq_len=2,
        )
        assert out_tp.shape == (2, 6)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_coca_golden_parity():
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch

    torch.manual_seed(0)
    ref = open_clip.CoCa(
        embed_dim=SMALL_COCA["embed_dim"],
        multimodal_cfg=SMALL_COCA["multimodal_cfg"],
        text_cfg=SMALL_COCA["text_cfg"],
        vision_cfg=SMALL_COCA["vision_cfg"],
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
    params = coca_state_dict_to_params(sd, model)

    images, text = _inputs()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(images).permute(0, 3, 1, 2), torch.from_numpy(text))

    out = model.forward(params, images, text)
    np.testing.assert_allclose(
        np.asarray(out["image_features"]), ref_out["image_features"].numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["text_features"]), ref_out["text_features"].numpy(), atol=3e-4, rtol=1e-3
    )
    # pad-query rows are fully masked and produce garbage in BOTH
    # implementations (softmax over -inf); compare only valid positions
    labels = ref_out["labels"].numpy()
    valid = labels != 0
    got_logits = np.asarray(out["logits"])[valid]
    ref_logits = ref_out["logits"].numpy()[valid]
    np.testing.assert_allclose(got_logits, ref_logits, atol=2e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(out["labels"]), labels)


def test_generate_beam_search():
    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
    params = model.init(jax.random.PRNGKey(0))
    images, _ = _inputs()
    out = model.generate(
        params, images, seq_len=7, sot_token_id=500, eos_token_id=501,
        generation_type="beam_search", num_beams=3, min_seq_len=2,
    )
    assert out.shape == (2, 7)
    assert (out[:, 0] == 500).all()
    # beam result should be at least as likely as greedy under the model —
    # sanity: it is a valid token sequence (ids within vocab)
    assert out.max() < 512 and out.min() >= 0
