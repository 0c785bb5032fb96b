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
    # the reference's text_decoder.text_projection is torch.empty and never
    # initialized (uninitialized heap memory: NaN/denormals/1e38 garbage that
    # varies per instantiation) — real checkpoints overwrite it; seed it so
    # logits parity is numerically meaningful
    with torch.no_grad():
        proj = ref.text_decoder.text_projection
        proj.copy_(torch.from_numpy(
            np.random.RandomState(7).randn(*proj.shape).astype(np.float32) * 0.02
        ))
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
    np.testing.assert_array_equal(np.asarray(out["labels"]), labels)

    # logits parity on NON-padded text: with pad tokens present, the
    # replicated cls-mask quirk makes fully-masked rows emit garbage/NaN in
    # BOTH implementations, and that garbage propagates through later
    # attention layers with backend-dependent values — any comparison on it
    # is either vacuous (NaN==NaN) or flaky. Full-length text has no masked
    # rows, so every logit is meaningful and parity is tight.
    rng = np.random.RandomState(3)
    full_text = rng.randint(1, 500, size=text.shape).astype(np.int64)
    full_text[:, 0] = 500
    with torch.no_grad():
        ref_full = ref(torch.from_numpy(images).permute(0, 3, 1, 2), torch.from_numpy(full_text))
    out_full = model.forward(params, images, full_text)
    assert np.isfinite(ref_full["logits"].numpy()).all()
    np.testing.assert_allclose(
        np.asarray(out_full["logits"]), ref_full["logits"].numpy(), atol=2e-3, rtol=1e-3
    )


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


class TestGroupedBeamSearch:
    """The reference's default generation is grouped beam search
    (coca_model.py:323-473, num_beams=6 / num_beam_groups=3). The installed
    transformers no longer exports BeamSearchScorer, so the reference path
    itself cannot run here; these are behavioral property tests instead."""

    @pytest.fixture(scope="class")
    def setup(self):
        model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
        params = model.init(jax.random.PRNGKey(0))
        images, _ = _inputs()
        return model, params, images

    def _seq_logprob(self, model, params, images, seq, eos=501):
        """Length-normalized model log-prob of tokens[1:] (up to+incl. EOS)."""
        _, image_embs = model.encode_image_with_tokens(params, images)
        _, token_embs = model.encode_text_with_tokens(params, jnp.asarray(seq))
        logits = np.asarray(model.decode(params, image_embs, token_embs))
        logp = logits - logits.max(-1, keepdims=True)
        logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
        scores = []
        for b in range(seq.shape[0]):
            total, n = 0.0, 0
            for pos in range(1, seq.shape[1]):
                tok = int(seq[b, pos])
                total += logp[b, pos - 1, tok]
                n += 1
                if tok == eos:
                    break
            scores.append(total / max(n, 1))
        return np.array(scores)

    def test_groups_run_and_deterministic(self, setup):
        model, params, images = setup
        kw = dict(seq_len=8, sot_token_id=500, eos_token_id=501,
                  generation_type="beam_search", min_seq_len=2)
        for beams, groups in [(4, 2), (4, 4), (6, 3)]:
            a = model.generate(params, images, num_beams=beams, num_beam_groups=groups, **kw)
            b = model.generate(params, images, num_beams=beams, num_beam_groups=groups, **kw)
            np.testing.assert_array_equal(a, b)
            assert a.shape == (2, 8) and (a[:, 0] == 500).all()

    def test_indivisible_raises(self, setup):
        model, params, images = setup
        with pytest.raises(ValueError):
            model.generate(params, images, seq_len=6, generation_type="beam_search",
                           num_beams=5, num_beam_groups=3)

    def test_beam_beats_greedy(self, setup):
        """With one group, beam search must find sequences at least as likely
        (length-normalized) as greedy decoding."""
        model, params, images = setup
        kw = dict(seq_len=8, sot_token_id=500, eos_token_id=501, min_seq_len=2)
        beam = model.generate(params, images, generation_type="beam_search",
                              num_beams=4, num_beam_groups=1, **kw)
        greedy = model.generate(params, images, generation_type="top_k", top_k=1, **kw)
        s_beam = self._seq_logprob(model, params, images, beam)
        s_greedy = self._seq_logprob(model, params, images, greedy)
        assert (s_beam >= s_greedy - 1e-4).all(), (s_beam, s_greedy)


def test_coca_training_cli(tmp_path):
    """CoCa trains through the real training entry point (reference trains
    coca_* configs via the same training/main.py + CoCaLoss): loss finite,
    decoder gets gradients, checkpoint lands in the native format."""
    import xclip_tpu.models.factory as F
    from xclip_tpu.train.main import main as train_main

    F._MODEL_CONFIGS["TinyCoCa"] = {  # full BPE vocab: main() rejects
        # tokenizers whose ids exceed the model vocab (NaN-gather guard)
        **SMALL_COCA, "text_cfg": {**SMALL_COCA["text_cfg"], "vocab_size": 49408}}

    logs = tmp_path / "logs"
    rc = train_main([
        "--dataset-type", "synthetic", "--train-num-samples", "8",
        "--batch-size", "1", "--epochs", "1", "--warmup", "1", "--workers", "2",
        "--model", "TinyCoCa", "--logs", str(logs), "--name", "coca-e2e",
        "--zeroshot-frequency", "0", "--precision", "fp32",
        "--coca-caption-loss-weight", "1.5", "--coca-contrastive-loss-weight", "0.5",
    ])
    assert rc == 0
    ckpt = logs / "coca-e2e" / "checkpoints" / "epoch_1.pt"
    assert ckpt.exists()
    # the produced checkpoint loads back through the CoCa factory
    from xclip_tpu.models.factory import create_coca_model

    F._MODEL_CONFIGS["TinyCoCa"] = {  # full BPE vocab: main() rejects
        # tokenizers whose ids exceed the model vocab (NaN-gather guard)
        **SMALL_COCA, "text_cfg": {**SMALL_COCA["text_cfg"], "vocab_size": 49408}}
    model2, params2 = create_coca_model("TinyCoCa", pretrained=str(ckpt))
    assert "text_decoder" in params2


def test_coca_step_grads():
    """make_train_step(coca=True): finite loss and nonzero decoder grads."""
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
    params = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.1)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32", coca=True))

    images, text = _inputs()
    n = jax.device_count()
    batch = shard_batch(mesh, {
        "images": np.tile(images, (n, 1, 1, 1)),
        "texts": np.tile(text.astype(np.int32), (n, 1)),
    })
    p0 = jax.tree_util.tree_map(np.asarray, params["text_decoder"])
    params2, _, opt_state, metrics = step(params, {}, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = [
        float(np.abs(np.asarray(a) - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(params2["text_decoder"]),
                        jax.tree_util.tree_leaves(p0))
    ]
    assert max(moved) > 0.0  # decoder actually updated (caption loss flows)

    # accum=2 reproduces the accum=1 loss on the same effective batch: the
    # reference concatenates cached full model_out per microbatch, so each
    # micro loss IS the full-batch loss (grads flow only through slice j)
    params2 = model.init(jax.random.PRNGKey(0))
    step2 = make_train_step(model, tx, mesh,
                            TrainStepCfg(precision="fp32", coca=True, accum_freq=2))
    batch2 = shard_batch(mesh, {
        "images": np.tile(images, (2 * n, 1, 1, 1)),
        "texts": np.tile(text.astype(np.int32), (2 * n, 1)),
    })
    _, _, _, m2 = step2(params2, {}, tx.init(params2), batch2)
    params3 = model.init(jax.random.PRNGKey(0))
    step3 = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32", coca=True))
    batch3 = shard_batch(mesh, {
        "images": np.tile(images, (2 * n, 1, 1, 1)),
        "texts": np.tile(text.astype(np.int32), (2 * n, 1)),
    })
    _, _, _, m3 = step3(params3, {}, tx.init(params3), batch3)
    np.testing.assert_allclose(float(m2["loss"]), float(m3["loss"]), rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_coca_export_bridge_roundtrip():
    """coca_params_to_state_dict is the exact inverse of the load bridge AND
    strict-loads into the reference torch CoCa."""
    from xclip_tpu.models.coca import coca_params_to_state_dict

    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch

    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
    params = model.init(jax.random.PRNGKey(3))
    sd = coca_params_to_state_dict(model, params)

    # inverse consistency: sd -> params is identical
    params2 = coca_state_dict_to_params(sd, model)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # torch strict-load into the reference CoCa
    ref = open_clip.CoCa(
        embed_dim=SMALL_COCA["embed_dim"],
        multimodal_cfg=SMALL_COCA["multimodal_cfg"],
        text_cfg=SMALL_COCA["text_cfg"],
        vision_cfg=SMALL_COCA["vision_cfg"],
    )
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, strict=False
    )
    missing = [k for k in missing if "attn_mask" not in k]
    assert not missing, missing
    assert not unexpected, unexpected


# ---------------------------------------------------------------------------
# coca_base-style (no attentional pool) and coca_roberta-style (HF text tower)


SMALL_COCA_BASE = {
    # tiny coca_base.json shape family: NO attentional pool — cls-tok pooling
    # with ln_post over the full sequence feeding the decoder
    # (model_configs/coca_base.json, transformer.py:636-639)
    "embed_dim": 64,
    "multimodal_cfg": {
        "width": 64, "context_length": 20, "vocab_size": 640, "mlp_ratio": 4,
        "layers": 2, "dim_head": 16, "heads": 4, "n_queries": 8,
        "attn_pooler_heads": 4,
    },
    "vision_cfg": {
        "image_size": 64, "layers": 2, "width": 64, "patch_size": 16,
        "head_width": 16, "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 20, "vocab_size": 640, "layers": 2, "heads": 4,
        "width": 64, "embed_cls": True, "output_tokens": True,
    },
    "custom_text": True,
}


def _base_inputs():
    rng = np.random.RandomState(0)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)
    text = rng.randint(1, 600, size=(2, 20)).astype(np.int64)
    text[:, 0] = 620
    return images, text


def test_coca_base_forward_shapes():
    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA_BASE))
    assert not model.cfg.vision.attentional_pool
    params = model.init(jax.random.PRNGKey(0))
    assert "attn_pool" not in params["visual"]
    images, text = _base_inputs()
    out = model.forward(params, images, text)
    assert out["image_features"].shape == (2, 64)
    assert out["logits"].shape == (2, 19, 640)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_coca_base_golden_parity():
    """coca_base family: reference CoCa without attentional pooling — the
    vision tokens bypass any pooler and ln_post covers the full sequence
    (transformer.py:636-639)."""
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch

    torch.manual_seed(0)
    ref = open_clip.CoCa(
        embed_dim=SMALL_COCA_BASE["embed_dim"],
        multimodal_cfg=SMALL_COCA_BASE["multimodal_cfg"],
        text_cfg=SMALL_COCA_BASE["text_cfg"],
        vision_cfg=SMALL_COCA_BASE["vision_cfg"],
    )
    ref.eval()
    with torch.no_grad():  # seed the reference's uninitialized projection
        proj = ref.text_decoder.text_projection
        proj.copy_(torch.from_numpy(
            np.random.RandomState(7).randn(*proj.shape).astype(np.float32) * 0.02
        ))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    assert not any("attn_pool" in k for k in sd)

    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA_BASE))
    params = coca_state_dict_to_params(sd, model)

    images, text = _base_inputs()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(images).permute(0, 3, 1, 2), torch.from_numpy(text))
    out = model.forward(params, images, text)
    np.testing.assert_allclose(
        np.asarray(out["image_features"]), ref_out["image_features"].numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["text_features"]), ref_out["text_features"].numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), atol=2e-3, rtol=1e-3
    )


TINY_ROBERTA = dict(
    model_type="roberta", vocab_size=120, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64, max_position_embeddings=40,
    type_vocab_size=1, layer_norm_eps=1e-5, pad_token_id=1, bos_token_id=0,
    eos_token_id=2,
)

# reference-facing text_cfg: valid CLIPTextCfg fields only
ROBERTA_TEXT_CFG = {
    "hf_model_name": "tiny-roberta-coca",
    "hf_proj_type": "linear",
    "hf_model_pretrained": False,
    "width": 32,
    "vocab_size": 640,
    "output_tokens": True,
}

SMALL_COCA_ROBERTA = {
    # tiny coca_roberta-ViT-B-32 shape family: HF text tower (mean pooler,
    # linear proj) + no-attn-pool vision + decoder over the vision-width
    # tokens (model_configs/coca_roberta-ViT-B-32.json, coca_model.py:96-121)
    "embed_dim": 24,
    "vision_cfg": {
        "image_size": 64, "layers": 2, "width": 32, "patch_size": 16,
        "head_width": 16, "output_tokens": True,
    },
    "text_cfg": dict(ROBERTA_TEXT_CFG, hf_model_config=TINY_ROBERTA),
    "multimodal_cfg": {
        "context_length": 20, "width": 32, "heads": 4, "layers": 2,
        "vocab_size": 640,
    },
    "custom_text": True,
}


def _roberta_inputs():
    rng = np.random.RandomState(1)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)
    text = rng.randint(3, 119, size=(2, 20)).astype(np.int64)
    text[0, 15:] = 1  # roberta pad id exercises the attention mask
    return images, text


def test_coca_roberta_forward_shapes():
    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA_ROBERTA))
    assert model.cfg.is_hf_text
    params = model.init(jax.random.PRNGKey(0))
    assert "hf" in params["text"]
    images, text = _roberta_inputs()
    out = model.forward(params, images, text)
    assert out["image_features"].shape == out["text_features"].shape == (2, 24)
    # decoder vocab comes from text_cfg.vocab_size (default 49408 in the
    # real coca_roberta config; 640 here), coca_model.py:105-121
    assert out["logits"].shape == (2, 19, 640)

    # contrastive+caption loss trains: grads reach the flax text params
    def loss_fn(p):
        o = model.forward(p, images, text)
        l, _ = coca_loss(o)
        return l

    g = jax.grad(loss_fn)(params)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g["text"]["hf"]))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_coca_roberta_golden_parity(tmp_path):
    """coca_roberta family: reference CoCa with an HFTextEncoder text tower
    (hf_model.py:155-169 token semantics, mean pooler, linear proj)."""
    from unittest import mock

    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch
    from transformers import AutoConfig

    tiny_cfg = AutoConfig.for_model(**TINY_ROBERTA)
    torch.manual_seed(0)
    # the reference resolves hf_model_name via the hub; serve the tiny config
    with mock.patch.object(AutoConfig, "from_pretrained", return_value=tiny_cfg):
        ref = open_clip.CoCa(
            embed_dim=SMALL_COCA_ROBERTA["embed_dim"],
            multimodal_cfg=SMALL_COCA_ROBERTA["multimodal_cfg"],
            text_cfg=ROBERTA_TEXT_CFG,
            vision_cfg=SMALL_COCA_ROBERTA["vision_cfg"],
        )
    ref.eval()
    with torch.no_grad():  # seed the reference's uninitialized projection
        proj = ref.text_decoder.text_projection
        proj.copy_(torch.from_numpy(
            np.random.RandomState(7).randn(*proj.shape).astype(np.float32) * 0.02
        ))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    assert any(k.startswith("text.transformer.") for k in sd)

    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA_ROBERTA))
    params = coca_state_dict_to_params(sd, model)

    images, text = _roberta_inputs()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(images).permute(0, 3, 1, 2), torch.from_numpy(text))
    out = model.forward(params, images, text)
    np.testing.assert_allclose(
        np.asarray(out["image_features"]), ref_out["image_features"].numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["text_features"]), ref_out["text_features"].numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), atol=2e-3, rtol=1e-3
    )


def test_coca_full_size_configs_build():
    """The shipped coca_base / coca_roberta-ViT-B-32 configs parse through
    the factory into the right architectures (no weights init needed)."""
    from xclip_tpu.models.factory import get_model_config, is_coca_model

    for name in ("coca_base", "coca_roberta-ViT-B-32"):
        assert is_coca_model(name)
    base = coca_cfg_from_dict(get_model_config("coca_base"))
    assert not base.vision.attentional_pool
    assert base.decoder_vocab_size == 64000 and base.vision.image_size == 288
    rob = coca_cfg_from_dict(get_model_config("coca_roberta-ViT-B-32"))
    assert rob.is_hf_text and rob.decoder_vocab_size == 49408
    assert rob.multimodal.width == 768 and not rob.vision.attentional_pool


def test_coca_pjit_step_matches_shard_map():
    """CoCa in the pjit global-math step (step_pjit) matches the shard_map
    CoCa step: same loss, same grads (SGD — see the pjit accum test for why
    not Adam). Unlocks --parallelism zero for CoCa models."""
    import optax

    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train.step import TrainStepCfg, make_train_step
    from xclip_tpu.train.step_pjit import make_train_step_pjit

    model = CoCaModel(coca_cfg_from_dict(SMALL_COCA))
    params = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optax.sgd(0.1)
    cfg = TrainStepCfg(precision="fp32", coca=True)

    images, text = _inputs()
    n = jax.device_count()
    host_batch = {
        "images": np.tile(images, (n, 1, 1, 1)).astype(np.float32),
        "texts": np.tile(text.astype(np.int32), (n, 1)),
    }

    ref_step = make_train_step(model, tx, mesh, cfg)
    p1, _, _, m1 = ref_step(
        jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params),
        {}, tx.init(params), shard_batch(mesh, host_batch))

    step = make_train_step_pjit(model, tx, mesh, cfg,
                                example_params=params, example_opt_state=tx.init(params))
    p2, _, _, m2 = step(params, {}, tx.init(params), host_batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)

    # CoCa + accum_freq>1 (cached full model_out per microbatch,
    # step_pjit.accum_grads CoCa branch) matches the shard_map CoCa accum.
    # params was donated to the pjit step above — re-init the same tree.
    params = model.init(jax.random.PRNGKey(0))
    cfg2 = TrainStepCfg(precision="fp32", coca=True, accum_freq=2)
    big_batch = {
        "images": np.tile(host_batch["images"], (2, 1, 1, 1)),
        "texts": np.tile(host_batch["texts"], (2, 1)),
    }
    ref2 = make_train_step(model, tx, mesh, cfg2)
    p3, _, _, m3 = ref2(
        jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params),
        {}, tx.init(params), shard_batch(mesh, dict(big_batch)))
    step2 = make_train_step_pjit(model, tx, mesh, cfg2,
                                 example_params=params, example_opt_state=tx.init(params))
    p4, _, _, m4 = step2(params, {}, tx.init(params), big_batch)
    np.testing.assert_allclose(float(m4["loss"]), float(m3["loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p3), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
