import os

import numpy as np
import pytest

from xclip_tpu.tokenizer import SimpleTokenizer, tokenize

HAS_REFERENCE = os.path.exists("/root/reference")

TEXTS = [
    "a photo of a cat.",
    "hello world",
    "A CLIPART of the Aircraft-Carrier!",
    "çafé über naïve",
    "x" * 500,
    "",
    "a quickdraw of a The Great Wall of China.",
    "don't stop; it's 99.9% fine &amp; dandy",
    "An    oddly \t spaced\n sentence",
]


def test_shapes_and_special_tokens():
    tok = SimpleTokenizer()
    out = tok(TEXTS)
    assert out.shape == (len(TEXTS), 77)
    assert out.dtype == np.int32
    # every row starts with SOT and contains EOT
    assert (out[:, 0] == tok.sot_token_id).all()
    for row in out:
        assert tok.eot_token_id in row


def test_truncation_keeps_eot_last():
    tok = SimpleTokenizer()
    out = tok(["word " * 200])
    assert out[0, -1] == tok.eot_token_id


def test_roundtrip_decode():
    tok = SimpleTokenizer()
    ids = tok.encode("a photo of a dog")
    assert tok.decode(ids).strip() == "a photo of a dog"


def test_context_length_override():
    out = tokenize(["hello"], context_length=32)
    assert out.shape == (1, 32)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_golden_parity_with_reference():
    from ref_compat import import_reference_module

    ref = import_reference_module(
        "ref_tokenizer", "/root/reference/deps/open_clip/src/open_clip/tokenizer.py"
    )
    expected = ref.tokenize(TEXTS).numpy()
    got = tokenize(TEXTS)
    assert np.array_equal(expected, got.astype(np.int64))


class TestMaskTokenize:
    """Masking tokenize variants (reference open_clip/tokenizer.py:280-401):
    over-length captions reduce by sampling instead of truncation."""

    LONG = " ".join(["word"] * 200)

    def test_random_mask_shapes_and_short_passthrough(self):
        from xclip_tpu.tokenizer import random_mask_tokenize, tokenize

        rng = np.random.RandomState(0)
        out = random_mask_tokenize([self.LONG, "a cat"], context_length=16, rng=rng)
        assert out.shape == (2, 16)
        tok = SimpleTokenizer()
        # over-length row: sot first, eot at position num_keep+1, fully packed
        assert out[0, 0] == tok.sot_token_id and out[0, 15] == tok.eot_token_id
        assert (out[0, 1:15] != 0).all()
        # short row matches plain tokenize
        np.testing.assert_array_equal(out[1], tokenize("a cat", context_length=16)[0])

    def test_simple_mask_contiguous_window(self):
        from xclip_tpu.tokenizer import simple_mask_tokenize

        tok = SimpleTokenizer()
        text = " ".join(f"w{i}" for i in range(60))
        full = tok.encode(text)
        rng = np.random.RandomState(1)
        out = simple_mask_tokenize([text], context_length=12, rng=rng)[0]
        inner = [int(t) for t in out[1:11]]
        # the kept tokens are a contiguous slice of the full encoding
        joined = ",".join(map(str, full))
        assert ",".join(map(str, inner)) in joined
        assert out[0] == tok.sot_token_id and out[11] == tok.eot_token_id

    def test_syntax_mask_gated(self):
        from xclip_tpu.tokenizer import syntax_mask_tokenize

        try:
            import nltk  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="nltk"):
                syntax_mask_tokenize("a cat", context_length=8)

    def test_syntax_mask_with_stub_tagger(self):
        """Selection logic pinned with an injected POS tagger (reference
        tokenizer.py:349-371): nouns beat adjectives beat verbs beat the
        rest, kept words stay in original sentence order, overflow is
        truncated with a forced EOT."""
        from xclip_tpu.tokenizer import syntax_mask_tokenize

        tok = SimpleTokenizer()
        TAGS = {"cat": "NN", "dog": "NNS", "red": "JJ", "runs": "VB",
                "the": "DT", "quickly": "RB"}

        def pos_tag(words):
            return [(w, TAGS.get(w, "DT")) for w in words]

        # 6 words, room for 3: the two nouns + the adjective survive, in
        # original order ("red" precedes "dog" in the sentence)
        text = "the cat red dog runs quickly"
        out = syntax_mask_tokenize(
            [text], context_length=5, tokenizer=tok,
            word_tokenize=str.split, pos_tag=pos_tag,
        )[0]
        expected = tok.encode("cat red dog")
        assert [int(t) for t in out[1:4]] == list(expected)
        assert out[0] == tok.sot_token_id and out[4] == tok.eot_token_id

        # words that explode into multiple BPE tokens: truncate + forced EOT
        text2 = "extraordinarily cat phantasmagorical"
        out2 = syntax_mask_tokenize(
            [text2], context_length=4, tokenizer=tok,
            word_tokenize=str.split, pos_tag=lambda ws: [(w, "NN") for w in ws],
        )[0]
        assert out2[0] == tok.sot_token_id
        assert out2[-1] == tok.eot_token_id
        assert all(t != 0 for t in out2)


class TestSigLipTokenizer:
    def _tiny_t5_dir(self, tmp_path):
        """Build a tiny T5-style fast tokenizer offline (Unigram via the
        tokenizers lib; sentencepiece itself is absent from this image)."""
        from tokenizers import Tokenizer, decoders, pre_tokenizers
        from tokenizers.models import Unigram
        from transformers import T5TokenizerFast

        vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -2.0),
                 ("▁a", -1.0), ("▁photo", -1.0), ("▁of", -1.0),
                 ("▁cat", -1.0), ("▁dog", -1.5), ("a", -3.0),
                 ("t", -3.0), ("o", -3.0), ("c", -3.0), ("d", -3.0),
                 ("g", -3.0), ("▁", -3.5), ("h", -3.0), ("p", -3.0),
                 ("f", -3.0), ("e", -3.0), ("i", -3.0), ("n", -3.0)]
        tok = Tokenizer(Unigram(vocab, unk_id=2))
        tok.pre_tokenizer = pre_tokenizers.Metaspace()
        tok.decoder = decoders.Metaspace()
        fast = T5TokenizerFast(tokenizer_object=tok,
                               unk_token="<unk>", eos_token="</s>", pad_token="<pad>")
        d = tmp_path / "t5tok"
        fast.save_pretrained(d)
        return str(d)

    def test_siglip_tokenizer(self, tmp_path):
        """Reference SigLipTokenizer semantics (tokenizer.py:463-520):
        canonicalize cleaning (lowercase, punctuation stripped), pad/eos
        forced to id 1, max_length padding, int32 output."""
        from xclip_tpu.tokenizer import SigLipTokenizer

        tok = SigLipTokenizer(self._tiny_t5_dir(tmp_path), context_length=16)
        assert tok.tokenizer.pad_token_id == 1 and tok.tokenizer.eos_token_id == 1
        out = tok(["A Photo, of a CAT!", "a photo of a cat"])
        assert out.shape == (2, 16) and out.dtype == np.int32
        # canonicalize makes the two rows identical
        np.testing.assert_array_equal(out[0], out[1])

        # single-string input and per-call context_length override
        one = tok("a photo of a dog", context_length=8)
        assert one.shape == (1, 8)

    def test_siglip_tokenizer_offline_error(self, monkeypatch):
        from xclip_tpu.tokenizer import SigLipTokenizer

        # fail fast instead of sitting through the hub's connect retries
        # (this box has zero egress; without these the test takes ~3 min).
        # The env vars are read at import time, so patch the cached
        # module-level constants directly.
        import huggingface_hub.constants as hub_constants
        import transformers.utils.hub as hf_hub

        monkeypatch.setattr(hub_constants, "HF_HUB_OFFLINE", True)
        monkeypatch.setattr(hf_hub, "_is_offline_mode", True)
        with pytest.raises(RuntimeError, match="zero-egress"):
            SigLipTokenizer("some-hub-name-that-does-not-exist")
