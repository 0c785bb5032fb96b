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
