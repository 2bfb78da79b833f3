"""CLIP BPE tokenizer tests (vocab file loaded from the read-only reference
checkout at runtime; gated if absent)."""

import os

import numpy as np
import pytest

from hedit_tpu.models.tokenizer import CLIPTokenizer, find_vocab_file


def _tok():
    try:
        return CLIPTokenizer()
    except FileNotFoundError:
        pytest.skip("BPE vocab file not available")


def test_known_ids():
    tok = _tok()
    # canonical CLIP encodings (well-known ids from the standard 49408 vocab)
    assert tok.sot_id == 49406 and tok.eot_id == 49407
    ids = tok.encode("a photo of a cat")
    assert ids == [320, 1125, 539, 320, 2368]


def test_padding_contract():
    tok = _tok()
    batch = tok(["a photo of a cat", ""])
    assert batch.shape == (2, 77)
    assert batch[0, 0] == 49406 and batch[0, 6] == 49407
    assert (batch[0, 7:] == 49407).all()  # EOT padding
    assert batch[1, 0] == 49406 and batch[1, 1] == 49407


def test_roundtrip_decode():
    tok = _tok()
    text = "a watercolor painting of a squirrel eating a burger"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_truncation():
    tok = _tok()
    long = "word " * 200
    batch = tok(long)
    assert batch.shape == (1, 77)
    assert batch[0, -1] == 49407


def test_case_and_whitespace_normalization():
    tok = _tok()
    assert tok.encode("A  Photo   OF a CAT") == tok.encode("a photo of a cat")
