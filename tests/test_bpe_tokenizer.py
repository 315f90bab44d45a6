"""BPE tokenizer path with a synthetic merges file (the real CLIP vocab is
not in this image; this exercises the byte-encoder, merge loop, and
framing with a controlled vocabulary)."""

import gzip
import os
import tempfile

import numpy as np

from procedurevrl_tpu.datasets.tokenizer import (
    BPETokenizer, build_tokenizer, bytes_to_unicode, tokenize,
)


def _write_merges(pairs):
    f = tempfile.mktemp(suffix=".txt.gz")
    lines = ["#version: 0.2"] + [" ".join(p) for p in pairs]
    # pad to the expected merge-table length (unused rows are harmless
    # distinct token pairs)
    filler_needed = 49152 - 256 - 2 - len(pairs)
    fillers = []
    alphabet = [chr(c) for c in range(ord("α"), ord("α") + 80)]
    i = 0
    while len(fillers) < filler_needed:
        a = alphabet[i % len(alphabet)] * (1 + i // len(alphabet) % 3 + 1)
        b = alphabet[(i * 7 + 3) % len(alphabet)] + str(i)
        fillers.append(f"{a} {b}")
        i += 1
    with gzip.open(f, "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines + fillers) + "\n")
    return f


def test_bpe_merges_and_framing():
    # merges that build "hello</w>" from bytes
    pairs = [
        ("h", "e"),
        ("l", "l"),
        ("he", "ll"),
        ("o", "</w>"),
        ("hell", "o</w>"),
    ]
    path = _write_merges(pairs)
    try:
        tok = BPETokenizer(path)
        ids = tok.encode("hello hello")
        # both words fully merged to the single "hello</w>" token
        assert len(ids) == 2 and ids[0] == ids[1]
        hello_id = tok.encoder["hello</w>"]
        assert ids[0] == hello_id

        # a word with no applicable merges falls back to byte tokens + </w>
        ids2 = tok.encode("xyz")
        assert len(ids2) == 3  # x, y, z</w>

        # tokenize() framing
        arr = tokenize(tok, ["hello"], context_length=8)
        assert arr.shape == (1, 8)
        assert arr[0, 0] == 49406 and arr[0, 2] == 49407
        assert arr[0, 1] == hello_id

        # build_tokenizer dispatches on path existence
        assert isinstance(build_tokenizer(path), BPETokenizer)
    finally:
        os.unlink(path)


def test_byte_encoder_reversible():
    enc = bytes_to_unicode()
    assert len(enc) == 256
    assert len(set(enc.values())) == 256
