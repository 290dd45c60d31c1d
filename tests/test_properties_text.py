"""Property-based invariants (hypothesis) for the round-3 text kernels:
Porter stemmer, BPE segmentation, OCR normalization, text_en analyzer.
These complement the pinned fixtures: fixtures nail exact values on
known words; properties nail structural laws on arbitrary input."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.textproc import (
    bpe_segments,
    bpe_token_count,
    ocr_normalize,
    porter_stem,
    text_en_tokens,
)

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=20)
texts = st.text(max_size=300)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(words)
def test_porter_never_grows_and_never_empties(w):
    s = porter_stem(w)
    assert len(s) <= len(w)
    assert (s == "") == (w == "")
    assert s.isascii()


@settings(max_examples=300, deadline=None, derandomize=True)
@given(words)
def test_bpe_segments_reassemble_to_word(w):
    segs = bpe_segments(w)
    assert "".join(segs).replace("</w>", "") == w
    if w:
        assert 1 <= len(segs) <= len(w) + 1
        assert bpe_token_count(w) == len(segs)
    else:
        assert segs == []


@settings(max_examples=300, deadline=None, derandomize=True)
@given(texts)
def test_ocr_normalize_idempotent_and_single_line(t):
    once = ocr_normalize(t)
    assert ocr_normalize(once) == once
    assert "\n" not in once and "\t" not in once
    assert once == once.strip()
    assert "  " not in once


@settings(max_examples=300, deadline=None, derandomize=True)
@given(texts)
def test_text_en_tokens_are_stemmed_alnum(t):
    toks = text_en_tokens(t)
    for tok in toks:
        assert re.fullmatch(r"[a-z0-9]+", tok), tok
        # analyzing an already-analyzed token is stable (each output
        # token is a fixpoint of the analyzer)
        assert text_en_tokens(tok) == [tok]
