"""Native C++ kernel tests (gated on toolchain availability)."""

import numpy as np
import pytest

from trie_semantic_search_tpu import native
from trie_semantic_search_tpu.text.processor import count_syllables as py_syllables

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_tokenize_spans_matches_regex():
    import re

    text = "The court's holding, in 347 U.S. 483 (1954), was unanimous!"
    spans = native.tokenize_spans(text)
    expected = [(m.start(), m.end()) for m in re.finditer(r"\b\w+\b", text)]
    assert [tuple(s) for s in spans.tolist()] == expected


def test_tokenize_spans_unicode():
    text = "café naïve"
    spans = native.tokenize_spans(text)
    raw = text.encode("utf-8")
    words = [raw[s:e].decode("utf-8") for s, e in spans.tolist()]
    assert words == ["café", "naïve"]


def test_count_syllables_matches_python():
    for w in ("cat", "table", "constitution", "b", "jurisprudence", "eye"):
        assert native.count_syllables(w) == py_syllables(w)


def test_native_wordpiece_matches_python():
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )

    corpus = [
        "the supreme court held that due process requires notice",
        "the defendant filed a motion to suppress the evidence",
    ] * 3
    vocab = train_wordpiece_vocab(corpus, vocab_size=512, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    nwp = native.NativeWordPiece(vocab, unk_id=tok.unk_id)
    for word in ("the", "supreme", "court", "defendant", "suppress", "zzz"):
        py = tok.wordpiece(word)
        py_ids = None if py == ["[UNK]"] else [vocab[p] for p in py]
        assert nwp.encode_word(word) == py_ids, word


def test_native_wordpiece_full_text():
    vocab = {"[UNK]": 0, "court": 1, "##s": 2, "held": 3}
    nwp = native.NativeWordPiece(vocab, unk_id=0)
    ids = nwp.encode_text("Courts held xyz")
    assert ids.tolist() == [1, 2, 3, 0]
