"""Text processor tests — behavioural parity with
``/root/reference/src/text_processing.rs``."""

import pytest

from trie_semantic_search_tpu.core.config import TextProcessingConfig
from trie_semantic_search_tpu.text import (
    CitationType,
    EntityType,
    LegalTermCategory,
    TextProcessor,
    TokenType,
    count_syllables,
)


@pytest.fixture(scope="module")
def tp():
    return TextProcessor(TextProcessingConfig())


MIRANDA = (
    "In Miranda v. Arizona, 384 U.S. 436 (1966), the Supreme Court held that "
    "the prosecution may not use statements stemming from custodial "
    "interrogation of the defendant unless it demonstrates the use of "
    "procedural safeguards effective to secure the privilege against "
    "self-incrimination. Chief Justice Warren delivered the opinion. "
    "See also 86 S. Ct. 1602 (1966)."
)


def test_normalize_whitespace_and_quotes(tp):
    out = tp.normalize_text("  hello“world”   and ‘more’  ")
    assert out == 'hello"world" and \'more\''


def test_normalize_strips_control_chars(tp):
    assert tp.normalize_text("a\x00b\x07c") == "abc"


def test_normalize_nfc(tp):
    # e + combining acute → é (NFC)
    assert tp.normalize_text("café") == "café"


def test_tokenize_types(tp):
    toks = tp.tokenize("The motion was filed in 1954 by Warren")
    by_text = {t.text: t for t in toks}
    assert by_text["motion"].token_type == TokenType.LEGAL_TERM
    assert by_text["1954"].token_type == TokenType.NUMBER
    assert by_text["Warren"].token_type == TokenType.PROPER_NOUN
    assert by_text["filed"].token_type == TokenType.WORD
    assert by_text["The"].is_stopword  # "the" is a stopword
    assert not by_text["motion"].is_stopword
    # positions index into the input
    assert toks[0].position == 0


def test_sentences_split(tp):
    s = tp.extract_sentences(
        "This is sentence number one. This is sentence number two! Is this three?"
    )
    assert len(s) == 3
    assert s[0] == "This is sentence number one"


def test_citation_extraction_us(tp):
    cites = tp.extract_citations(MIRANDA)
    normalized = [c.normalized for c in cites]
    assert any("384 U.S. 436" in n for n in normalized)
    us = next(c for c in cites if c.reporter == "U.S.")
    assert us.volume == "384"
    assert us.page == "436"
    assert us.year == 1966
    assert us.citation_type == CitationType.CASE
    sct = next(c for c in cites if "Ct" in (c.reporter or ""))
    assert sct.volume == "86" and sct.page == "1602"


def test_citation_federal_reporter(tp):
    cites = tp.extract_citations("As held in 123 F.2d 456 (9th Cir. 1987).")
    assert cites
    c = cites[0]
    assert c.volume == "123" and c.page == "456" and c.year == 1987
    assert "F." in c.reporter


def test_citation_dedup_and_order(tp):
    text = "See 347 U.S. 483 (1954). Again: 347 U.S. 483 (1954). Then 384 U.S. 436 (1966)."
    cites = tp.extract_citations(text)
    norms = [c.normalized for c in cites]
    assert len(norms) == len(set(norms))
    positions = [c.position for c in cites]
    assert positions == sorted(positions)


def test_citation_classification(tp):
    assert tp.classify_citation("42 U.S.C. 1983") == CitationType.STATUTE
    assert tp.classify_citation("29 C.F.R. 1604") == CitationType.REGULATION
    assert tp.classify_citation("U.S. Const. amend. XIV") == CitationType.CONSTITUTIONAL
    assert tp.classify_citation("347 U.S. 483") == CitationType.CASE


def test_legal_terms_with_categories(tp):
    result = tp.process_text(
        "The defendant filed a motion claiming the contract breach caused damages, "
        "and raised a due process objection."
    )
    terms = {t.term.lower(): t.category for t in result.legal_terms}
    assert terms.get("motion") == LegalTermCategory.PROCEDURE
    assert terms.get("contract") == LegalTermCategory.CONTRACT
    assert terms.get("objection") == LegalTermCategory.EVIDENCE
    assert terms.get("due process") == LegalTermCategory.CONSTITUTIONAL  # bigram


def test_entities(tp):
    result = tp.process_text(MIRANDA)
    types = {e.entity_type for e in result.entities}
    assert EntityType.JUDGE in types  # "Chief Justice Warren" via justice pattern
    assert EntityType.COURT in types  # "Supreme Court"
    assert EntityType.DATE in types  # "1966"
    judges = [e.text for e in result.entities if e.entity_type == EntityType.JUDGE]
    assert any("Warren" in j for j in judges)


def test_stats(tp):
    r = tp.process_text("The quick brown fox jumps. The lazy dog sleeps.")
    assert r.stats.word_count == 9
    assert r.stats.sentence_count == 2
    assert r.stats.unique_words == 8  # 'the' appears twice (case-folded)
    assert r.stats.language == "en"
    assert r.stats.reading_level is not None


def test_count_syllables():
    assert count_syllables("cat") == 1
    assert count_syllables("table") == 1  # silent-e rule (matches ref algorithm)
    assert count_syllables("constitution") == 4
    assert count_syllables("b") == 1  # at least one


def test_key_phrases(tp):
    toks = tp.tokenize("the equal protection clause of the fourteenth amendment")
    phrases = tp.extract_key_phrases(toks, 5)
    assert "equal protection clause" in phrases
    assert "fourteenth amendment" in phrases


def test_full_pipeline_shapes(tp):
    r = tp.process_text(MIRANDA)
    assert r.original == MIRANDA
    assert r.tokens and r.sentences and r.citations and r.entities
    assert r.stats.char_count == len(r.normalized)


def test_config_flags_disable_stages():
    cfg = TextProcessingConfig(extract_citations=False, extract_entities=False)
    r = TextProcessor(cfg).process_text(MIRANDA)
    assert r.citations == [] and r.entities == []
