"""Hybrid engine end-to-end tests over a small real corpus: storage →
build_indexes → SearchEngine, with reference-parity semantics."""

import datetime as dt

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.errors import InvalidSearchQuery
from trie_semantic_search_tpu.core.types import CaseMetadata, SearchConfig, new_case_id
from trie_semantic_search_tpu.index.builder import (
    build_indexes,
    load_artifacts,
    save_artifacts,
)
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.search.engine import (
    MatchType,
    SearchEngine,
    SearchQuery,
)
from trie_semantic_search_tpu.search.snippets import generate_snippet
from trie_semantic_search_tpu.storage.store import StorageManager

CASES = [
    (
        "Brown v. Board of Education",
        "347 U.S. 483 (1954)",
        "Supreme Court of the United States",
        dt.date(1954, 5, 17),
        "We conclude that in the field of public education the doctrine of "
        "separate but equal has no place. Separate educational facilities "
        "are inherently unequal. This case concerns racial segregation in "
        "public schools and the equal protection clause.",
    ),
    (
        "Miranda v. Arizona",
        "384 U.S. 436 (1966)",
        "Supreme Court of the United States",
        dt.date(1966, 6, 13),
        "The person in custody must, prior to interrogation, be clearly "
        "informed that he has the right to remain silent. The privilege "
        "against self-incrimination is protected by procedural safeguards "
        "during custodial interrogation by police officers.",
    ),
    (
        "Gideon v. Wainwright",
        "372 U.S. 335 (1963)",
        "Supreme Court of the United States",
        dt.date(1963, 3, 18),
        "The right of an indigent defendant in a criminal trial to have the "
        "assistance of counsel is a fundamental right essential to a fair "
        "trial. Lawyers in criminal courts are necessities, not luxuries.",
    ),
    (
        "Katz v. United States",
        "389 U.S. 347 (1967)",
        "Supreme Court of the United States",
        dt.date(1967, 12, 18),
        "The Fourth Amendment protects people, not places. What a person "
        "knowingly exposes to the public is not a subject of Fourth "
        "Amendment protection, but what he seeks to preserve as private "
        "may be constitutionally protected from search and seizure.",
    ),
    (
        "Smith v. Jones Lumber Co.",
        "12 Cal. 3d 456 (Cal. 1974)",
        "Supreme Court of California",
        dt.date(1974, 2, 1),
        "The defendant lumber company breached its contract to deliver "
        "timber. The plaintiff is entitled to damages for breach of "
        "contract measured by the difference in market price.",
    ),
]

TINY_MODEL = MiniLMConfig(
    vocab_size=8192, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position=64,
)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine")
    cfg = Config()
    cfg.storage.db_path = str(tmp / "db.sqlite")
    cfg.trie.index_path = str(tmp / "trie")
    cfg.vector.hnsw.index_path = str(tmp / "vec")
    cfg.vector.hnsw.num_partitions = 8
    cfg.vector.hnsw.num_probes = 8
    cfg.vector.dimension = 64
    storage = StorageManager(cfg.storage)
    for name, cit, court, date, text in CASES:
        meta = CaseMetadata(
            id=new_case_id(), name=name, citation=cit, court=court,
            decision_date=date, word_count=len(text.split()),
        )
        storage.store_case_metadata(meta)
        storage.store_case_text(meta.id, text)

    vocab = train_wordpiece_vocab([c[4] for c in CASES], vocab_size=8192, min_frequency=1)
    embedder = Embedder(cfg.vector.model, tokenizer=WordPieceTokenizer(vocab),
                        model_config=TINY_MODEL)
    built = build_indexes(storage, cfg, embedder=embedder)
    eng = SearchEngine(cfg, storage, built.trie, built.vector, built.columns)
    eng._built = built  # stash for artifact tests
    eng._embedder = embedder
    return eng


def test_case_name_exact_match(engine):
    results = engine.search("brown v. board of education")
    assert results
    assert results[0].case_metadata.name == "Brown v. Board of Education"
    assert results[0].match_type == MatchType.CASE_NAME
    assert results[0].score == 2.0  # exact_match_weight


def test_citation_match(engine):
    results = engine.search("384 U.S. 436 (1966)")
    assert results and results[0].case_metadata.name == "Miranda v. Arizona"
    assert results[0].match_type == MatchType.CITATION


def test_content_phrase_match(engine):
    results = engine.search("right to remain silent")
    assert results
    assert results[0].case_metadata.name == "Miranda v. Arizona"


def test_semantic_only_match(engine):
    """Self-retrieval through the semantic path with lexical disabled."""
    q = SearchQuery(
        query="separate educational facilities are inherently unequal",
        config=SearchConfig(enable_prefix=False, min_similarity=0.5),
    )
    results = engine.search_with_params(q)
    assert results
    assert results[0].case_metadata.name == "Brown v. Board of Education"
    assert results[0].match_type == MatchType.SEMANTIC


def test_dedup_by_case(engine):
    """A case hit by both trie and vector appears once."""
    results = engine.search("right to remain silent")
    names = [r.case_metadata.name for r in results]
    assert len(names) == len(set(names))


def test_court_filter(engine):
    q = SearchQuery(
        query="contract breach damages",
        court_filter=["Supreme Court of California"],
        config=SearchConfig(min_similarity=0.0),
    )
    results = engine.search_with_params(q)
    assert results
    assert all(
        r.case_metadata.court == "Supreme Court of California" for r in results
    )


def test_court_filter_excludes_all(engine):
    q = SearchQuery(query="brown v. board of education",
                    court_filter=["No Such Court"])
    assert engine.search_with_params(q) == []


def test_date_filter(engine):
    q = SearchQuery(
        query="fourth amendment search and seizure",
        date_range=(dt.date(1967, 1, 1), dt.date(1968, 1, 1)),
        config=SearchConfig(min_similarity=0.0),
    )
    results = engine.search_with_params(q)
    assert results
    assert all(
        dt.date(1967, 1, 1) <= r.case_metadata.decision_date <= dt.date(1968, 1, 1)
        for r in results
    )


def test_max_results_truncation(engine):
    q = SearchQuery(query="the court", max_results=2,
                    config=SearchConfig(min_similarity=0.0))
    assert len(engine.search_with_params(q)) <= 2


def test_validation(engine):
    with pytest.raises(InvalidSearchQuery):
        engine.search("a")
    with pytest.raises(InvalidSearchQuery):
        engine.search("x" * 2000)


def test_query_cache_hit(engine):
    engine.query_cache.clear()
    r1 = engine.search("right to remain silent")
    before = engine.query_cache.get_stats().hits
    r2 = engine.search("right to remain silent")
    assert engine.query_cache.get_stats().hits == before + 1
    assert [r.case_metadata.id for r in r1] == [r.case_metadata.id for r in r2]


def test_snippet_and_highlights(engine):
    engine.query_cache.clear()
    results = engine.search("right to remain silent")
    top = results[0]
    assert "remain silent" in top.snippet.lower()
    assert top.highlights
    h = top.highlights[0]
    assert top.snippet[h.start : h.end].lower() in ("right", "to", "remain", "silent")


def test_batch_matches_single(engine):
    engine.query_cache.clear()
    qs = [SearchQuery(query="right to remain silent"),
          SearchQuery(query="brown v. board of education")]
    batch = engine.search_batch(qs)
    singles = [engine.search_with_params(q) for q in qs]
    for b, s in zip(batch, singles):
        assert [r.case_metadata.id for r in b] == [r.case_metadata.id for r in s]


def test_deterministic_results(engine):
    engine.query_cache.clear()
    a = engine.search("fourth amendment")
    engine.query_cache.clear()
    b = engine.search("fourth amendment")
    assert [r.case_metadata.id for r in a] == [r.case_metadata.id for r in b]


def test_stats_and_health(engine):
    engine.health_check()
    st = engine.get_stats()
    assert st.total_cases_indexed == len(CASES)
    assert st.trie_stats["name"]["postings"] >= len(CASES)
    assert st.queries_served > 0


def test_flat_escalate_config_plumbs_to_fused(engine):
    """The engine passes search.fused_flat_escalate{,_eps} through to the
    fused step, and the escalation counter surfaces in get_stats()
    (mechanism tests: tests/test_flat_escalate.py)."""
    cfg = engine.config.search
    old_flag, old_eps, old_fused = (
        cfg.fused_flat_escalate, cfg.fused_flat_escalate_eps, engine._fused
    )
    try:
        cfg.fused_flat_escalate, cfg.fused_flat_escalate_eps = True, 0.05
        engine._fused = None
        fused = engine._get_fused()
        assert fused.flat_escalate_eps == 0.05
        fused.escalated = 7
        assert engine.get_stats().escalated_queries == 7
        cfg.fused_flat_escalate = False
        engine._fused = None
        assert engine._get_fused().flat_escalate_eps == 0.0
    finally:
        cfg.fused_flat_escalate = old_flag
        cfg.fused_flat_escalate_eps = old_eps
        engine._fused = old_fused


def test_artifact_save_load_roundtrip(engine):
    cfg = engine.config
    save_artifacts(engine._built, cfg)
    loaded = load_artifacts(cfg, embedder=engine._embedder)
    assert loaded is not None
    trie, vector, columns = loaded
    eng2 = SearchEngine(cfg, engine.storage, trie, vector, columns)
    results = eng2.search("miranda v. arizona")
    assert results and results[0].case_metadata.name == "Miranda v. Arizona"


def test_swap_indexes_clears_cache(engine):
    engine.search("right to remain silent")
    engine.swap_indexes(trie_index=engine.trie_index)
    assert engine.query_cache.get_stats().size == 0


# ---------------------------------------------------------------------------
# snippet unit tests
# ---------------------------------------------------------------------------


def test_generate_snippet_anchor_and_window():
    text = "alpha " * 100 + "the needle phrase here " + "omega " * 100
    snippet, highlights = generate_snippet(text, "needle phrase")
    assert "needle phrase" in snippet
    assert snippet.startswith("...") and snippet.endswith("...")
    assert highlights
    for h in highlights:
        assert snippet[h.start : h.end].lower() in ("needle", "phrase")


def test_generate_snippet_fallback():
    text = "word " * 100
    snippet, highlights = generate_snippet(text, "absent terms")
    assert snippet.endswith("...")
    assert highlights == []
    assert len(snippet) <= 244


def test_generate_snippet_empty():
    assert generate_snippet("", "q") == ("", [])


def test_snippet_chunk_anchor():
    """Semantic-only hit with no term overlap anchors at the hit chunk."""
    text = ("First sentence about nothing relevant. " * 3
            + "Target sentence with the matched content here. "
            + "Trailing sentence after the target. " * 3)
    snippet, highlights = generate_snippet(
        text, "completely unrelated words",
        chunk_text="Target sentence with the matched content here",
    )
    assert snippet.startswith("...")
    assert "Target sentence" in snippet
    assert highlights == []
    # whitespace-tolerant anchoring (stored text has original whitespace)
    text2 = text.replace("Target sentence with", "Target  sentence\n with")
    snippet2, _ = generate_snippet(
        text2, "unrelated",
        chunk_text="Target sentence with the matched content here",
    )
    assert "matched content" in snippet2
    # chunk absent falls back to leading window
    snippet3, _ = generate_snippet(text, "unrelated", chunk_text="zzz not there")
    assert snippet3.startswith("First sentence")


def test_artifact_load_restores_encoder(engine, tmp_path, monkeypatch):
    """Loading artifacts without injecting an embedder must restore the
    build-time encoder (vocab + params) — a fresh random encoder would
    silently break semantic scoring (found running the serve CLI against
    saved artifacts)."""
    cfg = engine.config
    save_artifacts(engine._built, cfg)
    loaded = load_artifacts(cfg)  # no embedder injected
    assert loaded is not None
    _, vector, _ = loaded
    a = vector.embedder.embed_one("right to remain silent")
    b = engine._embedder.embed_one("right to remain silent")
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_load_artifacts_missing_encoder_checkpoint_fails_loudly(engine, tmp_path):
    """Review regression: tokenizer present + missing encoder checkpoint
    must raise, not silently serve random-encoder scores."""
    import shutil

    from trie_semantic_search_tpu.core.errors import IndexCorrupted

    cfg = engine.config
    save_artifacts(engine._built, cfg)
    from pathlib import Path

    shutil.rmtree(Path(cfg.vector.hnsw.index_path) / "encoder")
    with pytest.raises(IndexCorrupted):
        load_artifacts(cfg)


def test_batch_path_uses_query_cache(engine):
    """Round-1 VERDICT item 5: the batched (HTTP) path consults the query
    cache — repeat queries never re-enter the device program."""
    engine.query_cache.clear()
    qs = [SearchQuery(query="right to remain silent"),
          SearchQuery(query="equal protection of the laws")]
    first = engine.search_batch(qs)

    calls = []
    orig = engine._execute_batch
    engine._execute_batch = lambda queries: calls.append(len(queries)) or orig(queries)
    try:
        second = engine.search_batch(qs)
        assert calls == []  # all hits: device path never invoked
        # a mixed batch only executes the misses
        mixed = [SearchQuery(query="right to remain silent"),
                 SearchQuery(query="a brand new never seen query")]
        engine.search_batch(mixed)
        assert calls == [1]
    finally:
        engine._execute_batch = orig
    for a, b in zip(first, second):
        assert [r.case_metadata.id for r in a] == [r.case_metadata.id for r in b]


def test_evaluate_engine_runs_through_full_engine(engine):
    """models/quality.evaluate_engine must drive the REAL engine (it
    builds engine-shaped SearchQuery objects): rank metrics come back for
    each probe kind and a probe built from a case's own sentence finds
    that case. Guards the eval harness the retrieval-quality record
    (bench_results/retrieval_r03.json) is produced with."""
    from trie_semantic_search_tpu.models.quality import (
        build_probes,
        evaluate_engine,
    )

    tp = engine._text_processor
    docs = []
    for row, (_n, _c, _co, _d, text) in enumerate(CASES):
        docs.append((row, tp.extract_sentences(tp.normalize_text(text))))
    probes = build_probes(docs, max_probes=8)
    assert probes
    out = evaluate_engine(engine, engine.columns, probes, k=5)
    assert "all" in out
    assert out["all"]["n"] == len(probes)
    assert 0.0 <= out["all"]["mrr"] <= 1.0
    # the corpus is 5 tiny well-separated cases: half-sentence probes
    # must rank their source case near the top
    assert out["all"]["recall_at_5"] >= 0.5
