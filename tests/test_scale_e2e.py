"""Moderate-scale end-to-end: 300 synthetic cases through ingest → build →
hybrid queries. Exercises realistic index shapes (multi-thousand-node
content trie, >1k vector chunks) that the small fixtures never reach."""

import asyncio
import datetime as dt

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.builder import build_indexes
from trie_semantic_search_tpu.ingest.pipeline import IngestionPipeline
from trie_semantic_search_tpu.ingest.sources import MockDataSource
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.search.engine import SearchEngine, SearchQuery

N_CASES = 300

TOPICS = [
    "due process", "equal protection", "freedom of speech", "search and seizure",
    "right to counsel", "double jeopardy", "eminent domain", "commerce clause",
]
COURTS = [
    "Supreme Court of the United States",
    "United States Court of Appeals for the Ninth Circuit",
    "Supreme Court of California",
]


def make_corpus():
    rng = np.random.default_rng(99)
    cases = []
    for i in range(N_CASES):
        topic = TOPICS[i % len(TOPICS)]
        court = COURTS[i % len(COURTS)]
        year = 1900 + (i * 7) % 120
        name = f"Party{i} v. Respondent{i % 37}"
        citation = f"{100 + i} U.S. {i * 3 + 7} ({year})"
        sentences = [
            f"This case number {i} presents a question of {topic}.",
            f"The court below held against the petitioner on {topic} grounds.",
            f"We granted certiorari to resolve the conflict about {topic} "
            f"doctrine among the circuits.",
            f"The judgment is {'affirmed' if i % 2 else 'reversed'} and the "
            f"case is remanded for further proceedings.",
        ]
        meta = CaseMetadata(
            id=new_case_id(), name=name, citation=citation, court=court,
            decision_date=dt.date(year, 1 + i % 12, 1 + i % 28),
        )
        cases.append((meta, " ".join(sentences)))
    return cases


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scale")
    cfg = Config()
    cfg.storage.db_path = str(tmp / "db.sqlite")
    cfg.vector.hnsw.num_partitions = 16
    cfg.vector.hnsw.num_probes = 8
    cfg.vector.dimension = 64
    cfg.ingestion.rate_limit_delay_ms = 0
    storage_cases = make_corpus()
    from trie_semantic_search_tpu.storage.store import StorageManager

    storage = StorageManager(cfg.storage)
    pipe = IngestionPipeline(cfg.ingestion, storage, cfg.text_processing)
    stats = asyncio.new_event_loop().run_until_complete(
        pipe.run_ingestion(MockDataSource(cases=storage_cases))
    )
    assert stats.processed == N_CASES

    vocab = train_wordpiece_vocab(
        (t for _, t in storage_cases), vocab_size=8192, min_frequency=1
    )
    embedder = Embedder(
        cfg.vector.model,
        tokenizer=WordPieceTokenizer(vocab),
        model_config=MiniLMConfig(
            vocab_size=8192, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position=64,
        ),
    )
    built = build_indexes(storage, cfg, embedder=embedder)
    engine = SearchEngine(cfg, storage, built.trie, built.vector, built.columns)
    return cfg, storage, built, engine


def test_index_shapes(stack):
    _, _, built, _ = stack
    st = built.trie.get_stats()
    assert st["name"]["postings"] == N_CASES
    assert st["content"]["nodes"] > 5000
    assert built.vector.size >= N_CASES * 3
    assert len(built.columns) == N_CASES


def test_exact_name_lookup_all(stack):
    """Every case findable by exact name through the batched device path."""
    _, storage, built, engine = stack
    names = [
        storage.get_case_metadata(cid).name.lower()
        for cid in built.columns.case_ids[:64]
    ]
    rows, valid = built.trie.search_batch_rows(names)
    for qi in range(len(names)):
        assert qi in rows[qi][valid[qi]], f"case {qi} not found by name"


def test_citation_lookup(stack):
    _, storage, built, engine = stack
    meta = storage.get_case_metadata(built.columns.case_ids[123])
    res = engine.search(meta.citation)
    assert res and res[0].case_metadata.id == meta.id


def test_phrase_queries(stack):
    _, _, _, engine = stack
    res = engine.search("question of equal protection")
    assert res
    assert all(
        "equal protection" in (r.case_metadata.full_text or r.snippet).lower()
        or "equal protection" in r.snippet.lower()
        for r in res[:3]
    )


def test_filtered_batch(stack):
    _, _, _, engine = stack
    qs = [
        SearchQuery(
            query=f"conflict about {t} doctrine",
            court_filter=[COURTS[0]],
            date_range=(dt.date(1950, 1, 1), dt.date(2020, 12, 31)),
            max_results=5,
        )
        for t in TOPICS
    ]
    results = engine.search_batch(qs)
    for rs in results:
        for r in rs:
            assert r.case_metadata.court == COURTS[0]
            assert r.case_metadata.decision_date >= dt.date(1950, 1, 1)


def test_completions_at_scale(stack):
    _, _, built, engine = stack
    comps = engine.trie_index.get_completions("party1 v.", limit=10)
    assert comps and len(comps) <= 10


def test_determinism_at_scale(stack):
    _, _, _, engine = stack
    engine.query_cache.clear()
    a = engine.search("certiorari to resolve the conflict")
    engine.query_cache.clear()
    b = engine.search("certiorari to resolve the conflict")
    assert [r.case_metadata.id for r in a] == [r.case_metadata.id for r in b]
