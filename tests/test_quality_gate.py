"""Build-time quality gate (round-3 VERDICT item 5): a quality-degraded
encoder can never finalize silently — the gate probes the finished
artifact's encoder against a random-init control at save time, persists
the metrics in the artifact meta, and warns or refuses per config."""

import datetime as dt
import logging

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.errors import ValidationFailed
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.builder import build_indexes, save_artifacts
from trie_semantic_search_tpu.index.quality_gate import (
    QualityGateFailed,
    load_quality_meta,
    run_quality_gate,
)
from trie_semantic_search_tpu.models.embedder import Embedder, EmbeddingResult
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.storage.store import StorageManager

TINY = MiniLMConfig(vocab_size=4096, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, max_position=64)


def make_stack(tmp_path, n_cases=40):
    cfg = Config()
    cfg.storage.db_path = str(tmp_path / "db.sqlite")
    cfg.trie.index_path = str(tmp_path / "trie")
    cfg.vector.hnsw.index_path = str(tmp_path / "vec")
    cfg.vector.hnsw.num_partitions = 8
    cfg.vector.dimension = 64
    storage = StorageManager(cfg.storage)
    texts = []
    for i in range(n_cases):
        # synonym-swappable words (court, held, evidence, attorney) so the
        # paraphrase probe generator always produces rewrites
        t = (f"The court held that the attorney for matter {i} presented "
             f"strong evidence about doctrine {i % 9} and claim {i % 5}. "
             f"The judgment concluded that statute {i} was reasonable and "
             f"the petitioner in case {i} prevailed on issue {i % 7}.")
        texts.append(t)
        meta = CaseMetadata(
            id=new_case_id(), name=f"Gate Case {i} v. Example {i}",
            citation=f"{i} U.S. {i * 2 + 1} (196{i % 10})",
            court="Supreme Court of the United States",
            decision_date=dt.date(1960 + i % 10, 1, 1),
        )
        storage.store_case_metadata(meta)
        storage.store_case_text(meta.id, t)
    vocab = train_wordpiece_vocab(texts, vocab_size=4096, min_frequency=1)
    emb = Embedder(cfg.vector.model, tokenizer=WordPieceTokenizer(vocab),
                   model_config=TINY)
    return cfg, storage, emb


class DegradedEmbedder:
    """An encoder whose embeddings carry NO information (constant vector)
    — the 'worse than a random projection' failure mode the round-3
    flagship artifact shipped with."""

    def __init__(self, inner: Embedder):
        self._inner = inner
        self.tokenizer = inner.tokenizer
        self.model_config = inner.model_config
        self.params = inner.params

    @property
    def dimension(self) -> int:
        return self._inner.dimension

    def embed(self, texts):
        r = self._inner.embed(list(texts))
        return EmbeddingResult(
            np.ones_like(r.embedding), r.processing_time_ms
        )

    def embed_one(self, text):
        return self.embed([text])


def test_gate_metrics_persist_in_artifact_meta(tmp_path):
    cfg, storage, emb = make_stack(tmp_path)
    built = build_indexes(storage, cfg, embedder=emb)
    save_artifacts(built, cfg, storage=storage)
    meta = load_quality_meta(cfg.vector.hnsw.index_path)
    assert meta is not None
    assert meta["probes"] >= 8
    assert 0.0 <= meta["trained"]["all"]["mrr"] <= 1.0
    assert 0.0 <= meta["control"]["all"]["mrr"] <= 1.0
    assert meta["mode"] == "warn"
    # a real (even random-init) encoder is not degraded vs its own control
    # geometry — paraphrase/half probes rank on token overlap either way
    assert isinstance(meta["degraded"], bool)


def test_refuse_blocks_degraded_artifact(tmp_path):
    cfg, storage, emb = make_stack(tmp_path)
    cfg.vector.quality_gate = "refuse"
    degraded = DegradedEmbedder(emb)
    built = build_indexes(storage, cfg, embedder=degraded)
    with pytest.raises(QualityGateFailed):
        save_artifacts(built, cfg, storage=storage)
    # nothing was written: the degraded artifact cannot ship
    assert load_quality_meta(cfg.vector.hnsw.index_path) is None
    from pathlib import Path

    assert not (Path(cfg.trie.index_path) / "columns.npz").exists()


def test_warn_mode_ships_with_recorded_degradation(tmp_path, caplog):
    cfg, storage, emb = make_stack(tmp_path)
    assert cfg.vector.quality_gate == "warn"  # the default
    degraded = DegradedEmbedder(emb)
    built = build_indexes(storage, cfg, embedder=degraded)
    with caplog.at_level(logging.WARNING, logger="tss_tpu.quality_gate"):
        save_artifacts(built, cfg, storage=storage)
    assert any("UNDERPERFORMS" in r.message for r in caplog.records)
    meta = load_quality_meta(cfg.vector.hnsw.index_path)
    assert meta is not None and meta["degraded"] is True
    assert meta["trained"]["all"]["mrr"] < meta["control"]["all"]["mrr"]


def test_gate_skips_tiny_corpus(tmp_path):
    cfg, storage, emb = make_stack(tmp_path, n_cases=2)
    report = run_quality_gate(storage, cfg, emb)
    assert report is None


def test_gate_off_mode(tmp_path):
    cfg, storage, emb = make_stack(tmp_path, n_cases=4)
    cfg.vector.quality_gate = "off"
    assert run_quality_gate(storage, cfg, emb) is None


def test_config_validates_gate_mode():
    cfg = Config()
    cfg.vector.quality_gate = "bogus"
    with pytest.raises(ValidationFailed):
        cfg.validate()


def test_streaming_finalize_runs_gate(tmp_path):
    """The streaming (CAP-scale) build path — where the round-3 artifact
    shipped — persists gate metrics too."""
    from trie_semantic_search_tpu.index.streaming import StreamingIndexBuilder

    cfg, storage, emb = make_stack(tmp_path, n_cases=24)
    sb = StreamingIndexBuilder(
        storage, cfg, embedder=emb,
        work_dir=tmp_path / "work", shard_chunks=16,
    )
    sb.build()
    meta = load_quality_meta(cfg.vector.hnsw.index_path)
    assert meta is not None and meta["probes"] >= 8
