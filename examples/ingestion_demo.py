"""Ingestion demo — BASELINE config 2 (ref: /root/reference/examples/
ingestion_demo.rs:236-372): run the full pipeline over the MockDataSource,
build the content trie from the tokenised text, run batched prefix queries,
dump stored cases + stats.

Run: python examples/ingestion_demo.py
"""

from __future__ import annotations

import asyncio
import tempfile

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.index.builder import build_indexes
from trie_semantic_search_tpu.ingest.pipeline import IngestionPipeline
from trie_semantic_search_tpu.ingest.sources import MockDataSource
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.storage.store import StorageManager
from trie_semantic_search_tpu.utils import TextUtils


def main() -> None:
    from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

    if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
        print("warning: TPU relay unreachable - running on CPU backend")
    cfg = Config()
    with tempfile.TemporaryDirectory() as tmp:
        cfg.storage.db_path = f"{tmp}/demo.db"
        cfg.ingestion.cache.disk_cache_path = f"{tmp}/cache"
        storage = StorageManager(cfg.storage)

        print("=== pipeline health check ===")
        pipeline = IngestionPipeline(
            cfg.ingestion, storage, text_config=cfg.text_processing
        )
        pipeline.health_check()
        print("  ok")

        print("\n=== running ingestion from MockDataSource ===")
        source = MockDataSource()
        stats = asyncio.run(pipeline.run_ingestion(source))
        print(
            f"  fetched={stats.total_cases} processed={stats.processed} "
            f"skipped={stats.skipped_duplicates} "
            f"failed_validation={stats.failed_validation} "
            f"rate={stats.cases_per_second:.1f} cases/s"
        )

        print("\n=== building content trie + vector index ===")
        # tiny encoder so the demo runs in seconds anywhere
        corpus = [text for _, text in storage.iter_cases()]
        vocab = train_wordpiece_vocab(corpus, vocab_size=4096, min_frequency=1)
        embedder = Embedder(
            cfg.vector.model,
            tokenizer=WordPieceTokenizer(vocab),
            model_config=MiniLMConfig(
                vocab_size=4096, hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, max_position=64,
            ),
        )
        built = build_indexes(storage, cfg, embedder=embedder)
        print(
            f"  {built.report.cases} cases, {built.report.content_chunks} "
            f"chunks in {built.report.seconds:.2f}s"
        )
        ct = built.trie.get_stats()["content"]
        print(f"  content trie: {ct['nodes']} nodes, {ct['postings']} postings")

        print("\n=== batched prefix/phrase queries (one device program) ===")
        queries = [
            "right to remain silent",
            "separate educational facilities",
            "right of privacy",
            "no such phrase at all",
        ]
        rows, valid = built.trie.search_batch_rows(queries)
        for qi, q in enumerate(queries):
            hit_rows = sorted(set(rows[qi][valid[qi]].tolist()))
            names = [
                storage.get_case_metadata(built.columns.case_ids[r]).name
                for r in hit_rows
            ]
            print(f"  {q!r} -> {names}")

        print("\n=== stored case dump ===")
        for meta, text in storage.iter_cases():
            print(
                f"  {meta.name} [{meta.citation}] "
                f"{meta.decision_date} — {TextUtils.extract_preview(text, 10)}"
            )
        st = storage.get_stats()
        print(
            f"\n  storage: {st.total_cases} cases, "
            f"{st.db_size_bytes} bytes, compression={st.compression_enabled}"
        )


if __name__ == "__main__":
    main()
