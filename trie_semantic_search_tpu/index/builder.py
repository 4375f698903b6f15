"""Index build pipeline: storage → frozen trie + vector + column artifacts.

Implements the path the reference specified but never wired
(``rebuild_indices`` TODO at ``/root/reference/src/main.rs:248-261``;
insertion APIs at ``trie.rs:97-109`` / ``vector.rs:117-125``; SURVEY.md §3.5).

Flow per case:
  1. dense row id from :class:`MetadataColumns` (row order = storage order)
  2. case name → name trie; primary + extracted citations → citation trie
  3. full text → TextProcessor sentences; each sentence's word tokens →
     content trie (windowed), and the sentence text → vector index chunk
  4. freeze everything; optionally save artifacts + tune ANN probes
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from ..core.config import Config
from ..models.embedder import Embedder
from ..models.tokenizer import WordPieceTokenizer, train_wordpiece_vocab
from ..storage.columns import MetadataColumns
from ..storage.store import StorageManager
from ..text.processor import TextProcessor
from .trie import TrieIndex
from .vector import VectorIndex

_log = logging.getLogger("tss_tpu.builder")


@dataclass
class BuildReport:
    cases: int = 0
    content_chunks: int = 0
    citations: int = 0
    seconds: float = 0.0


@dataclass
class BuiltIndexes:
    trie: TrieIndex
    vector: VectorIndex
    columns: MetadataColumns
    report: BuildReport


def build_indexes(
    storage: StorageManager,
    config: Config,
    text_processor: Optional[TextProcessor] = None,
    embedder: Optional[Embedder] = None,
    max_chunks_per_case: int = 64,
    tune_recall: Optional[float] = None,
    pretrain_steps: int = 0,
    mesh=None,
) -> BuiltIndexes:
    """Build all frozen search artifacts from the document store.

    ``pretrain_steps > 0`` runs corpus-contrastive InfoNCE pretraining on
    the encoder before embedding (meaningful semantics with zero downloaded
    weights); ``mesh`` routes the vector index to the multi-chip sharded
    scan."""
    t0 = time.perf_counter()
    tp = text_processor or TextProcessor(config.text_processing)
    columns = MetadataColumns.build(storage.fetch_filter_columns())
    trie = TrieIndex(config.trie)

    if embedder is None:
        # No external tokenizer/weights → train a corpus WordPiece vocab so
        # embeddings are meaningful offline.
        corpus_texts = (text for _, text in storage.iter_cases() if text)
        vocab = train_wordpiece_vocab(corpus_texts, vocab_size=8192)
        embedder = Embedder(
            config.vector.model, tokenizer=WordPieceTokenizer(vocab)
        )
        if config.vector.pooling != "mean":
            # pooling selection on probe merit (mean vs SIF) over a
            # bounded sample — see models/train.select_pooling_guarded
            from ..models.train import select_pooling_guarded

            sample_docs = []
            for i, (_m, text) in enumerate(storage.iter_cases()):
                if i >= 2000:
                    break
                if text:
                    sample_docs.append(
                        tp.extract_sentences(tp.normalize_text(text))
                    )
            rec = select_pooling_guarded(
                embedder, sample_docs, sif_a=config.vector.sif_a,
                force=None if config.vector.pooling == "auto" else "sif",
            )
            _log.info("pooling selection: %s", rec)
    if pretrain_steps > 0:
        # guarded: keeps the init weights if the contrastive objective
        # degrades probe retrieval (see models/train.pretrain_encoder_guarded)
        from ..models.train import pretrain_encoder_guarded

        docs = [
            tp.extract_sentences(tp.normalize_text(text))
            for _, text in storage.iter_cases()
            if text
        ]
        report = pretrain_encoder_guarded(
            embedder, docs, steps=pretrain_steps,
            max_len=min(64, config.vector.model.max_sequence_length),
        )
        _log.info("encoder pretraining: %s", report)
    vector = VectorIndex(config.vector, embedder=embedder, mesh=mesh)

    report = BuildReport()
    # stream in rowid order — the dense device row order (same stream the
    # checkpointed StreamingIndexBuilder uses, so both builders produce
    # identical frozen artifacts); embed accumulated chunks every
    # EMBED_FLUSH docs so raw chunk text never accumulates past a bounded
    # window (corpus-scale builds)
    EMBED_FLUSH = 8192
    for row, meta, text in storage.iter_cases_rowid():
        assert columns.row_of_case[meta.id] == row
        trie.insert_case_name(meta.name, row)
        if meta.citation:
            trie.insert_citation(meta.citation, row)
            report.citations += 1
        for cit in meta.citations:
            trie.insert_citation(cit, row)
            report.citations += 1

        body = text or meta.full_text
        if body:
            processed = tp.process_text(body)
            chunks = processed.sentences[:max_chunks_per_case]
            for para_idx, sentence in enumerate(chunks):
                tokens = [t for t in sentence.lower().split() if t]
                trie.insert_content(tokens, row, para_idx)
                vector.add_document(row, sentence, para_idx)
                report.content_chunks += 1
            for cit in processed.citations:
                trie.insert_citation(cit.normalized, row)
        report.cases += 1
        embedded = vector.embed_pending(flush_threshold=EMBED_FLUSH)
        if embedded:
            _log.info(
                "embedded %d chunks (%d cases done)", embedded, report.cases
            )

    trie.freeze()
    vector.freeze()

    if tune_recall and vector.ann.num_vectors >= 100 and vector.vectors is not None:
        # serving-grade tuning: case-level recall with query-shaped probes
        # (see index/tuning.py module doc for why corpus-row self-queries
        # are degenerate); falls back to the row-level tuner when the
        # corpus is too small to generate probes
        from .tuning import build_probe_embeddings, tune_nprobe_case_recall

        probes = build_probe_embeddings(
            storage, tp, lambda texts: vector.generate_embeddings(texts)
        )
        if probes is not None and len(vector.refs):
            mn = config.vector.hnsw.tune_min_recall
            nprobe = tune_nprobe_case_recall(
                vector.ann, np.asarray(vector.refs)[:, 0], vector.vectors,
                probes, k=10, target_recall=tune_recall,
                min_recall=mn if mn > 0 else None,
            )
            _log.info(
                "tuned nprobe=%d for case recall>=%.2f", nprobe, tune_recall
            )
        else:
            rng = np.random.default_rng(0)
            sample = vector.vectors[
                rng.choice(
                    vector.ann.num_vectors,
                    min(64, vector.ann.num_vectors),
                    replace=False,
                )
            ]
            nprobe = vector.ann.tune_nprobe(
                sample, k=10, target_recall=tune_recall
            )
            _log.info("tuned nprobe=%d for recall>=%.2f", nprobe, tune_recall)

    report.seconds = time.perf_counter() - t0
    _log.info(
        "built indexes: %d cases, %d chunks, %d citations in %.2fs",
        report.cases, report.content_chunks, report.citations, report.seconds,
    )
    return BuiltIndexes(trie=trie, vector=vector, columns=columns, report=report)


def update_indexes(
    built: BuiltIndexes,
    storage: StorageManager,
    config: Config,
    text_processor: Optional[TextProcessor] = None,
    max_chunks_per_case: int = 64,
) -> BuiltIndexes:
    """Incremental refresh: index only cases added to storage since
    ``built`` was produced, reusing the existing encoder, trie builders and
    ANN partitioning (no re-embedding of old chunks, no k-means retrain).
    Returns a new BuiltIndexes ready for an atomic engine swap.

    This is the incremental-update path the reference configured
    (``enable_incremental_updates``, config.rs:109) but never wired to its
    indexes.
    """
    t0 = time.perf_counter()
    tp = text_processor or TextProcessor(config.text_processing)
    columns = MetadataColumns.build(storage.fetch_filter_columns())
    trie = built.trie
    vector = built.vector
    known = set(built.columns.row_of_case)
    report = BuildReport(cases=built.report.cases,
                         content_chunks=built.report.content_chunks,
                         citations=built.report.citations)

    new_cases = 0
    for row, meta, text in storage.iter_cases_rowid():
        if meta.id in known:
            continue
        trie.insert_case_name(meta.name, row)
        if meta.citation:
            trie.insert_citation(meta.citation, row)
            report.citations += 1
        for cit in meta.citations:
            trie.insert_citation(cit, row)
            report.citations += 1
        body = text or meta.full_text
        if body:
            processed = tp.process_text(body)
            for para_idx, sentence in enumerate(
                processed.sentences[:max_chunks_per_case]
            ):
                tokens = [t for t in sentence.lower().split() if t]
                trie.insert_content(tokens, row, para_idx)
                vector.add_document(row, sentence, para_idx)
                report.content_chunks += 1
            for cit in processed.citations:
                trie.insert_citation(cit.normalized, row)
        report.cases += 1
        new_cases += 1

    if new_cases:
        # NOTE: row ids are positional in MetadataColumns (sorted by case
        # id); adding cases can renumber rows, so existing postings would
        # go stale. Re-map by rebuilding postings only when the old order
        # is preserved; otherwise fall back to a full rebuild.
        old_rows = built.columns.case_ids
        if columns.case_ids[: len(old_rows)] != old_rows:
            _log.info("row order changed; falling back to full rebuild")
            return build_indexes(
                storage, config, text_processor=tp,
                embedder=vector.embedder, max_chunks_per_case=max_chunks_per_case,
            )
        trie.freeze()
        # reuse the ANN partitioning when one exists
        centroids = None
        if hasattr(vector.ann, "centroids") and vector.ann.centroids is not None:
            centroids = np.asarray(vector.ann.centroids)
        vector.embed_pending()
        if vector._vectors is not None and len(vector._vectors):
            if centroids is not None and hasattr(vector.ann, "build"):
                try:
                    vector.ann.build(vector._vectors, reuse_centroids=centroids)
                except TypeError:  # sharded index has no centroid reuse
                    vector.ann.build(vector._vectors)
            else:
                vector.ann.build(vector._vectors)

    report.seconds = time.perf_counter() - t0
    _log.info("incremental update: %d new cases in %.2fs", new_cases, report.seconds)
    return BuiltIndexes(trie=trie, vector=vector, columns=columns, report=report)


def save_artifacts(
    built: BuiltIndexes,
    config: Config,
    storage: Optional[StorageManager] = None,
) -> None:
    """Persist all frozen artifacts (checkpoint/resume surface, SURVEY.md §5:
    "index build is checkpointed as serialized array shards + manifest").

    The encoder (tokenizer vocab + params) is part of the artifact set:
    corpus embeddings are only comparable to query embeddings from the
    SAME encoder, so loading indexes with a freshly initialised encoder
    would silently break semantic scoring.

    When ``storage`` is provided, the build-time quality gate runs FIRST
    (``vector.quality_gate``; round-3 VERDICT item 5): the finished
    encoder is probed against a random-init control, the metrics persist
    in the artifact meta (``quality.json``), and a degraded encoder
    warns — or, in "refuse" mode, aborts before anything is written."""
    quality = None
    if storage is not None and built.vector.size:
        from .quality_gate import run_quality_gate

        quality = run_quality_gate(  # raises QualityGateFailed on refuse
            storage, config, built.vector.embedder
        )
    built.trie.save_to_disk(config.trie.index_path)
    built.vector.save(config.vector.hnsw.index_path)
    built.columns.save(Path(config.trie.index_path) / "columns.npz")
    save_encoder(
        built.vector.embedder, Path(config.vector.hnsw.index_path)
    )
    if quality is not None:
        from .quality_gate import save_quality_meta

        save_quality_meta(quality, Path(config.vector.hnsw.index_path))


def save_encoder(emb: Embedder, enc_dir: Path) -> None:
    """Persist the encoder (tokenizer vocab + params + pooling weights) so
    future loads — and SIGKILL-resumed streaming builds — embed with the
    SAME weights. Pooling weights are part of the encoder identity: corpus
    and query vectors are only comparable under the same pooling."""
    from ..models.checkpoint import save_checkpoint

    enc_dir.mkdir(parents=True, exist_ok=True)
    emb.tokenizer.save(enc_dir / "tokenizer.json")
    tw_path = enc_dir / "token_weights.npy"
    tw = getattr(emb, "token_weights", None)  # duck-typed test embedders
    if tw is not None:
        np.save(tw_path, np.asarray(tw, np.float32))
    elif tw_path.exists():
        tw_path.unlink()
    save_checkpoint(
        enc_dir / "encoder", 0, emb.params,
        metadata={
            "vocab_size": emb.model_config.vocab_size,
            "hidden_size": emb.model_config.hidden_size,
            "num_layers": emb.model_config.num_layers,
            "num_heads": emb.model_config.num_heads,
            "intermediate_size": emb.model_config.intermediate_size,
            "max_position": emb.model_config.max_position,
        },
        keep=1,
    )


def load_artifacts(
    config: Config, embedder: Optional[Embedder] = None
) -> Optional[tuple[TrieIndex, VectorIndex, MetadataColumns]]:
    """Load previously saved artifacts; None when absent. Restores the
    saved encoder (tokenizer + params) unless one is injected."""
    trie_dir = Path(config.trie.index_path)
    vec_dir = Path(config.vector.hnsw.index_path)
    cols_path = trie_dir / "columns.npz"
    has_trie = (trie_dir / "name_trie.npz").exists() or (
        trie_dir / "name_trie.mmap"
    ).is_dir()
    if not has_trie or not cols_path.exists():
        return None
    trie = TrieIndex.load_from_disk(trie_dir, config.trie)
    if embedder is None:
        embedder = _load_encoder(config, vec_dir)
    vector = VectorIndex(config.vector, embedder=embedder)
    if (vec_dir / "refs.npz").exists():
        vector.load(vec_dir)
    columns = MetadataColumns.load(cols_path)
    return trie, vector, columns


def _load_encoder(config: Config, vec_dir: Path) -> Optional[Embedder]:
    """Reconstruct the exact build-time encoder from saved artifacts."""
    tok_path = vec_dir / "tokenizer.json"
    enc_dir = vec_dir / "encoder"
    if not tok_path.exists():
        return None
    tokenizer = WordPieceTokenizer.load(tok_path)
    from ..models.checkpoint import latest_step, restore_checkpoint
    from ..models import minilm

    step = latest_step(enc_dir)
    if step is None:
        from ..core.errors import IndexCorrupted

        # tokenizer saved but no encoder checkpoint: a fresh random encoder
        # would silently mis-score every semantic query — fail loudly
        raise IndexCorrupted(
            index_type="encoder",
            details=f"tokenizer present but no checkpoint under {enc_dir}",
        )
    import json as _json

    meta = _json.loads((enc_dir / f"step_{step}" / "meta.json").read_text())
    model_config = minilm.MiniLMConfig(
        vocab_size=meta["vocab_size"],
        hidden_size=meta["hidden_size"],
        num_layers=meta["num_layers"],
        num_heads=meta["num_heads"],
        intermediate_size=meta["intermediate_size"],
        max_position=meta["max_position"],
    )
    import jax

    template = minilm.init_params(jax.random.PRNGKey(0), model_config)
    restored = restore_checkpoint(enc_dir, template)
    if restored is None:
        from ..core.errors import IndexCorrupted

        raise IndexCorrupted(
            index_type="encoder", details=f"unreadable checkpoint in {enc_dir}"
        )
    params = restored[0]
    tw_path = vec_dir / "token_weights.npy"
    token_weights = np.load(tw_path) if tw_path.exists() else None
    return Embedder(
        config.vector.model, tokenizer=tokenizer,
        params=params, model_config=model_config,
        token_weights=token_weights,
    )
