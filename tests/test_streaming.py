"""Streaming checkpointed build driver: parity with the one-shot builder,
mid-build crash resume without re-embedding, bounded-memory shard flow,
and selective content windowing."""

import datetime as dt

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.builder import build_indexes
from trie_semantic_search_tpu.index.streaming import StreamingIndexBuilder
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.search.engine import SearchEngine
from trie_semantic_search_tpu.storage.store import StorageManager

TINY = MiniLMConfig(vocab_size=4096, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, max_position=64)

N_CASES = 24


def make_stack(tmp_path, n_cases=N_CASES):
    cfg = Config()
    cfg.storage.db_path = str(tmp_path / "db.sqlite")
    cfg.trie.index_path = str(tmp_path / "trie")
    cfg.vector.hnsw.index_path = str(tmp_path / "vec")
    cfg.vector.hnsw.num_partitions = 8
    cfg.vector.dimension = 64
    # these tests count embedder calls (resume must not re-embed finished
    # shards); the quality gate embeds probe texts through the same
    # embedder, so keep it out of the count (it has its own test file)
    cfg.vector.quality_gate = "off"
    storage = StorageManager(cfg.storage)
    texts = []
    for i in range(n_cases):
        t = (f"The court held in matter {i} that the doctrine of estoppel "
             f"applies to claim {i % 5}. Further proceedings about issue "
             f"{i % 7} were remanded to the lower court for case {i}.")
        texts.append(t)
        meta = CaseMetadata(
            id=new_case_id(), name=f"Case {i} v. Appellee {i}",
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


def test_iter_cases_rowid_matches_columns(tmp_path):
    cfg, storage, _ = make_stack(tmp_path)
    cols = storage.fetch_filter_columns()
    seen = list(storage.iter_cases_rowid())
    assert [str(m.id) for _r, m, _t in seen] == [c[0] for c in cols]
    assert [r for r, _m, _t in seen] == list(range(N_CASES))
    # watermark skip
    tail = list(storage.iter_cases_rowid(start_row=20))
    assert [r for r, _m, _t in tail] == [20, 21, 22, 23]
    assert str(tail[0][1].id) == cols[20][0]


def test_streaming_matches_oneshot(tmp_path):
    cfg, storage, emb = make_stack(tmp_path)
    oneshot = build_indexes(storage, cfg, embedder=emb)

    cfg2 = Config()
    cfg2.storage.db_path = cfg.storage.db_path
    cfg2.trie.index_path = str(tmp_path / "trie_s")
    cfg2.vector.hnsw.index_path = str(tmp_path / "vec_s")
    cfg2.vector.hnsw.num_partitions = 8
    cfg2.vector.dimension = 64
    sb = StreamingIndexBuilder(
        storage, cfg2, embedder=emb,
        work_dir=tmp_path / "work", shard_chunks=16,
    )
    built = sb.build()
    assert built.report.cases == oneshot.report.cases == N_CASES
    assert built.report.content_chunks == oneshot.report.content_chunks
    assert built.report.shards >= 2  # actually streamed in shards
    assert built.report.chunks_per_second > 0
    # identical frozen trie arrays (same insert stream → same freeze)
    for name in ("name_trie", "content_trie", "citation_trie"):
        a = getattr(oneshot.trie, name.split("_")[0] + "_trie")
        b = getattr(built.trie, name.split("_")[0] + "_trie")
        np.testing.assert_array_equal(a.post_case, b.post_case)
        np.testing.assert_array_equal(a.edge_tokens, b.edge_tokens)
    # identical embeddings (same chunks through the same encoder)
    np.testing.assert_allclose(
        np.asarray(oneshot.vector.vectors), np.asarray(built.vector.vectors),
        atol=1e-5,
    )
    engine = SearchEngine(cfg2, storage, built.trie, built.vector,
                          built.columns)
    res = engine.search("case 7 v. appellee 7")
    assert res and res[0].case_metadata.name == "Case 7 v. Appellee 7"


def test_streaming_resume_after_crash(tmp_path):
    cfg, storage, emb = make_stack(tmp_path)
    work = tmp_path / "work"

    sb = StreamingIndexBuilder(storage, cfg, embedder=emb,
                               work_dir=work, shard_chunks=16)

    # crash after the second checkpoint
    real_ckpt = sb._checkpoint
    count = [0]

    def crashing(manifest, trie, next_row):
        real_ckpt(manifest, trie, next_row)
        count[0] += 1
        if count[0] == 2:
            raise KeyboardInterrupt("simulated crash")

    sb._checkpoint = crashing
    with pytest.raises(KeyboardInterrupt):
        sb.build()

    embedded_before = emb.get_stats()["texts_embedded"]

    # fresh driver instance (new process) resumes from the manifest
    sb2 = StreamingIndexBuilder(storage, cfg, embedder=emb,
                                work_dir=work, shard_chunks=16)
    built = sb2.build(resume=True)
    assert built.report.resumed_from_row > 0
    assert built.report.cases == N_CASES
    # no re-embedding of completed shards: only the remaining chunks embed
    embedded_after = emb.get_stats()["texts_embedded"]
    remaining = built.report.content_chunks - 2 * 16  # 2 shards done... at least
    assert embedded_after - embedded_before <= built.report.content_chunks - 32

    # old (pre-crash) and new (post-crash) cases both searchable
    engine = SearchEngine(cfg, storage, built.trie, built.vector,
                          built.columns)
    res = engine.search("case 0 v. appellee 0")
    assert res and res[0].case_metadata.name == "Case 0 v. Appellee 0"
    res = engine.search(f"case {N_CASES - 1} v. appellee {N_CASES - 1}")
    assert res and res[0].case_metadata.name == \
        f"Case {N_CASES - 1} v. Appellee {N_CASES - 1}"


def test_phrase_start_windowing_shrinks_trie(tmp_path):
    from trie_semantic_search_tpu.core.config import TrieConfig
    from trie_semantic_search_tpu.index.trie import TrieIndex

    text = ("the defendant was convicted of fraud in the district court "
            "and the conviction was affirmed on appeal by the circuit")
    toks = text.split()

    full = TrieIndex(TrieConfig(content_windowing="all"))
    full.insert_content(toks, 0, 0)
    full.freeze()
    selective = TrieIndex(TrieConfig(content_windowing="phrase_start"))
    selective.insert_content(toks, 0, 0)
    selective.freeze()

    assert (selective.content_trie.num_nodes
            < full.content_trie.num_nodes * 0.6)
    # phrases that start at a phrase boundary still match...
    rows, valid = selective.search_batch_rows(["defendant was convicted"])
    assert valid.any()
    rows, valid = selective.search_batch_rows(["district court"])
    assert valid.any()
    # ...and sentence starts always do
    rows, valid = selective.search_batch_rows(["the defendant"])
    assert valid.any()


def test_streaming_finalize_tunes_and_persists_nprobe(tmp_path):
    """Past the 100-vector gate the finalize must tune nprobe (serving-
    grade case-recall tuner, or its row-level fallback) and the saved
    artifact must carry the value so a fresh load adopts it."""
    from trie_semantic_search_tpu.index.builder import load_artifacts

    cfg, storage, emb = make_stack(tmp_path, n_cases=64)
    sb = StreamingIndexBuilder(
        storage, cfg, embedder=emb,
        work_dir=tmp_path / "work", shard_chunks=32,
    )
    built = sb.build()
    assert built.vector.ann.num_vectors >= 100
    tuned = built.vector.ann.tuned_nprobe
    assert tuned >= 1
    # the shared config object stays clean (no cross-build contamination)
    assert cfg.vector.hnsw.num_probes == 0
    arts = load_artifacts(cfg, embedder=emb)
    assert arts is not None
    _trie, vector2, _cols = arts
    assert vector2.ann.tuned_nprobe == tuned
    assert vector2.ann.default_nprobe == min(
        tuned, vector2.ann.centroids.shape[0]
    )


def test_streaming_finalize_tune_on_build_off(tmp_path):
    """vector.hnsw.tune_on_build=False skips finalize nprobe tuning (the
    tuner's exact oracle brute-scans the corpus per probe — hours on the
    1-core CPU fallback at multi-M-chunk harness scale). The artifact
    saves untuned and a fresh load falls back to the default_nprobe
    heuristic instead of a persisted value."""
    from trie_semantic_search_tpu.index.builder import load_artifacts

    cfg, storage, emb = make_stack(tmp_path, n_cases=64)
    cfg.vector.hnsw.tune_on_build = False
    sb = StreamingIndexBuilder(
        storage, cfg, embedder=emb,
        work_dir=tmp_path / "work", shard_chunks=32,
    )
    built = sb.build()
    assert built.vector.ann.num_vectors >= 100  # past the tuning gate
    assert built.vector.ann.tuned_nprobe == 0  # never tuned
    arts = load_artifacts(cfg, embedder=emb)
    assert arts is not None
    _trie, vector2, _cols = arts
    assert vector2.ann.tuned_nprobe == 0
    P = int(vector2.ann.centroids.shape[0])
    assert 1 <= vector2.ann.default_nprobe <= P  # heuristic, not persisted
