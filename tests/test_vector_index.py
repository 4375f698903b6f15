"""Embedder + VectorIndex + caches."""

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import (
    AnnConfig,
    EmbeddingModelConfig,
    VectorConfig,
)
from trie_semantic_search_tpu.index.vector import VectorIndex
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.search.cache import QueryCache, VectorCache

DOCS = [
    "the supreme court held that due process requires notice and a hearing",
    "the defendant filed a motion to suppress the evidence obtained",
    "equal protection under the fourteenth amendment forbids segregation",
    "the court of appeals reversed the district court judgment",
    "freedom of speech is protected by the first amendment",
    "the contract was breached and damages were awarded to the plaintiff",
]

TINY_MODEL = MiniLMConfig(
    vocab_size=4096, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position=64,
)


@pytest.fixture(scope="module")
def embedder():
    vocab = train_wordpiece_vocab(DOCS, vocab_size=4096, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    cfg = EmbeddingModelConfig(max_sequence_length=64, batch_size=8)
    return Embedder(cfg, tokenizer=tok, model_config=TINY_MODEL)


def test_embed_shapes_and_norm(embedder):
    res = embedder.embed(DOCS)
    assert res.embedding.shape == (len(DOCS), 64)
    np.testing.assert_allclose(
        np.linalg.norm(res.embedding, axis=1), 1.0, atol=1e-5
    )
    assert res.processing_time_ms > 0
    assert embedder.get_stats()["texts_embedded"] == len(DOCS)


def test_embed_empty(embedder):
    assert embedder.embed([]).embedding.shape == (0, 64)


def test_embed_deterministic(embedder):
    a = embedder.embed_one(DOCS[0])
    b = embedder.embed_one(DOCS[0])
    np.testing.assert_array_equal(a, b)


def test_embed_bucketing_consistency(embedder):
    """Same text embedded alone vs in a batch → same vector (static-shape
    padding must not leak)."""
    solo = embedder.embed_one(DOCS[2])
    batch = embedder.embed(DOCS).embedding[2]
    np.testing.assert_allclose(solo, batch, atol=3e-2)


# ---------------------------------------------------------------------------
# caches
# ---------------------------------------------------------------------------


def test_vector_cache_lru():
    c = VectorCache(max_size=2)
    c.put("a", np.zeros(3))
    c.put("b", np.ones(3))
    assert c.get("a") is not None  # refresh a
    c.put("c", np.ones(3))  # evicts b (LRU)
    assert c.get("b") is None
    assert c.get("a") is not None
    st = c.get_stats()
    assert st.size == 2 and st.max_size == 2


def test_query_cache_ttl(monkeypatch):
    c = QueryCache(max_size=10, ttl_seconds=0.01)
    c.put("q", [1, 2, 3])
    assert c.get("q") == [1, 2, 3]
    import time

    time.sleep(0.02)
    assert c.get("q") is None  # expired


# ---------------------------------------------------------------------------
# VectorIndex
# ---------------------------------------------------------------------------


@pytest.fixture()
def vindex(embedder):
    cfg = VectorConfig(hnsw=AnnConfig(num_partitions=8, num_probes=8), dimension=64)
    idx = VectorIndex(cfg, embedder=embedder)
    for row, text in enumerate(DOCS):
        idx.add_document(row, text, paragraph_index=row % 3)
    idx.freeze()
    return idx


def test_vector_index_self_retrieval(vindex):
    """Each document's own text must retrieve itself at rank 1."""
    for row, text in enumerate(DOCS):
        hits = vindex.search(text, top_k=3)
        assert hits, text
        assert hits[0].row == row
        assert hits[0].similarity_score > 0.99


def test_vector_index_batch(vindex):
    res = vindex.search_batch([DOCS[0], DOCS[1]], top_k=2)
    assert len(res) == 2
    assert res[0][0].row == 0 and res[1][0].row == 1


def test_vector_index_embedding_cache(vindex):
    vindex.search(DOCS[0], top_k=1)
    before = vindex.cache.get_stats().hits
    vindex.search(DOCS[0], top_k=1)
    assert vindex.cache.get_stats().hits > before


def test_generate_embeddings_batch_matches_single(vindex):
    """The batched embed path (one device dispatch for all cache misses)
    must return exactly what per-query generate_embedding returns, for any
    mix of cached and uncached queries."""
    import numpy as np

    texts = [DOCS[0], DOCS[2], DOCS[1], DOCS[0]]
    vindex.generate_embedding(DOCS[2])  # pre-cache one of them
    batch = vindex.generate_embeddings(texts)
    singles = np.stack([vindex.generate_embedding(t) for t in texts])
    np.testing.assert_allclose(batch, singles, atol=1e-6)
    assert batch.shape == (4, vindex.config.dimension)
    # repeats inside one batch come back identical
    np.testing.assert_array_equal(batch[0], batch[3])


def test_vector_index_empty():
    idx = VectorIndex(
        VectorConfig(hnsw=AnnConfig(num_partitions=8)),
        embedder=None if False else Embedder(
            EmbeddingModelConfig(max_sequence_length=32),
            tokenizer=WordPieceTokenizer(
                train_wordpiece_vocab(["a b c"], vocab_size=128, min_frequency=1)
            ),
            model_config=TINY_MODEL,
        ),
    )
    assert idx.search("anything", 5) == []


def test_vector_index_incremental_freeze(vindex, embedder):
    n = vindex.size
    vindex.add_document(99, "a brand new legal opinion about zoning")
    vindex.freeze()
    assert vindex.size == n + 1
    hits = vindex.search("a brand new legal opinion about zoning", top_k=1)
    assert hits[0].row == 99


def test_vector_index_stats(vindex):
    st = vindex.get_stats()
    assert st.total_documents == len(DOCS)
    assert st.dimension == 64
    assert st.ann is not None and st.ann.num_vectors == len(DOCS)


def test_vector_index_save_load(vindex, embedder, tmp_path):
    vindex.save(tmp_path / "vec")
    idx2 = VectorIndex(vindex.config, embedder=embedder)
    idx2.load(tmp_path / "vec")
    assert idx2.size == vindex.size
    hits = idx2.search(DOCS[3], top_k=1)
    assert hits[0].row == 3


def test_embed_pending_streaming(embedder):
    cfg = VectorConfig(hnsw=AnnConfig(num_partitions=8), dimension=64)
    idx = VectorIndex(cfg, embedder=embedder)
    for row, text in enumerate(DOCS):
        idx.add_document(row, text, row)
        # below threshold: no-op
        assert idx.embed_pending(flush_threshold=100) == 0
    # threshold reached mid-stream
    n = idx.embed_pending(flush_threshold=3)
    assert n == len(DOCS)
    assert idx.size == len(DOCS)
    idx.add_document(99, DOCS[0], 0)
    idx.freeze()
    assert idx.size == len(DOCS) + 1
    hits = idx.search(DOCS[1], top_k=1)
    assert hits[0].row == 1


def test_save_load_scale_format(vindex, embedder, tmp_path):
    """At-scale artifact format: vectors persist as an uncompressed .npy
    that loads back MEMMAPPED (never a host-RAM copy of the store), refs
    load as an [N, 2] int32 array, and a re-save of a loaded index is a
    no-op for the vector store (already on disk in place)."""
    vindex.save(tmp_path / "vec")
    assert (tmp_path / "vec" / "vectors.npy").exists()
    idx2 = VectorIndex(vindex.config, embedder=embedder)
    idx2.load(tmp_path / "vec")
    assert isinstance(idx2._vectors, np.memmap)
    assert isinstance(idx2._refs, np.ndarray)
    assert idx2._refs.shape == (len(DOCS), 2)
    np.testing.assert_allclose(
        np.asarray(idx2._vectors), np.asarray(vindex._vectors), rtol=1e-6
    )
    hits = idx2.search(DOCS[3], top_k=1)
    assert hits[0].row == 3 and hits[0].paragraph_index == 3 % 3
    # re-save in place: must not rewrite (or truncate!) the backing file
    mtime = (tmp_path / "vec" / "vectors.npy").stat().st_mtime_ns
    idx2.save(tmp_path / "vec")
    idx3 = VectorIndex(vindex.config, embedder=embedder)
    idx3.load(tmp_path / "vec")
    assert idx3.search(DOCS[3], top_k=1)[0].row == 3
    assert (tmp_path / "vec" / "vectors.npy").stat().st_mtime_ns == mtime


def test_load_legacy_format(vindex, embedder, tmp_path):
    """Round-2 artifacts (vectors embedded in refs.npz) still load."""
    d = tmp_path / "vec"
    vindex.save(d)
    (d / "vectors.npy").unlink()
    np.savez_compressed(
        d / "refs.npz",
        refs=np.asarray(vindex._refs, np.int32),
        vectors=np.asarray(vindex._vectors, np.float32),
    )
    idx2 = VectorIndex(vindex.config, embedder=embedder)
    idx2.load(d)
    assert idx2.size == vindex.size
    assert idx2.search(DOCS[3], top_k=1)[0].row == 3


def test_embed_pending_after_scale_load(vindex, embedder, tmp_path):
    """Incremental adds onto a loaded-at-scale index (ndarray refs +
    read-only memmap vectors) still work: refs concatenate, vectors
    copy-on-grow, new doc retrievable after freeze."""
    vindex.save(tmp_path / "vec")
    idx2 = VectorIndex(vindex.config, embedder=embedder)
    idx2.load(tmp_path / "vec")
    idx2.add_document(99, DOCS[0], 7)
    idx2.freeze()
    assert idx2.size == len(DOCS) + 1
    hits = idx2.search(DOCS[0], top_k=2)
    assert {h.row for h in hits} <= {0, 99}


def test_large_ann_saves_as_mmap_dir(vindex, embedder, tmp_path, monkeypatch):
    """Above the size threshold the ANN persists as the raw-.npy directory
    (ann.mmap/) and npz is removed; shrinking back below re-selects npz
    and removes the stale directory — the two formats never coexist."""
    from trie_semantic_search_tpu.index import vector as vector_mod

    monkeypatch.setattr(vector_mod, "_ANN_MMAP_SAVE_BYTES", 0)
    vindex.save(tmp_path / "vec")
    assert (tmp_path / "vec" / "ann.mmap" / "meta.json").exists()
    assert not (tmp_path / "vec" / "ann.npz").exists()
    idx2 = VectorIndex(vindex.config, embedder=embedder)
    idx2.load(tmp_path / "vec")
    assert idx2.ann.num_vectors == vindex.ann.num_vectors
    assert idx2.search(DOCS[3], top_k=1)[0].row == 3
    # back below the threshold: npz again, stale dir removed
    monkeypatch.setattr(vector_mod, "_ANN_MMAP_SAVE_BYTES", 1 << 60)
    idx2.save(tmp_path / "vec")
    assert (tmp_path / "vec" / "ann.npz").exists()
    assert not (tmp_path / "vec" / "ann.mmap").exists()
