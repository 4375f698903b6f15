"""Multi-chip sharded corpus index on the virtual 8-device mesh."""

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import (
    AnnConfig,
    EmbeddingModelConfig,
    MeshConfig,
    VectorConfig,
)
from trie_semantic_search_tpu.index.sharded import ShardedCorpusIndex
from trie_semantic_search_tpu.index.vector import VectorIndex
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.parallel import make_mesh


def normed(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    return make_mesh(MeshConfig(data_parallel=8, model_parallel=1))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    corpus = normed(rng.standard_normal((500, 64)).astype(np.float32))
    queries = corpus[:8] + 0.01 * rng.standard_normal((8, 64)).astype(np.float32)
    return corpus, normed(queries)


def oracle(q, c, k):
    s = q @ c.T
    i = np.argsort(-s, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(s, i, axis=-1), i


def test_sharded_bf16_matches_oracle(mesh, data):
    corpus, queries = data
    idx = ShardedCorpusIndex(mesh, use_int8=False)
    idx.build(corpus)
    assert idx.num_vectors == 500
    v, i = idx.search_brute(queries, 10)
    _, oi = oracle(queries, corpus, 10)
    overlap = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, oi)])
    assert overlap >= 0.95  # bf16 rounding can flip near-ties


def test_sharded_int8_recall(mesh, data):
    corpus, queries = data
    idx = ShardedCorpusIndex(mesh, use_int8=True)
    idx.build(corpus)
    v, i = idx.search_brute(queries, 10)
    _, oi = oracle(queries, corpus, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, oi)])
    assert recall >= 0.9
    # self-retrieval at rank 1
    assert (i[:, 0] == np.arange(8)).all()


def test_pad_rows_never_surface(mesh):
    """Corpus smaller than shard multiple: pad rows must not appear."""
    rng = np.random.default_rng(6)
    corpus = normed(rng.standard_normal((10, 32)).astype(np.float32))
    idx = ShardedCorpusIndex(mesh, use_int8=True)
    idx.build(corpus)
    v, i = idx.search_brute(corpus[:4], 10)
    assert (i < 10).all() or ((i == -1) & np.isneginf(v)).any()
    valid = i[i >= 0]
    assert valid.max() < 10


def test_vector_index_uses_sharded_on_mesh(mesh):
    docs = [
        "the supreme court held that due process requires notice",
        "the defendant filed a motion to suppress evidence",
        "equal protection forbids racial segregation in schools",
        "freedom of speech is protected by the first amendment",
    ]
    vocab = train_wordpiece_vocab(docs, vocab_size=2048, min_frequency=1)
    emb = Embedder(
        EmbeddingModelConfig(max_sequence_length=32),
        tokenizer=WordPieceTokenizer(vocab),
        model_config=MiniLMConfig(
            vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position=32,
        ),
    )
    vidx = VectorIndex(
        VectorConfig(hnsw=AnnConfig(), dimension=64), embedder=emb, mesh=mesh
    )
    assert isinstance(vidx.ann, ShardedCorpusIndex)
    for row, d in enumerate(docs):
        vidx.add_document(row, d, row)
    vidx.freeze()
    hits = vidx.search(docs[2], top_k=2)
    assert hits and hits[0].row == 2


def test_sharded_save_load_rebuilds(mesh, tmp_path, data):
    corpus, queries = data
    docs_n = corpus.shape[0]
    # build a VectorIndex-compatible state manually
    from trie_semantic_search_tpu.core.config import VectorConfig

    vidx = VectorIndex(VectorConfig(dimension=64), mesh=mesh)
    vidx._vectors = corpus
    vidx._refs = [(r, 0) for r in range(docs_n)]
    vidx.ann.build(corpus)
    vidx.save(tmp_path / "v")

    vidx2 = VectorIndex(VectorConfig(dimension=64), embedder=vidx.embedder, mesh=mesh)
    vidx2.load(tmp_path / "v")
    assert vidx2.ann.num_vectors == docs_n
    v1, i1 = vidx.ann.search_brute(queries, 5)
    v2, i2 = vidx2.ann.search_brute(queries, 5)
    np.testing.assert_array_equal(i1, i2)
