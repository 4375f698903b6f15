"""Incremental index updates: append cases without re-embedding old chunks
or retraining partitions; row ids stay stable under append."""

import datetime as dt

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.builder import build_indexes, update_indexes
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

BASE = [
    ("Brown v. Board of Education", "347 U.S. 483 (1954)",
     "Separate educational facilities are inherently unequal."),
    ("Miranda v. Arizona", "384 U.S. 436 (1966)",
     "You have the right to remain silent during interrogation."),
]
NEW = ("Gideon v. Wainwright", "372 U.S. 335 (1963)",
       "The right to counsel is fundamental and essential to fair trials.")


def store_case(storage, name, cit, text):
    meta = CaseMetadata(
        id=new_case_id(), name=name, citation=cit,
        court="Supreme Court of the United States",
        decision_date=dt.date(1960, 1, 1),
    )
    storage.store_case_metadata(meta)
    storage.store_case_text(meta.id, text)
    return meta


@pytest.fixture()
def setup(tmp_path):
    cfg = Config()
    cfg.storage.db_path = str(tmp_path / "db.sqlite")
    cfg.vector.hnsw.num_partitions = 8
    cfg.vector.dimension = 64
    storage = StorageManager(cfg.storage)
    for c in BASE:
        store_case(storage, *c)
    vocab = train_wordpiece_vocab(
        [c[2] for c in BASE] + [NEW[2]], vocab_size=4096, min_frequency=1
    )
    emb = Embedder(cfg.vector.model, tokenizer=WordPieceTokenizer(vocab),
                   model_config=TINY)
    built = build_indexes(storage, cfg, embedder=emb)
    return cfg, storage, built


def test_rows_stable_under_append(setup):
    cfg, storage, built = setup
    old_ids = list(built.columns.case_ids)
    store_case(storage, *NEW)
    from trie_semantic_search_tpu.storage.columns import MetadataColumns

    cols = MetadataColumns.build(storage.fetch_filter_columns())
    assert cols.case_ids[: len(old_ids)] == old_ids  # append-only rows


def test_update_indexes_appends(setup):
    cfg, storage, built = setup
    n_chunks_before = built.report.content_chunks
    embed_calls_before = built.vector.embedder.get_stats()["texts_embedded"]
    store_case(storage, *NEW)
    updated = update_indexes(built, storage, cfg)
    assert updated.report.cases == 3
    assert updated.report.content_chunks > n_chunks_before
    # only the NEW case's chunks were embedded
    embedded = updated.vector.embedder.get_stats()["texts_embedded"]
    assert embedded - embed_calls_before <= 3

    engine = SearchEngine(cfg, storage, updated.trie, updated.vector,
                          updated.columns)
    res = engine.search("gideon v. wainwright")
    assert res and res[0].case_metadata.name == "Gideon v. Wainwright"
    res = engine.search("right to counsel")
    assert any(r.case_metadata.name == "Gideon v. Wainwright" for r in res)
    # old cases still findable
    res = engine.search("miranda v. arizona")
    assert res and res[0].case_metadata.name == "Miranda v. Arizona"


def test_update_indexes_noop_when_no_new_cases(setup):
    cfg, storage, built = setup
    updated = update_indexes(built, storage, cfg)
    assert updated.report.cases == built.report.cases
    assert updated.trie is built.trie


def test_ann_centroid_reuse():
    from trie_semantic_search_tpu.core.config import AnnConfig
    from trie_semantic_search_tpu.index.ann import PartitionedANN

    rng = np.random.default_rng(0)
    v = rng.standard_normal((200, 32)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ann = PartitionedANN(AnnConfig(num_partitions=8, num_probes=8))
    ann.build(v)
    cents = np.asarray(ann.centroids)
    v2 = np.concatenate([v, v[:20] + 0.01])
    v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
    ann.build(v2, reuse_centroids=cents)
    np.testing.assert_allclose(np.asarray(ann.centroids), cents, atol=1e-6)
    assert ann.num_vectors == 220
    _, i = ann.search(v[:5], 3, nprobe=8)
    assert (i[:, 0] == np.arange(5)).all()


def test_incremental_update_after_restart(setup, tmp_path):
    """Round-1 VERDICT item 7 'done' criterion: build → save → reload →
    ingest new case → incremental update → old AND new cases searchable.
    (Previously, update_indexes on reloaded artifacts would freeze() the
    empty builders and silently wipe the loaded tries.)"""
    from trie_semantic_search_tpu.index.builder import (
        BuildReport,
        BuiltIndexes,
        load_artifacts,
        save_artifacts,
    )

    cfg, storage, built = setup
    cfg.trie.index_path = str(tmp_path / "trie")
    cfg.vector.hnsw.index_path = str(tmp_path / "vec")
    save_artifacts(built, cfg)

    # simulate a process restart: reload everything from disk
    trie, vector, columns = load_artifacts(cfg, embedder=built.vector.embedder)
    assert trie._builders_stale

    store_case(storage, *NEW)
    live = BuiltIndexes(trie=trie, vector=vector, columns=columns,
                        report=BuildReport(cases=len(columns)))
    updated = update_indexes(live, storage, cfg)

    engine = SearchEngine(cfg, storage, updated.trie, updated.vector,
                          updated.columns)
    res = engine.search("gideon v. wainwright")
    assert res and res[0].case_metadata.name == "Gideon v. Wainwright"
    # the OLD loaded content survived the incremental freeze
    res = engine.search("miranda v. arizona")
    assert res and res[0].case_metadata.name == "Miranda v. Arizona"
    res = engine.search("brown v. board of education")
    assert res and res[0].case_metadata.name == "Brown v. Board of Education"


def test_freeze_after_bare_reload_is_noop(setup, tmp_path):
    """freeze() on a freshly loaded TrieIndex must not wipe the loaded
    content (guard for the silent-wipe hazard)."""
    from trie_semantic_search_tpu.index.builder import save_artifacts
    from trie_semantic_search_tpu.index.trie import TrieIndex

    cfg, storage, built = setup
    cfg.trie.index_path = str(tmp_path / "trie2")
    cfg.vector.hnsw.index_path = str(tmp_path / "vec2")
    save_artifacts(built, cfg)
    trie = TrieIndex.load_from_disk(cfg.trie.index_path, cfg.trie)
    nodes_before = trie.name_trie.num_nodes
    trie.freeze()  # no inserts since load → must keep the loaded state
    assert trie.name_trie.num_nodes == nodes_before
    assert trie.search("Brown v. Board of Education").exact_matches


def test_builder_frozen_roundtrip_bit_identical():
    """freeze(from_frozen(f)) == f for both builder backends."""
    from trie_semantic_search_tpu.index.trie import (
        FastTrieBuilder,
        FrozenTrie,
        TrieBuilder,
    )

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    inserts = []
    for _ in range(300):
        path = [words[i] for i in rng.integers(0, 40, rng.integers(1, 6))]
        inserts.append((path, int(rng.integers(0, 50)), int(rng.integers(0, 4))))

    for backend in ("py", "native"):
        b = FastTrieBuilder()
        if backend == "py" and b.is_native:
            b._nat = None
            b._py = TrieBuilder()
            b.vocab = b._py.vocab
        for path, row, para in inserts:
            b.insert(path, row, para)
        frozen = b.freeze()

        b2 = FastTrieBuilder()
        if backend == "py" and b2.is_native:
            b2._nat = None
            b2._py = TrieBuilder()
            b2.vocab = b2._py.vocab
        b2.load_frozen(frozen)
        again = b2.freeze()
        for f in FrozenTrie.__dataclass_fields__:
            if f in ("vocab", "id_to_token", "_device_arrays"):
                continue
            np.testing.assert_array_equal(
                getattr(frozen, f), getattr(again, f), err_msg=f"{backend}:{f}"
            )
        assert frozen.vocab == again.vocab

        # incremental insert after rehydration extends, never wipes
        b2.insert(["brand", "new", "path"], 99, 0)
        ext = b2.freeze()
        assert ext.num_postings == frozen.num_postings + 1


def test_encoder_token_weights_persist_through_artifacts(setup, tmp_path):
    """SIF pooling weights are part of the encoder identity: a reload
    that dropped them would embed queries under a different pooling than
    the corpus (silently broken semantic scores)."""
    import numpy as np

    from trie_semantic_search_tpu.index.builder import (
        load_artifacts,
        save_artifacts,
    )

    cfg, storage, built = setup
    cfg.trie.index_path = str(tmp_path / "trie")
    cfg.vector.hnsw.index_path = str(tmp_path / "vec")
    tw = np.linspace(0.2, 1.0, 4096).astype(np.float32)
    built.vector.embedder.set_token_weights(tw)
    save_artifacts(built, cfg)
    loaded = load_artifacts(cfg)
    assert loaded is not None
    emb2 = loaded[1].embedder
    assert emb2.token_weights is not None
    np.testing.assert_array_equal(np.asarray(emb2.token_weights), tw)
    q = "the right to remain silent"
    np.testing.assert_allclose(
        emb2.embed([q]).embedding,
        built.vector.embedder.embed([q]).embedding, rtol=1e-5, atol=1e-6,
    )
    # clearing the weights and re-saving removes the artifact file
    built.vector.embedder.set_token_weights(None)
    save_artifacts(built, cfg)
    assert not (tmp_path / "vec" / "token_weights.npy").exists()
