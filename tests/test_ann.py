"""Partitioned ANN tests: recall vs exact brute-force oracle (SURVEY.md §4
golden-recall tests), determinism, persistence, k-means sanity."""

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import AnnConfig
from trie_semantic_search_tpu.index.ann import PartitionedANN, _auto_partitions
from trie_semantic_search_tpu.index.kmeans import assign_clusters, train_kmeans


def normed(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    # clustered data (ANN-friendly, like real embeddings)
    centers = normed(rng.standard_normal((32, 64)).astype(np.float32))
    pts = centers[rng.integers(0, 32, 4000)] + 0.25 * rng.standard_normal(
        (4000, 64)
    ).astype(np.float32)
    return normed(pts)


@pytest.fixture(scope="module")
def queries(corpus):
    rng = np.random.default_rng(4)
    idx = rng.integers(0, corpus.shape[0], 32)
    q = corpus[idx] + 0.05 * rng.standard_normal((32, corpus.shape[1])).astype(
        np.float32
    )
    return normed(q)


@pytest.fixture(scope="module")
def built(corpus):
    ann = PartitionedANN(AnnConfig(num_partitions=64, num_probes=8))
    ann.build(corpus, seed=0)
    return ann


def oracle_topk(q, c, k):
    scores = q @ c.T
    idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


def test_kmeans_centroids_normalised(corpus):
    c = train_kmeans(corpus, 16, iters=5)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-4)
    assign = assign_clusters(corpus, c)
    assert assign.shape == (corpus.shape[0],)
    assert assign.min() >= 0 and assign.max() < 16
    # clusters actually used
    assert len(np.unique(assign)) > 8


def test_auto_partitions():
    assert _auto_partitions(1_000_000) == 1000
    assert _auto_partitions(100) % 8 == 0
    assert _auto_partitions(1) == 8
    # past 1M rows: fixed ~1k-row partitions (fine partitioning probes
    # less data per query at equal recall — round-3 8.4M-row sweep)
    assert _auto_partitions(8_388_608) == 8192
    assert _auto_partitions(4_000_000) == 3912  # ceil(N/1024) to mult of 8


def test_brute_matches_oracle(built, corpus, queries):
    v, i = built.search_brute(queries, 10)
    ov, oi = oracle_topk(queries, corpus, 10)
    # bf16 scoring: indices should overlap >= 95%, scores close
    overlap = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, oi)])
    assert overlap >= 0.95
    np.testing.assert_allclose(v, ov, atol=2e-2)


def test_partitioned_recall_at_10_after_tuning(built, corpus, queries):
    """North-star: recall@10 ≥ 0.95 vs exact f32 oracle after nprobe
    tuning. Recall is TIE-AWARE (a result scoring within eps of the
    oracle's k-th score is a correct k-NN answer — the index-overlap
    definition undercounts whenever equal-scoring rows exist, which real
    corpora guarantee via duplicate text); plain index overlap is asserted
    as a looser sanity floor."""
    nprobe = built.tune_nprobe(queries, k=10, target_recall=0.95)
    assert 1 <= nprobe <= 64
    ov, oi = oracle_topk(queries, corpus, 10)
    v, i = built.search(queries, 10, nprobe=nprobe)
    tie_recall = float(np.mean(v >= ov[:, 9:10] - 1e-3))
    assert tie_recall >= 0.95, f"recall@10 = {tie_recall} at nprobe={nprobe}"
    overlap = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, oi)])
    assert overlap >= 0.9, f"index overlap {overlap} at nprobe={nprobe}"
    # tuned value persisted as the per-artifact default (NOT written into
    # the caller's shared config — see test_load_does_not_mutate_config)
    assert built.tuned_nprobe == nprobe
    assert built.default_nprobe == min(nprobe, built.centroids.shape[0])


def test_partitioned_deterministic(built, queries):
    v1, i1 = built.search(queries, 10)
    v2, i2 = built.search(queries, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(v1, v2)


def test_full_probe_equals_brute(corpus, queries):
    """nprobe = P (scan everything) must reproduce exact top-k."""
    ann = PartitionedANN(AnnConfig(num_partitions=16, rescore_factor=8))
    ann.build(corpus, seed=0)
    _, oi = oracle_topk(queries, corpus, 5)
    _, i = ann.search(queries, 5, nprobe=16)
    recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i, oi)])
    assert recall >= 0.99


def test_search_small_k_and_small_corpus():
    rng = np.random.default_rng(0)
    tiny = normed(rng.standard_normal((20, 16)).astype(np.float32))
    ann = PartitionedANN(AnnConfig(num_partitions=8, num_probes=8))
    ann.build(tiny)
    v, i = ann.search(tiny[:3], 5)
    assert i.shape == (3, 5)
    # each query's own vector is its top hit
    assert (i[:, 0] == np.arange(3)).all()


def test_memory_less_than_hnsw_equal_budget(built):
    """Equal-memory accounting: int8+bf16+rows < f32 + M=16 graph links."""
    st = built.get_stats()
    d = 64
    hnsw_bytes = st.num_vectors * (4 * d + 16 * 8)
    assert st.nbytes_total < hnsw_bytes


def test_save_load_roundtrip(built, queries, tmp_path):
    p = tmp_path / "ann.npz"
    built.save(p)
    loaded = PartitionedANN.load(p, built.config)
    # explicit nprobe: the module-scoped fixture may carry a tuned_nprobe
    # from the tuning test, which load() does not adopt when the caller's
    # config pins num_probes — this test is about artifact equality
    v1, i1 = built.search(queries, 10, nprobe=8)
    v2, i2 = loaded.search(queries, 10, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    assert loaded.num_vectors == built.num_vectors


def test_tuned_nprobe_persists_through_save_load(built, queries, tmp_path):
    """tune_nprobe sets the per-artifact tuned_nprobe; save must persist
    it so a fresh-config load doesn't regress to the default_nprobe
    heuristic (~P/10 — a ~10x over-probe at CAP-scale partitionings)."""
    nprobe = built.tune_nprobe(queries, k=10, target_recall=0.95)
    p = tmp_path / "ann.npz"
    built.save(p)
    loaded = PartitionedANN.load(p)  # fresh default config
    assert loaded.tuned_nprobe == nprobe
    assert loaded.default_nprobe == min(nprobe, loaded.centroids.shape[0])
    # an explicit caller override still wins
    forced = PartitionedANN.load(p, AnnConfig(num_probes=3))
    assert forced.default_nprobe == 3


def test_load_does_not_mutate_config(built, queries, tmp_path):
    """Adopting a persisted tuned nprobe must NOT write into the caller's
    shared AnnConfig: VectorIndex passes its process-wide config.hnsw to
    load(), and a stale artifact value leaking into it would poison the
    next rebuild (server reindex builds a new ANN from the same config
    with no tuning pass — it would inherit the OLD index's nprobe)."""
    nprobe = built.tune_nprobe(queries, k=10, target_recall=0.95)
    p = tmp_path / "ann.npz"
    built.save(p)
    shared = AnnConfig()  # stands in for the process-wide config.hnsw
    loaded = PartitionedANN.load(p, shared)
    assert loaded.tuned_nprobe == nprobe
    assert shared.num_probes == 0  # untouched
    # a rebuild from the same shared config starts clean
    fresh = PartitionedANN(shared)
    assert fresh.tuned_nprobe == 0


def test_unbuilt_raises():
    from trie_semantic_search_tpu.core.errors import VectorIndexConstructionFailed

    with pytest.raises(VectorIndexConstructionFailed):
        PartitionedANN().search(np.zeros((1, 8), np.float32), 5)
    with pytest.raises(VectorIndexConstructionFailed):
        PartitionedANN().build(np.zeros((0, 8), np.float32))


def test_bf16_block_path(corpus, queries):
    """quantize_int8=False stores bf16 blocks — higher precision recall."""
    ann = PartitionedANN(AnnConfig(num_partitions=16, num_probes=16,
                                   quantize_int8=False))
    ann.build(corpus, seed=0)
    _, oi = oracle_topk(queries, corpus, 10)
    _, i = ann.search(queries, 10, nprobe=16)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, oi)])
    assert recall >= 0.99  # full probe + bf16 ≈ exact


def test_bf16_block_save_load(corpus, queries, tmp_path):
    """Review regression: bf16-block indexes must round-trip through npz
    (bfloat16 previously saved as raw void dtype and crashed on load)."""
    ann = PartitionedANN(AnnConfig(num_partitions=16, num_probes=16,
                                   quantize_int8=False))
    ann.build(corpus, seed=0)
    p = tmp_path / "bf16.npz"
    ann.save(p)
    loaded = PartitionedANN.load(p, ann.config)
    v1, i1 = ann.search(queries, 5, nprobe=16)
    v2, i2 = loaded.search(queries, 5, nprobe=16)
    np.testing.assert_array_equal(i1, i2)
    st = loaded.get_stats()
    assert st.nbytes_int8 >= loaded.part_int8.size * 2  # bf16 = 2 bytes


def test_search_probe_kernel_matches_xla_path(monkeypatch):
    """PartitionedANN.search through the scalar-prefetch probe kernel
    (interpret mode) agrees with the XLA gather path — the recall harness
    measures the program that serves (round-2 verdict weak item 8)."""
    rng = np.random.default_rng(4)
    n, d, P = 8192, 32, 8
    centers = rng.standard_normal((P, d)).astype(np.float32)
    v = centers[rng.integers(0, P, n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    cfg = AnnConfig(num_partitions=P, kmeans_iters=4)
    a = PartitionedANN(cfg)
    a.build(v)
    assert int(a.part_rows.shape[1]) % 128 == 0  # kernel-eligible capacity
    q = v[rng.integers(0, n, 4)]
    vx, ix = a.search(q, 10, nprobe=P)  # XLA path (CPU backend)
    monkeypatch.setenv("TSS_PROBE_INTERPRET", "1")
    a._search_fn = None  # drop the cached XLA program
    vk, ik = a.search(q, 10, nprobe=P)
    for b in range(4):
        assert ix[b][0] == ik[b][0]
        overlap = len(set(ix[b].tolist()) & set(ik[b].tolist())) / 10
        assert overlap >= 0.9, (b, ix[b], ik[b])
    np.testing.assert_allclose(vx[:, 0], vk[:, 0], atol=1e-2)


def test_ann_segmented_rescore_store_matches_single(corpus, queries, tmp_path):
    """With the rescore corpus forced into multiple segments (the CAP-scale
    store under Mosaic's per-input addressing cap), search, brute search
    and save/load all agree with the unsegmented index."""
    from trie_semantic_search_tpu.ops import pallas_scan as psm

    cfg = AnnConfig(num_partitions=16, kmeans_iters=4)
    a = PartitionedANN(cfg)
    a.build(corpus)
    assert len(a.corpus_bf16) == 1
    v1, i1 = a.search(queries, 10, nprobe=16)
    bv1, bi1 = a.search_brute(queries, 10)

    old = psm.GATHER_SEG_BYTES
    try:
        psm.GATHER_SEG_BYTES = corpus.shape[0] // 3 * corpus.shape[1] * 2
        b = PartitionedANN(AnnConfig(num_partitions=16, kmeans_iters=4))
        b.build(corpus)
        assert len(b.corpus_bf16) > 1
        v2, i2 = b.search(queries, 10, nprobe=16)
        bv2, bi2 = b.search_brute(queries, 10)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(v1, v2, atol=1e-3)
        np.testing.assert_array_equal(bi1, bi2)
        np.testing.assert_allclose(bv1, bv2, atol=1e-3)
        p = tmp_path / "seg_ann.npz"
        b.save(p)
        c = PartitionedANN.load(p, AnnConfig(num_partitions=16))
        assert len(c.corpus_bf16) > 1  # re-segmented on load
        v3, i3 = c.search(queries, 10, nprobe=16)
        np.testing.assert_array_equal(i2, i3)
    finally:
        psm.GATHER_SEG_BYTES = old


def test_brute_pad_rows_masked_on_all_negative_scores():
    """The rescore store zero-pads segments to the 32-row alignment lcm;
    pad rows score 0.0, which would outrank ALL-NEGATIVE true scores.
    search_brute must never return a pad row (row id >= num_vectors)."""
    rng = np.random.default_rng(7)
    # every corpus vector in the +e0 half-space, query in -e0: all true
    # scores negative, pad rows (zeros) would score 0.0 and win unmasked
    n, d = 100, 64  # pads to 128 rows
    base = np.zeros((n, d), np.float32)
    base[:, 0] = 1.0
    base += 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    c = normed(base)
    q = np.zeros((4, d), np.float32)
    q[:, 0] = -1.0
    ann = PartitionedANN(AnnConfig(num_partitions=8, num_probes=8))
    ann.build(c, seed=0)
    assert sum(int(s.shape[0]) for s in ann.corpus_bf16) == 128
    v, i = ann.search_brute(q, 10)
    assert (i >= 0).all() and (i < n).all()
    assert (v < 0).all()


def test_build_streaming_parity_with_build(corpus):
    """build_streaming over a memmap must freeze bit-identical arrays to
    build() — including when the overflow-rebalance engages (same helper
    drives both)."""
    import tempfile
    from pathlib import Path

    cfg = AnnConfig(num_partitions=64, num_probes=8)
    a = PartitionedANN(cfg)
    a.build(corpus, seed=0)
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "v.npy"
        np.save(p, corpus)
        mm = np.load(p, mmap_mode="r")
        b = PartitionedANN(AnnConfig(num_partitions=64, num_probes=8))
        # same centroids -> layout must be bit-identical (k-means itself
        # samples differently in the two entry points)
        b.build_streaming(mm, seed=0, slab_rows=777,  # uneven slabs
                          reuse_centroids=np.asarray(a.centroids))
    np.testing.assert_array_equal(
        np.asarray(a.part_rows), np.asarray(b.part_rows))
    np.testing.assert_array_equal(
        np.asarray(a.part_int8), np.asarray(b.part_int8))
    np.testing.assert_array_equal(
        np.asarray(a.part_scale), np.asarray(b.part_scale))


def test_build_streaming_emit_dir_parity_and_adoption(corpus, tmp_path):
    """``build_streaming(emit_dir=...)`` (round-4 VERDICT item 4: finalize
    RSS O(slab), not O(output)) must fill the same frozen layout as the
    in-RAM emit — and ``save_dir`` must ADOPT the emit directory with a
    rename (no rewrite), round-tripping through ``load_dir``."""
    cfg = AnnConfig(num_partitions=64, num_probes=8)
    a = PartitionedANN(cfg)
    a.build(corpus, seed=0)
    p = tmp_path / "v.npy"
    np.save(p, corpus)
    mm = np.load(p, mmap_mode="r")
    b = PartitionedANN(AnnConfig(num_partitions=64, num_probes=8))
    emit = tmp_path / "ann.mmap.emit"
    b.build_streaming(mm, seed=0, slab_rows=777,  # uneven slabs
                      reuse_centroids=np.asarray(a.centroids),
                      emit_dir=emit)
    np.testing.assert_array_equal(
        np.asarray(a.part_rows), np.asarray(b.part_rows))
    np.testing.assert_array_equal(
        np.asarray(a.part_int8), np.asarray(b.part_int8))
    np.testing.assert_array_equal(
        np.asarray(a.part_scale), np.asarray(b.part_scale))
    # bf16 rescore segments: identical geometry AND bits
    assert len(a.corpus_bf16) == len(b.corpus_bf16)
    for sa, sb in zip(a.corpus_bf16, b.corpus_bf16):
        np.testing.assert_array_equal(
            np.asarray(sa).view(np.uint16), np.asarray(sb).view(np.uint16))
    out = tmp_path / "ann.mmap"
    b.save_dir(out)
    assert not emit.exists(), "save_dir must rename (adopt), not copy"
    c = PartitionedANN.load_dir(
        out, AnnConfig(num_partitions=64, num_probes=8))
    np.testing.assert_array_equal(
        np.asarray(b.part_rows), np.asarray(c.part_rows))
    assert c.num_vectors == b.num_vectors
    q = corpus[:4]
    _, ib = b.search(q, 5)
    _, ic = c.search(q, 5)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(ic))
    # a second save_dir (no emit pending) still works: normal tmp+rename
    b.save_dir(tmp_path / "ann2.mmap")
    assert (tmp_path / "ann2.mmap" / "meta.json").exists()


def test_emit_dir_small_npz_save_cleans_up(corpus, tmp_path):
    """A small artifact after an emit build takes the npz path — the
    unadopted emit directory must not leak."""
    emit = tmp_path / "emit"
    b = PartitionedANN(AnnConfig(num_partitions=64, num_probes=8))
    b.build_streaming(corpus, seed=0, emit_dir=emit)
    assert emit.exists()
    b.save(tmp_path / "ann.npz")
    assert not emit.exists()
    c = PartitionedANN.load(
        tmp_path / "ann.npz", AnnConfig(num_partitions=64, num_probes=8))
    np.testing.assert_array_equal(
        np.asarray(b.part_rows), np.asarray(c.part_rows))


def test_emit_dir_stale_dir_is_replaced(corpus, tmp_path):
    """A stale emit dir from a SIGKILLed prior run (different segment
    count / partial files) must not corrupt the rebuild."""
    emit = tmp_path / "emit"
    emit.mkdir()
    (emit / "rescore_7.npy").write_bytes(b"garbage")
    b = PartitionedANN(AnnConfig(num_partitions=64, num_probes=8))
    b.build_streaming(corpus, seed=0, emit_dir=emit)
    b.save_dir(tmp_path / "ann.mmap")
    meta = (tmp_path / "ann.mmap" / "meta.json").read_text()
    import json as _json

    assert _json.loads(meta)["rescore_segments"] == 1
    assert not (tmp_path / "ann.mmap" / "rescore_7.npy").exists()


def _dup_heavy_corpus(n=4096, dups=2048, d=64, seed=9):
    """Half the corpus is ONE repeated vector (the CAP-scale failure mode:
    boilerplate sentences embed identically, so one k-means cluster holds
    a huge duplicate group)."""
    rng = np.random.default_rng(seed)
    uniq = normed(rng.standard_normal((n - dups, d)).astype(np.float32))
    dup = normed(rng.standard_normal((1, d)).astype(np.float32))
    return np.concatenate([np.repeat(dup, dups, axis=0), uniq])


def test_overflow_cap_bounds_capacity_and_memory():
    """A giant duplicate cluster must NOT size every partition's capacity:
    total slots stay <= ~overalloc*N (aligned), vs the uncapped layout
    where m == dup-group size would give P*m ~ 16x N here."""
    c = _dup_heavy_corpus()
    n = len(c)
    cfg = AnnConfig(num_partitions=32, num_probes=8, partition_overalloc=2.0)
    ann = PartitionedANN(cfg)
    ann.build(c, seed=0)
    P, m = np.asarray(ann.part_rows).shape
    from trie_semantic_search_tpu.index.ann import _capacity_cap

    cap = _capacity_cap(n, 32, 2.0)
    assert cap < 2048, cap  # far below the 2048-row duplicate group
    assert m <= -(-cap // 128) * 128, (m, cap)
    # every row landed at least once; pad replicas may add a SECOND copy
    # (never more) in a different partition, filling otherwise-dead slots
    rows = np.asarray(ann.part_rows)
    flat = rows[rows >= 0]
    np.testing.assert_array_equal(np.unique(flat), np.arange(n))
    per_row = np.bincount(flat, minlength=n)
    assert per_row.max() <= 2, int(per_row.max())
    # a replica never shares its row's own partition
    for p in range(rows.shape[0]):
        in_p = rows[p][rows[p] >= 0]
        assert len(np.unique(in_p)) == len(in_p), f"partition {p} dupes"


def test_overflow_cap_recall_on_unique_rows():
    """Reassigned duplicate rows must not break retrieval of the unique
    rows (they stay in their own partitions), and the duplicate vector
    itself must still be findable."""
    c = _dup_heavy_corpus()
    cfg = AnnConfig(num_partitions=32, num_probes=8, partition_overalloc=2.0)
    ann = PartitionedANN(cfg)
    ann.build(c, seed=0)
    rng = np.random.default_rng(11)
    qidx = rng.integers(2048, len(c), 16)  # unique-row queries
    q = normed(c[qidx] + 0.03 * rng.standard_normal((16, 64)).astype(np.float32))
    nprobe = ann.tune_nprobe(q, k=10, target_recall=0.95)
    _, oi = oracle_topk(q, c, 10)
    _, i = ann.search(q, 10, nprobe=nprobe)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, oi)])
    assert recall >= 0.9, recall
    # duplicate-vector query: at least half the top-10 are duplicate rows
    _, di = ann.search(c[:1], 10, nprobe=nprobe)
    assert (di[0] < 2048).sum() >= 5


def test_overflow_rebalance_deterministic():
    c = _dup_heavy_corpus()
    cfg = AnnConfig(num_partitions=32, num_probes=8, partition_overalloc=2.0)
    a, b = PartitionedANN(cfg), PartitionedANN(cfg)
    a.build(c, seed=0)
    b.build(c, seed=0)
    np.testing.assert_array_equal(
        np.asarray(a.part_rows), np.asarray(b.part_rows))


def test_tune_nprobe_terminates_on_tie_heavy_corpus():
    """Index-based recall is ill-defined under duplicate-score ties (the
    probe path and brute oracle return different equal-scoring rows); the
    score-based tuner must settle on a small nprobe instead of chasing
    unreachable index overlap out to nprobe ~ P."""
    c = _dup_heavy_corpus()
    ann = PartitionedANN(AnnConfig(num_partitions=64, num_probes=0))
    ann.build(c, seed=0)
    q = c[:8]  # duplicate-vector queries: maximal ties
    nprobe = ann.tune_nprobe(q, k=10, target_recall=0.95)
    assert nprobe <= 16, nprobe


def test_search_full_probe_routes_to_brute():
    """nprobe covering the whole corpus returns the exact scan's results
    (and never builds a [B, nprobe] probe program)."""
    c = _dup_heavy_corpus(n=1024, dups=256)
    ann = PartitionedANN(AnnConfig(num_partitions=16, num_probes=8))
    ann.build(c, seed=0)
    q = normed(np.asarray(c[300:304]))
    vb, ib = ann.search_brute(q, 10)
    v, i = ann.search(q, 10, nprobe=16)  # nprobe == P
    np.testing.assert_array_equal(i, ib)
    np.testing.assert_allclose(v, vb, rtol=1e-6)


def test_save_dir_load_dir_roundtrip(built, queries, tmp_path):
    """Raw-.npy directory format (large-artifact path): bit-identical
    search results and zero DEFLATE work on load (round-3 VERDICT weak
    item 6 — npz decompress dominated the 5M artifact's 242.6 s reload)."""
    d = tmp_path / "ann.mmap"
    built.save_dir(d)
    loaded = PartitionedANN.load_dir(d, built.config)
    v1, i1 = built.search(queries, 10, nprobe=8)
    v2, i2 = loaded.search(queries, 10, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    assert loaded.num_vectors == built.num_vectors
    # bf16 rescore segments persisted as uint16 bit views: exact bits
    assert len(loaded.corpus_bf16) == len(built.corpus_bf16)
    for a, b in zip(built.corpus_bf16, loaded.corpus_bf16):
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16)
        )


def test_save_dir_bf16_blocks_roundtrip(corpus, queries, tmp_path):
    ann = PartitionedANN(AnnConfig(num_partitions=16, num_probes=16,
                                   quantize_int8=False))
    ann.build(corpus, seed=0)
    d = tmp_path / "bf16.mmap"
    ann.save_dir(d)
    loaded = PartitionedANN.load_dir(d, ann.config)
    v1, i1 = ann.search(queries, 5, nprobe=16)
    v2, i2 = loaded.search(queries, 5, nprobe=16)
    np.testing.assert_array_equal(i1, i2)
    assert loaded.part_int8.dtype == ann.part_int8.dtype


def test_save_dir_tuned_nprobe_persists(built, queries, tmp_path):
    nprobe = built.tune_nprobe(queries, k=10, target_recall=0.95)
    d = tmp_path / "ann.mmap"
    built.save_dir(d)
    loaded = PartitionedANN.load_dir(d)
    assert loaded.tuned_nprobe == nprobe
    forced = PartitionedANN.load_dir(d, AnnConfig(num_probes=3))
    assert forced.default_nprobe == 3


def test_save_dir_corrupt_raises(built, tmp_path):
    from trie_semantic_search_tpu.core.errors import IndexCorrupted

    d = tmp_path / "ann.mmap"
    built.save_dir(d)
    (d / "part_int8.npy").unlink()
    with pytest.raises(IndexCorrupted):
        PartitionedANN.load_dir(d, built.config)


# -- pad replicas + dedup k-means (round-5 floor fix) ------------------------


def test_search_results_never_contain_duplicate_rows():
    """A replicated layout probed through BOTH of a row's partitions must
    dedup: every query's result rows are distinct (or -1 padding)."""
    c = _dup_heavy_corpus()
    ann = PartitionedANN(AnnConfig(num_partitions=32, num_probes=8))
    ann.build(c, seed=0)
    assert ann._replicated  # the fixture layout must exercise replicas
    q = normed(c[::37] + 0.01)
    _, i = ann.search(q, 10, nprobe=8)
    for r in np.asarray(i):
        real = r[r >= 0]
        assert len(np.unique(real)) == len(real), r


def test_pad_replicas_roundtrip_and_flag_persistence(tmp_path):
    c = _dup_heavy_corpus(n=1024, dups=256)
    ann = PartitionedANN(AnnConfig(num_partitions=16, num_probes=4))
    ann.build(c, seed=0)
    ann.save(tmp_path / "a.npz")
    back = PartitionedANN.load(tmp_path / "a.npz")
    assert back._replicated == ann._replicated
    np.testing.assert_array_equal(
        np.asarray(back.part_rows), np.asarray(ann.part_rows)
    )
    ann.save_dir(tmp_path / "adir")
    back2 = PartitionedANN.load_dir(tmp_path / "adir")
    assert back2._replicated == ann._replicated


def test_pad_replicas_improve_recall_at_fixed_nprobe():
    """The round-5 floor failure: rows scattered by overflow rebalancing
    (or sitting on a partition border) are unreachable through centroid
    probing. Replicas in the layout's dead padding slots must lift recall
    at the SAME nprobe, at zero extra slot count."""
    rng = np.random.default_rng(3)
    centers = normed(rng.standard_normal((32, 64)).astype(np.float32))
    corpus = normed(
        centers[rng.integers(0, 32, 4000)]
        + 0.25 * rng.standard_normal((4000, 64)).astype(np.float32)
    )
    qidx = rng.integers(0, 4000, 32)
    queries = normed(
        corpus[qidx] + 0.05 * rng.standard_normal((32, 64)).astype(np.float32)
    )
    ov = np.sort(queries @ corpus.T, axis=-1)[:, ::-1][:, :10]

    recalls = {}
    slots = {}
    for pr in (False, True):
        ann = PartitionedANN(
            AnnConfig(num_partitions=64, num_probes=8, pad_replicas=pr)
        )
        ann.build(corpus, seed=0)
        v, _ = ann.search(queries, 10, nprobe=8)
        recalls[pr] = float(np.mean(v >= ov[:, 9:10] - 1e-3))
        slots[pr] = np.asarray(ann.part_rows).size
    assert slots[True] == slots[False]  # zero extra memory
    assert recalls[True] > recalls[False] + 0.02, recalls


def test_kmeans_dedup_sample_ignores_mega_duplicate_mass():
    """With dedup on, a 75%-duplicate sample trains the same centroids as
    the unique rows alone — the mega group counts once, so it cannot drag
    multiple Lloyd means onto itself."""
    rng = np.random.default_rng(5)
    uniq = normed(rng.standard_normal((512, 32)).astype(np.float32))
    dup = np.repeat(uniq[:1], 1536, axis=0)
    mixed = np.concatenate([dup, uniq])
    c_dedup = train_kmeans(mixed, 16, iters=8, sample=10_000, dedup=True)
    c_uniq = train_kmeans(uniq, 16, iters=8, sample=10_000, dedup=True)
    np.testing.assert_allclose(c_dedup, c_uniq, atol=1e-5)


def test_assign_topc_column0_matches_assign_clusters():
    from trie_semantic_search_tpu.index.kmeans import assign_topc

    rng = np.random.default_rng(7)
    v = normed(rng.standard_normal((500, 32)).astype(np.float32))
    cent = train_kmeans(v, 16, iters=5)
    top = assign_topc(v, cent, 3)
    np.testing.assert_array_equal(top[:, 0], assign_clusters(v, cent))
    # columns are distinct centroids per row
    assert (top[:, 0] != top[:, 1]).all() and (top[:, 1] != top[:, 2]).all()


def test_assign_topc_matches_lax_topk():
    """The iterative masked-argmax top-c (the round-5 replacement for the
    ~17 s/slab ``lax.top_k`` over a P-wide axis) must reproduce top_k's
    values AND its lower-id tie order."""
    import jax.numpy as jnp
    from jax import lax

    from trie_semantic_search_tpu.index.kmeans import assign_topc

    rng = np.random.default_rng(11)
    cent = normed(rng.standard_normal((96, 16)).astype(np.float32))
    # include exact-duplicate centroids so score ties are real
    cent[17] = cent[3]
    cent[88] = cent[3]
    v = normed(rng.standard_normal((257, 16)).astype(np.float32))
    got = assign_topc(v, cent, 6, block=64)  # non-divisible block
    sims = jnp.einsum("nd,pd->np", jnp.asarray(v), jnp.asarray(cent),
                      preferred_element_type=jnp.float32)
    _, want = lax.top_k(sims, 6)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_lloyd_blocked_matches_unblocked():
    """S > _LLOYD_BLOCK takes the blocked scan (the round-5 fix for the
    ~28 s/iteration fused [S, P] Lloyd step). Argmax is per-row, so with
    the same init the blocked result must match the single-block kernel
    to f32 summation-order noise — exercised with real padding (S not
    divisible by the block)."""
    import jax.numpy as jnp

    from trie_semantic_search_tpu.index import kmeans as km

    rng = np.random.default_rng(12)
    centers = normed(rng.standard_normal((8, 16)).astype(np.float32))
    labels = rng.integers(0, 8, km._LLOYD_BLOCK + 1337)
    pts = normed(
        centers[labels]
        + 0.05 * rng.standard_normal((len(labels), 16)).astype(np.float32)
    )
    init = pts[np.random.default_rng(0).choice(len(pts), 8, replace=False)]
    want = np.asarray(
        km._lloyd(jnp.asarray(pts), jnp.asarray(init), 8, 8)
    )
    nb = -(-len(pts) // km._LLOYD_BLOCK)
    pad = nb * km._LLOYD_BLOCK - len(pts)
    xp = np.concatenate([pts, np.zeros((pad, 16), np.float32)])
    valid = np.ones(nb * km._LLOYD_BLOCK, np.float32)
    valid[-pad:] = 0.0
    got = np.asarray(km._lloyd_blocked(
        jnp.asarray(xp.reshape(nb, km._LLOYD_BLOCK, -1)),
        jnp.asarray(valid.reshape(nb, -1)),
        jnp.asarray(init), 8, 8,
    ))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and train_kmeans routes S > block through the blocked path
    c = train_kmeans(pts, 8, iters=4, sample=len(pts), seed=0)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-4)


def test_build_streaming_host_deferred(corpus, tmp_path):
    """``device_resident=False`` (round-5: a no-tune corpus build must not
    pay the ~14 GB HBM transfer just to save): frozen attrs stay host
    arrays, save_dir adopts unchanged, and the first search promotes
    lazily with results identical to the eager build."""
    import jax.numpy as jnp

    cfg = AnnConfig(num_partitions=16, num_probes=4)
    eager = PartitionedANN(cfg)
    eager.build_streaming(corpus, seed=0, slab_rows=1000,
                          emit_dir=tmp_path / "e1")
    lazy = PartitionedANN(cfg)
    lazy.build_streaming(corpus, seed=0, slab_rows=1000,
                         emit_dir=tmp_path / "e2", device_resident=False)
    assert lazy._host_deferred
    assert isinstance(lazy.part_int8, np.ndarray)
    # stats + save work without touching the device
    assert lazy.get_stats().num_vectors == corpus.shape[0]
    lazy.save_dir(tmp_path / "adopted")
    assert not (tmp_path / "e2").exists()
    # first search promotes and matches the eager build bit-for-bit
    q = corpus[:8]
    ve, ie = eager.search(q, k=5)
    vl, il = lazy.search(q, k=5)
    assert not lazy._host_deferred
    assert isinstance(lazy.part_int8, jnp.ndarray)
    np.testing.assert_array_equal(ie, il)
    np.testing.assert_allclose(ve, vl, rtol=0, atol=0)
    # the adopted artifact loads and agrees
    re = PartitionedANN.load_dir(
        tmp_path / "adopted", AnnConfig(num_probes=4)
    )
    vr, ir = re.search(q, k=5)
    np.testing.assert_array_equal(ie, ir)
