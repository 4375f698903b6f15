"""Flat-boundary escalation: the score-aware fallback for the partitioned
probe path (docs/ROUND5.md tie-audit take 2's open item).

The measured failure mode behind the withdrawn 0.95 min-recall floor
(bench_results/tunefloor_r05.json / tunefloor_r05b.json): a generic query
whose oracle top-k is a wide exact-score tie scattered across partitions
the centroid ranking never probes. Its served top-k boundary is FLAT —
that flatness is the escalation trigger: the query re-runs through the
exact layout stream (reads every partition; cannot miss tie members).

The corpus here reconstructs that geometry deterministically: 8
partitions, each holding one "gem" (score 0.625 vs the probe query) on
top of 64 identical "background" rows (score 0.6171875 — both exactly
representable in bf16, so the rescore keeps the 0.0078 spread). Every
partition centroid is its background direction, so the query's centroid
ranking is uninformative and nprobe=1 finds exactly one gem; the true
top-8 is all 8 gems, one per partition. A ninth partition holds a
"slope" cluster with a wide score spread — the non-flat control.
"""

import uuid
from types import SimpleNamespace

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.index.ann import PartitionedANN
from trie_semantic_search_tpu.index.trie import TrieIndex
from trie_semantic_search_tpu.search.fused import (
    ESCALATE_BUCKET,
    FusedHybridSearch,
)
from trie_semantic_search_tpu.storage.columns import MetadataColumns

D = 64
PER = 64  # background rows per partition
GEM = 0.625  # exact in bf16
BG = 0.6171875  # exact in bf16 (= 79/128)
N_PARTS = 8


def build_geometry():
    """Corpus + injected centroids. Returns (vectors, centroids, gem_rows,
    slope_rows); every row is its own case (row id == case row)."""
    rows = []
    centroids = np.zeros((N_PARTS + 1, D), np.float32)
    bg_y = float(np.sqrt(1.0 - BG * BG))
    gem_rest = float(np.sqrt(1.0 - GEM * GEM - 0.05 * 0.05))
    gem_rows = []
    for p in range(N_PARTS):
        bg = np.zeros(D, np.float32)
        bg[0] = BG
        bg[20 + p] = bg_y
        centroids[p] = bg  # centroid == background direction
        for _ in range(PER):
            rows.append(bg.copy())
        g = np.zeros(D, np.float32)
        g[0] = GEM
        g[20 + p] = 0.05  # pulls the gem to ITS partition's centroid
        g[10 + p] = gem_rest
        gem_rows.append(len(rows))
        rows.append(g)
    centroids[N_PARTS, 1] = 1.0  # slope-cluster centroid = e1
    slope_rows = []
    for j in range(8):
        t = 0.1 + 0.15 * j  # scores cos(t): 0.995 .. 0.408 — wide spread
        s = np.zeros(D, np.float32)
        s[1] = np.cos(t)
        s[31] = np.sin(t)
        slope_rows.append(len(rows))
        rows.append(s)
    return np.stack(rows), centroids, gem_rows, slope_rows


def q_flat():
    q = np.zeros(D, np.float32)
    q[0] = 1.0
    return q


def q_slope():
    q = np.zeros(D, np.float32)
    q[1] = 1.0
    return q


@pytest.fixture(scope="module")
def geo_stack():
    vecs, centroids, gem_rows, slope_rows = build_geometry()
    n = len(vecs)
    cfg = Config()
    cfg.vector.hnsw.pad_replicas = False  # replicas would leak gems into
    # other partitions and make the controlled probe-miss non-deterministic
    ann = PartitionedANN(cfg.vector.hnsw)
    ann.build(vecs, reuse_centroids=centroids)
    ann.tuned_nprobe = 1  # the audited regime: centroid ranking decides all
    vidx = SimpleNamespace(
        vectors=vecs,
        refs=np.stack([np.arange(n), np.zeros(n)], axis=1).astype(np.int32),
        ann=ann,
        config=cfg.vector,
    )
    columns = MetadataColumns.build(
        [(str(uuid.uuid4()), "courtA", "2000-01-01") for _ in range(n)]
    )
    trie = TrieIndex()
    trie.insert_case_name("dummy case v. nobody", 0)
    trie.freeze()
    return trie, vidx, columns, gem_rows, slope_rows


def run(fused, qs, k=8, **overrides):
    B = len(qs)
    args = dict(
        court_filters=[None] * B,
        date_ranges=[None] * B,
        min_similarity=[0.1] * B,
        exact_weight=[0.0] * B,
        k=k,
    )
    args.update(overrides)
    return fused.query_batch(
        np.stack(qs), [f"probe query {i}" for i in range(B)], **args
    )


def test_probe_path_misses_flat_ties_without_escalation(geo_stack):
    """Baseline (escalation off): nprobe=1 recovers ONE gem and the served
    boundary is flat — the exact shape of the audited recall losses."""
    trie, vidx, columns, gem_rows, _ = geo_stack
    fused = FusedHybridSearch(trie, vidx, columns, ann_mode="partitioned")
    assert fused.flat_escalate_eps == 0.0
    v, i, cases, src = run(fused, [q_flat()])
    got = {int(c) for c in cases[0] if c >= 0}
    assert len(got) == 8
    assert len(got & set(gem_rows)) < len(gem_rows)  # the probe miss
    spread = float(v[0, 0] - v[0, -1])
    assert spread <= 0.02 * abs(float(v[0, 0]))  # ...and it is flat
    assert fused.escalated == 0


def test_escalation_recovers_flat_ties(geo_stack):
    """With escalation on, the flagged query re-runs through the exact
    stream and serves the full scattered tie — recall 8/8 vs 1/8."""
    trie, vidx, columns, gem_rows, _ = geo_stack
    fused = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", flat_escalate_eps=0.02
    )
    v, i, cases, src = run(fused, [q_flat()])
    assert {int(c) for c in cases[0] if c >= 0} == set(gem_rows)
    assert np.allclose(np.asarray(v[0], np.float32), GEM, atol=2e-3)
    assert fused.escalated == 1
    # escalated chunk indices are GLOBAL corpus rows of the right case
    refs = np.asarray(vidx.refs)
    for chunk, case in zip(i[0], cases[0]):
        if case >= 0 and chunk >= 0:
            assert refs[int(chunk), 0] == int(case)


def test_non_flat_queries_do_not_escalate(geo_stack):
    """The sloped control query keeps its probe-path result untouched and
    costs no extra dispatch."""
    trie, vidx, columns, _, slope_rows = geo_stack
    fused = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", flat_escalate_eps=0.02
    )
    v, i, cases, src = run(fused, [q_slope()])
    assert fused.escalated == 0
    got = [int(c) for c in cases[0] if c >= 0]
    assert set(got) == set(slope_rows)
    assert got[0] == slope_rows[0]  # highest-scoring slope row leads


def test_mixed_batch_escalates_only_flagged_rows(geo_stack):
    """Non-flagged rows pass through bit-identical to the escalation-off
    run; only the flat row is re-dispatched."""
    trie, vidx, columns, gem_rows, slope_rows = geo_stack
    base = FusedHybridSearch(trie, vidx, columns, ann_mode="partitioned")
    esc = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", flat_escalate_eps=0.02
    )
    qs = [q_slope(), q_flat(), q_slope()]
    bv, bi, bc, bs = run(base, qs)
    ev, ei, ec, es = run(esc, qs)
    assert esc.escalated == 1
    for row in (0, 2):  # control rows: untouched
        np.testing.assert_array_equal(bc[row], ec[row])
        np.testing.assert_array_equal(bv[row], ev[row])
        np.testing.assert_array_equal(bs[row], es[row])
    assert {int(c) for c in ec[1] if c >= 0} == set(gem_rows)


def test_escalation_groups_past_bucket(geo_stack, monkeypatch):
    """More flagged queries than ESCALATE_BUCKET re-dispatch in groups —
    every one recovers the full tie set. (The break-even pick is forced
    off: at this tiny P a 10-query batch would stream outright, which is
    itself exact — escalation only ever runs behind the probe path.)"""
    trie, vidx, columns, gem_rows, _ = geo_stack
    fused = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", flat_escalate_eps=0.02
    )
    monkeypatch.setattr(fused, "_layout_brute_batch", lambda batch: False)
    B = ESCALATE_BUCKET + 2
    v, i, cases, src = run(fused, [q_flat()] * B)
    assert fused.escalated == B
    for b in range(B):
        assert {int(c) for c in cases[b] if c >= 0} == set(gem_rows)


def test_underfilled_results_do_not_escalate(geo_stack):
    """An underfilled top-k (here: a court filter leaving zero passing
    rows) is a filter property, not the scattered-tie miss — no
    escalation dispatch."""
    trie, vidx, columns, _, _ = geo_stack
    fused = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", flat_escalate_eps=0.02
    )
    v, i, cases, src = run(
        fused, [q_flat()], court_filters=[["no-such-court"]]
    )
    assert fused.escalated == 0
    assert (np.asarray(cases[0]) < 0).all()


def test_warm_escalation_precompiles_stream_programs(geo_stack):
    """warm_escalation runs both filter variants without error (the
    serve-time guarantee: a flat boundary never pays jit latency)."""
    trie, vidx, columns, gem_rows, _ = geo_stack
    fused = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", flat_escalate_eps=0.02
    )
    fused.warm_escalation(k=8, overfetch=4, recall_target=1.0)
    assert fused.escalated == 0  # warmup is not an escalation
    v, i, cases, src = run(fused, [q_flat()])
    assert {int(c) for c in cases[0] if c >= 0} == set(gem_rows)


def test_sharded_escalation_recovers_flat_ties(geo_stack, monkeypatch):
    """The multi-chip twin: the sharded probe path flags the same flat
    boundary and the ICI-merge stream recovers the full tie set."""
    from trie_semantic_search_tpu.core.config import MeshConfig
    from trie_semantic_search_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("TSS_PROBE_INTERPRET", "1")
    trie, vidx, columns, gem_rows, slope_rows = geo_stack
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    fused = FusedHybridSearch(
        trie, vidx, columns, ann_mode="partitioned", mesh=mesh,
        flat_escalate_eps=0.02,
    )
    assert fused.ann_mode == "sharded-partitioned"
    assert fused.sp_nprobe == 1
    v, i, cases, src = run(fused, [q_flat(), q_slope()])
    assert fused.escalated == 1
    assert {int(c) for c in cases[0] if c >= 0} == set(gem_rows)
    assert {int(c) for c in cases[1] if c >= 0} == set(slope_rows)
