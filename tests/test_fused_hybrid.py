"""Fused device hybrid step vs the engine's staged path (same corpus,
same semantics: filters, threshold, lexical boost, dedup-by-case)."""

import datetime as dt

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.builder import build_indexes
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.search.fused import FusedHybridSearch
from trie_semantic_search_tpu.storage.store import StorageManager

CASES = [
    ("Mapp v. Ohio", "367 U.S. 643 (1961)", "Supreme Court of the United States",
     dt.date(1961, 6, 19),
     "Evidence obtained by searches in violation of the constitution is "
     "inadmissible in state court proceedings."),
    ("Terry v. Ohio", "392 U.S. 1 (1968)", "Supreme Court of the United States",
     dt.date(1968, 6, 10),
     "A police officer may stop and frisk a person upon reasonable "
     "suspicion of criminal activity without full probable cause."),
    ("People v. Example", "10 Cal. 3d 100 (Cal. 1970)",
     "Supreme Court of California", dt.date(1970, 3, 1),
     "The state rule on evidence suppression follows its own independent "
     "grounds under the state constitution."),
]

TINY = MiniLMConfig(vocab_size=4096, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, max_position=64)


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fused")
    cfg = Config()
    cfg.storage.db_path = str(tmp / "db.sqlite")
    cfg.vector.hnsw.num_partitions = 8
    cfg.vector.dimension = 64
    storage = StorageManager(cfg.storage)
    for name, cit, court, date, text in CASES:
        meta = CaseMetadata(id=new_case_id(), name=name, citation=cit,
                            court=court, decision_date=date)
        storage.store_case_metadata(meta)
        storage.store_case_text(meta.id, text)
    vocab = train_wordpiece_vocab([c[4] for c in CASES], vocab_size=4096,
                                  min_frequency=1)
    emb = Embedder(cfg.vector.model, tokenizer=WordPieceTokenizer(vocab),
                   model_config=TINY)
    built = build_indexes(storage, cfg, embedder=emb)
    fused = FusedHybridSearch(built.trie, built.vector, built.columns)
    return built, fused, emb


def embed(emb, texts):
    return emb.embed(list(texts)).embedding


def test_fused_semantic_self_retrieval(stack):
    built, fused, emb = stack
    qs = [c[4] for c in CASES]
    v, i, cases, src = fused.query_batch(
        embed(emb, qs), qs,
        court_filters=[None] * 3, date_ranges=[None] * 3,
        min_similarity=[0.5] * 3, exact_weight=[2.0] * 3, k=5,
    )
    # each query's own case is the top case via semantic self-retrieval
    # (full sentences exceed the 8-token content window, so no lexical hit)
    assert (cases[:, 0] == np.arange(3)).all()
    assert (v[:, 0] > 0.99).all()


def test_fused_lexical_boost_on_name(stack):
    built, fused, emb = stack
    q = ["mapp v. ohio"]
    v, i, cases, src = fused.query_batch(
        embed(emb, q), q, [None], [None], [0.99], [2.0], k=3,
    )
    # name-trie hit boosts Mapp's representative chunk to 2.0
    assert v[0, 0] == 2.0
    meta_row = cases[0, 0]
    assert meta_row >= 0
    # provenance: the boost came from the case-name trie span
    from trie_semantic_search_tpu.ops.hybrid import SRC_CASE_NAME

    assert src[0, 0] == SRC_CASE_NAME


def test_fused_court_filter(stack):
    built, fused, emb = stack
    q = ["evidence suppression state constitution"]
    v, i, cases, src = fused.query_batch(
        embed(emb, q), q,
        court_filters=[["Supreme Court of California"]],
        date_ranges=[None], min_similarity=[0.0], exact_weight=[2.0], k=5,
    )
    valid = cases[0][cases[0] >= 0]
    cal_rows = {
        r for r, cid in enumerate(built.columns.court_ids)
        if built.columns.court_vocab["Supreme Court of California"] == cid
    }
    assert set(valid.tolist()) <= cal_rows
    assert len(valid) > 0


def test_fused_date_filter(stack):
    built, fused, emb = stack
    q = ["police stop and frisk"]
    v, i, cases, src = fused.query_batch(
        embed(emb, q), q, [None],
        date_ranges=[(dt.date(1965, 1, 1), dt.date(1969, 1, 1))],
        min_similarity=[0.0], exact_weight=[2.0], k=5,
    )
    valid = cases[0][cases[0] >= 0]
    for r in valid:
        d = built.columns.dates[r]
        assert d >= fused.columns.encode_date_range(
            (dt.date(1965, 1, 1), dt.date(1969, 1, 1)))[0]
    assert len(valid) >= 1


def test_fused_filter_excludes_everything(stack):
    built, fused, emb = stack
    q = ["mapp v. ohio"]
    v, i, cases, src = fused.query_batch(
        embed(emb, q), q, [["No Such Court"]], [None], [0.5], [2.0], k=5,
    )
    assert (cases[0] == -1).all()
    assert np.isneginf(v[0]).all()


def test_fused_threshold_masks_semantic_but_not_lexical(stack):
    built, fused, emb = stack
    q = ["mapp v. ohio"]
    # impossible semantic threshold: only the lexical boost can survive
    v, i, cases, src = fused.query_batch(
        embed(emb, q), q, [None], [None], min_similarity=[5.0],
        exact_weight=[2.0], k=5,
    )
    assert v[0, 0] == 2.0  # lexical hit survives
    assert np.isneginf(v[0, 1:]).any() or (cases[0, 1:] >= 0).sum() <= 2


def test_engine_fused_path_matches_staged(stack, tmp_path_factory):
    """use_fused_device_path=True returns the same case ranking as the
    staged path on representative queries."""
    from trie_semantic_search_tpu.search.engine import SearchEngine, SearchQuery
    from trie_semantic_search_tpu.storage.store import StorageManager

    built, fused, emb = stack
    tmp = tmp_path_factory.mktemp("fused_engine")
    cfg = Config()
    cfg.storage.db_path = str(tmp / "db.sqlite")
    cfg.vector.dimension = 64
    storage = StorageManager(cfg.storage)
    for name, cit, court, date, text in CASES:
        meta = CaseMetadata(id=new_case_id(), name=name, citation=cit,
                            court=court, decision_date=date)
        storage.store_case_metadata(meta)
        storage.store_case_text(meta.id, text)
    built2 = build_indexes(storage, cfg, embedder=emb)
    engine = SearchEngine(cfg, storage, built2.trie, built2.vector, built2.columns)

    queries = [
        SearchQuery(query="mapp v. ohio"),
        SearchQuery(query="stop and frisk"),
        SearchQuery(query="evidence suppression",
                    court_filter=["Supreme Court of California"]),
        SearchQuery(query="reasonable suspicion of criminal activity",
                    date_range=(dt.date(1965, 1, 1), dt.date(1969, 1, 1))),
    ]
    cfg.search.use_fused_device_path = False
    staged = [
        [(r.case_metadata.id, r.match_type) for r in rs]
        for rs in engine.search_batch(queries)
    ]
    cfg.search.use_fused_device_path = True
    engine.query_cache.clear()
    fused_res = [
        [(r.case_metadata.id, r.match_type) for r in rs]
        for rs in engine.search_batch(queries)
    ]
    for s_rows, f_rows in zip(staged, fused_res):
        # same top case; same filtered sets
        s_ids = [i for i, _ in s_rows]
        f_ids = [i for i, _ in f_rows]
        assert (s_ids[:1] == f_ids[:1]) or (set(s_ids) == set(f_ids))
        # round-1 VERDICT item 9: match_type parity — both paths must
        # attribute identically for cases they both return
        s_types = dict(s_rows)
        for cid, mtype in f_rows:
            if cid in s_types:
                assert mtype == s_types[cid], (cid, mtype, s_types[cid])


def test_fused_dedup_returns_distinct_cases(stack):
    """ADVICE round 1: device dedup-by-case — k slots hold distinct cases
    even when one case's chunks dominate the chunk-level top-k."""
    built, fused, emb = stack
    q = ["evidence obtained by searches"]
    v, i, cases, src = fused.query_batch(
        embed(emb, q), q, [None], [None], [0.0], [2.0], k=3,
    )
    got = [c for c in cases[0] if c >= 0]
    assert len(got) == len(set(got))
    # with min_sim 0 and 3 cases in corpus, all 3 distinct cases surface
    assert len(set(got)) == 3


def test_fused_missing_date_rows_pass_without_filter(stack):
    """ADVICE round 1 (low): rows with a missing decision_date must pass
    when NO date filter is given (parity with the staged path)."""
    from trie_semantic_search_tpu.storage.columns import MISSING_DATE

    built, fused, emb = stack
    lo, hi = fused.columns.encode_date_range(None)
    assert lo <= int(MISSING_DATE) <= hi


def test_fused_partitioned_matches_brute(stack):
    """fused_partitioned_topk (probe + filtered scan + rescore) returns the
    same cases as the brute fused step when nprobe covers all partitions
    (round-1 VERDICT item 2 — the CAP-scale path, validated exact here)."""
    built, fused_brute, emb = stack
    fused_part = FusedHybridSearch(
        built.trie, built.vector, built.columns, ann_mode="partitioned"
    )
    assert fused_part.ann_mode == "partitioned"
    qs = [c[4] for c in CASES] + ["mapp v. ohio"]
    args = dict(
        court_filters=[None] * 4,
        date_ranges=[None, None, (dt.date(1960, 1, 1), dt.date(1969, 1, 1)), None],
        min_similarity=[0.3] * 4,
        exact_weight=[2.0] * 4,
        k=5,
    )
    e = embed(emb, qs)
    bv, bi, bc, bs = fused_brute.query_batch(e, qs, **args)
    pv, pi, pc, ps = fused_part.query_batch(e, qs, **args)
    for b in range(4):
        got_b = {int(c): (int(s), float(v)) for c, s, v in zip(bc[b], bs[b], bv[b]) if c >= 0}
        got_p = {int(c): (int(s), float(v)) for c, s, v in zip(pc[b], ps[b], pv[b]) if c >= 0}
        # same case set + same provenance; near-tie ORDER may differ because
        # brute ranks by int8 scores while partitioned reranks in bf16
        assert set(got_b) == set(got_p), (b, got_b, got_p)
        for case, (s_b, v_b) in got_b.items():
            s_p, v_p = got_p[case]
            assert s_b == s_p, (b, case, s_b, s_p)
            assert abs(v_b - v_p) < 2e-2, (b, case, v_b, v_p)
        # the top case (clear winner, no near-tie) agrees
        assert int(bc[b][0]) == int(pc[b][0])


def test_fused_partitioned_auto_threshold(stack):
    """ann_mode='auto' picks brute below PARTITIONED_MIN_VECTORS."""
    built, fused, emb = stack
    assert fused.ann_mode == "brute"


def test_engine_multichip_serving_matches_single_chip(stack, tmp_path_factory):
    """Round-1 VERDICT item 3 'done' criterion: the full engine serve path
    on the 8-CPU mesh returns identical results to single-chip."""
    from trie_semantic_search_tpu.core.config import MeshConfig
    from trie_semantic_search_tpu.parallel.mesh import make_mesh
    from trie_semantic_search_tpu.search.engine import SearchEngine, SearchQuery

    built, fused, emb = stack
    tmp = tmp_path_factory.mktemp("mc_engine")
    cfg = Config()
    cfg.storage.db_path = str(tmp / "db.sqlite")
    cfg.vector.dimension = 64
    storage = StorageManager(cfg.storage)
    for name, cit, court, date, text in CASES:
        meta = CaseMetadata(id=new_case_id(), name=name, citation=cit,
                            court=court, decision_date=date)
        storage.store_case_metadata(meta)
        storage.store_case_text(meta.id, text)
    built2 = build_indexes(storage, cfg, embedder=emb)
    cfg.search.use_fused_device_path = True

    queries = [
        SearchQuery(query="mapp v. ohio"),
        SearchQuery(query="stop and frisk upon reasonable suspicion"),
        SearchQuery(query="evidence suppression",
                    court_filter=["Supreme Court of California"]),
        SearchQuery(query="reasonable suspicion of criminal activity",
                    date_range=(dt.date(1965, 1, 1), dt.date(1969, 1, 1))),
    ]

    single = SearchEngine(cfg, storage, built2.trie, built2.vector,
                          built2.columns)
    res_single = single.search_batch(queries)

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    multi = SearchEngine(cfg, storage, built2.trie, built2.vector,
                         built2.columns, mesh=mesh)
    assert multi._get_fused().ann_mode == "sharded"
    res_multi = multi.search_batch(queries)

    for rs, rm in zip(res_single, res_multi):
        assert [r.case_metadata.id for r in rs] == [
            r.case_metadata.id for r in rm
        ]
        assert [r.match_type for r in rs] == [r.match_type for r in rm]
        for a, b in zip(rs, rm):
            assert abs(a.score - b.score) < 1e-5
            assert a.snippet == b.snippet


def test_fused_chunked_matches_oneshot():
    """fused_hybrid_topk_chunked (lax.scan over corpus slabs, CAP-scale
    memory) returns exactly the one-shot program's results."""
    import jax.numpy as jnp

    from trie_semantic_search_tpu.ops.hybrid import (
        fused_hybrid_topk,
        fused_hybrid_topk_chunked,
    )
    from trie_semantic_search_tpu.ops.scoring import quantize_int8

    rng = np.random.default_rng(5)
    N, D, B, C = 1024, 32, 4, 64
    v = rng.standard_normal((N, D)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cq, cs = quantize_int8(v)
    chunk_case = rng.integers(0, C, N).astype(np.int32)
    chunk_court = rng.integers(0, 4, N).astype(np.int32)
    chunk_date = rng.integers(0, 1000, N).astype(np.int32)
    rep = np.full(C, -1, np.int32)
    for i in range(N - 1, -1, -1):
        rep[chunk_case[i]] = i
    court_table = rng.random((B, 4)) < 0.7
    lex = np.full((B, 3), -1, np.int32)
    lex[0, 0] = int(chunk_case[0])
    lex_src = np.full((B, 3), 1, np.int32)
    args = (
        jnp.asarray(v[:B]), jnp.asarray(cq), jnp.asarray(cs),
        jnp.asarray(chunk_case), jnp.asarray(chunk_court),
        jnp.asarray(chunk_date), jnp.asarray(court_table),
        jnp.zeros(B, jnp.int32), jnp.full(B, 800, jnp.int32),
        jnp.asarray(lex), jnp.asarray(lex_src), jnp.asarray(rep),
        jnp.full(B, 0.1, jnp.float32), jnp.full(B, 2.0, jnp.float32),
    )
    a = fused_hybrid_topk(*args, k=8, overfetch=4)
    b = fused_hybrid_topk_chunked(*args, k=8, overfetch=4, num_chunks=8)
    for x, y, name in zip(a, b, ("v", "i", "cases", "src")):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )
    # degenerate: N not divisible → falls back, still identical
    c = fused_hybrid_topk_chunked(*args, k=8, overfetch=4, num_chunks=7)
    for x, y in zip(a, c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # explicit static filter-skip flags must trace (regression: flags
    # missing from chunked's static_argnames raised
    # TracerBoolConversionError) and chunked==one-shot must hold under them
    a_nf = fused_hybrid_topk(
        *args, k=8, overfetch=4, use_court=False, use_date=False
    )
    d = fused_hybrid_topk_chunked(
        *args, k=8, overfetch=4, num_chunks=8,
        use_court=False, use_date=False,
    )
    for x, y in zip(a_nf, d):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_query_batch_serves_chunked_above_workset(stack, monkeypatch):
    """VERDICT r2 item 5: brute-mode serving selects the chunked slab
    program above the working-set threshold (and at exact recall), with
    results identical to the one-shot program. The corpus here is
    non-tile-divisible (7 chunks, padded to TILE_N at init)."""
    import trie_semantic_search_tpu.ops.hybrid as hybrid_mod

    built, fused, emb = stack
    assert fused.ann_mode == "brute"
    assert int(fused.corpus_q.shape[0]) % 2048 == 0  # padded at init
    qs = [c[4] for c in CASES]
    kwargs = dict(
        court_filters=[None, ["Supreme Court of California"], None],
        date_ranges=[None, None, (dt.date(1960, 1, 1), dt.date(1969, 1, 1))],
        min_similarity=[0.2] * 3,
        exact_weight=[2.0] * 3,
        k=5,
        recall_target=1.0,  # exact mode: previously materialised [B, N]
    )
    embs = embed(emb, qs)
    one_shot = fused.query_batch(embs, qs, **kwargs)
    # force the chunked selection (tiny corpus would never cross 256 MB)
    monkeypatch.setattr(hybrid_mod, "_CHUNKED_WORKSET_BYTES", 1)
    monkeypatch.setattr(hybrid_mod, "_SLAB_MIN_ROWS", 256)
    chunked = fused.query_batch(embs, qs, **kwargs)
    for x, y, name in zip(one_shot, chunked, ("v", "i", "cases", "src")):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_sharded_init_adopts_tuned_nprobe(stack):
    """The multi-chip init must honor the nprobe a loaded artifact
    carries (ann.config.num_probes, persisted by ann.save) instead of
    regressing to the P//10 heuristic; an explicit user-config value
    still wins."""
    from trie_semantic_search_tpu.core.config import MeshConfig
    from trie_semantic_search_tpu.parallel.mesh import make_mesh

    built, _fused_single, _emb = stack
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    ann = built.vector.ann
    old = ann.tuned_nprobe
    try:
        ann.tuned_nprobe = 3  # as adopted from the artifact meta by load()
        fused_mc = FusedHybridSearch(
            built.trie, built.vector, built.columns,
            ann_mode="partitioned", mesh=mesh,
        )
        assert fused_mc.sp_nprobe == 3
    finally:
        ann.tuned_nprobe = old


def test_sharded_partitioned_engine_matches_single_chip(stack, monkeypatch):
    """VERDICT r2 item 1 'done' criterion at the engine level: the
    sharded-partitioned serving mode (forced on the 8-CPU mesh, probe
    kernel in interpret mode) returns the single-chip results."""
    from trie_semantic_search_tpu.core.config import MeshConfig
    from trie_semantic_search_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("TSS_PROBE_INTERPRET", "1")
    built, fused_single, emb = stack
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    fused_mc = FusedHybridSearch(
        built.trie, built.vector, built.columns,
        ann_mode="partitioned", mesh=mesh,
    )
    assert fused_mc.ann_mode == "sharded-partitioned"
    qs = [c[4] for c in CASES] + ["mapp v. ohio"]
    kwargs = dict(
        court_filters=[None, ["Supreme Court of California"], None, None],
        date_ranges=[None, None,
                     (dt.date(1960, 1, 1), dt.date(1969, 1, 1)), None],
        min_similarity=[0.2, 0.2, 0.2, 0.99],
        exact_weight=[2.0] * 4,
        k=5,
        recall_target=0.95,
    )
    embs = embed(emb, qs)
    v1, i1, c1, s1 = fused_single.query_batch(embs, qs, **kwargs)
    vm, im, cm, sm = fused_mc.query_batch(embs, qs, **kwargs)
    for b in range(4):
        set1 = {int(c) for c in c1[b] if c >= 0}
        setm = {int(c) for c in cm[b] if c >= 0}
        assert set1 == setm, (b, set1, setm)
        # provenance agrees per case
        p1 = {int(c): int(s) for c, s in zip(c1[b], s1[b]) if c >= 0}
        pm = {int(c): int(s) for c, s in zip(cm[b], sm[b]) if c >= 0}
        assert p1 == pm, b
        v1d = {int(c): float(v) for c, v in zip(c1[b], v1[b]) if c >= 0}
        vmd = {int(c): float(v) for c, v in zip(cm[b], vm[b]) if c >= 0}
        for case in set1:
            assert abs(v1d[case] - vmd[case]) < 2e-2, (b, case)
    # the lexical boost query: exact name hit leads on both paths
    assert cm[3][0] == c1[3][0] and vm[3][0] == 2.0


def test_layout_brute_batch_rule(stack):
    """The partitioned-mode batch-aware pick: one fused stream of the
    partition layout when B·nprobe >= P·ceil(B/TILE_B) (byte parity with
    the probe path's B·nprobe·m row reads — measured break-even,
    ops.hybrid.fused_layout_brute_topk)."""
    built, _, _ = stack
    fused = FusedHybridSearch(
        built.trie, built.vector, built.columns, ann_mode="partitioned"
    )
    P = int(fused.ann.centroids.shape[0])
    nprobe = int(fused.ann.default_nprobe)
    assert fused._layout_brute_batch(P) is True  # B=P: always past parity
    if nprobe < P:
        assert fused._layout_brute_batch(max(1, P // nprobe // 2)) is False


def test_fused_layout_brute_matches_brute_mode(stack, monkeypatch):
    """Forcing the large-batch layout-brute branch returns the same cases,
    provenance, and (bf16-rescored) scores as the plain brute mode — the
    dual-mode pick must never change result semantics."""
    built, fused_brute, emb = stack
    fused_part = FusedHybridSearch(
        built.trie, built.vector, built.columns, ann_mode="partitioned"
    )
    monkeypatch.setattr(
        fused_part, "_layout_brute_batch", lambda batch: True
    )
    qs = [c[4] for c in CASES] + ["mapp v. ohio"]
    args = dict(
        court_filters=[None, ["Supreme Court of California"], None, None],
        date_ranges=[None, None,
                     (dt.date(1960, 1, 1), dt.date(1969, 1, 1)), None],
        min_similarity=[0.3] * 4,
        exact_weight=[2.0] * 4,
        k=5,
    )
    e = embed(emb, qs)
    bv, bi, bc, bs = fused_brute.query_batch(e, qs, **args)
    pv, pi, pc, ps = fused_part.query_batch(e, qs, **args)
    for b in range(4):
        got_b = {int(c): int(s) for c, s in zip(bc[b], bs[b]) if c >= 0}
        got_p = {int(c): int(s) for c, s in zip(pc[b], ps[b]) if c >= 0}
        assert got_b == got_p, (b, got_b, got_p)
        vb = {int(c): float(v) for c, v in zip(bc[b], bv[b]) if c >= 0}
        vp = {int(c): float(v) for c, v in zip(pc[b], pv[b]) if c >= 0}
        for case in got_b:
            # layout path reranks candidates in bf16; brute keeps int8
            assert abs(vb[case] - vp[case]) < 2e-2, (b, case)
    # returned chunk indices live in GLOBAL row space (not slot space):
    # every non-dead index must be a valid corpus row of the right case
    refs = np.asarray(built.vector.refs, np.int32)
    for b in range(4):
        for chunk, case in zip(pi[b], pc[b]):
            if case >= 0 and chunk >= 0:
                assert refs[int(chunk), 0] == int(case)


def test_fused_layout_brute_op_pads_and_replicas():
    """Op-level: fused_layout_brute_topk over a slot layout with pad slots
    AND replica slots (one row in two slots) matches fused_hybrid_topk over
    the equivalent flat corpus — pads never surface, replicas collapse, and
    indices come back in global row space."""
    import jax.numpy as jnp

    from trie_semantic_search_tpu.ops.hybrid import (
        fused_hybrid_topk,
        fused_layout_brute_topk,
    )

    rng = np.random.default_rng(3)
    N, D, P, m = 22, 16, 4, 8  # P*m = 32 slots > N rows
    v = rng.standard_normal((N, D)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    chunk_case = np.arange(N, dtype=np.int32) // 2
    chunk_court = (chunk_case % 3).astype(np.int32)
    chunk_date = (1000 + chunk_case * 7).astype(np.int32)

    # slot layout: rows scattered over partitions, 6 replicas, rest pads
    slots = np.full(P * m, -1, np.int32)
    perm = rng.permutation(N)
    slots[:N] = perm
    slots[N : N + 6] = perm[:6]  # replicas
    slots = slots.reshape(P, m)
    from trie_semantic_search_tpu.ops.scoring import quantize_int8

    q8all, scall = quantize_int8(v)
    q8all, scall = np.asarray(q8all), np.asarray(scall).reshape(N)
    part_int8 = np.zeros((P, m, D), np.int8)
    part_scale = np.zeros((P, m), np.float32)
    safe = np.maximum(slots, 0)
    part_int8[:] = q8all[safe]
    part_scale[:] = np.where(slots >= 0, scall[safe], 0.0)
    slot_court = np.where(slots >= 0, chunk_court[safe], -1).astype(np.int32)
    slot_date = np.where(
        slots >= 0, chunk_date[safe], np.iinfo(np.int32).min
    ).astype(np.int32)

    B = 3
    q = v[rng.integers(0, N, B)] + 0.05 * rng.standard_normal((B, D)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    filt = dict(
        court_table=jnp.ones((B, 3), bool),
        date_lo=jnp.zeros(B, jnp.int32),
        date_hi=jnp.full(B, 2**31 - 1, jnp.int32),
        trie_rows=jnp.full((B, 4), -1, jnp.int32),
        trie_src=jnp.full((B, 4), 3, jnp.int32),
        trie_chunk_of_case=jnp.asarray(
            np.asarray([np.flatnonzero(chunk_case == c)[0]
                        for c in range(N // 2)], np.int32)
        ),
        min_similarity=jnp.full(B, 0.1, jnp.float32),
        exact_weight=jnp.full(B, 2.0, jnp.float32),
        k=5,
        overfetch=4,
    )
    ev, ei, ec, es = fused_hybrid_topk(
        jnp.asarray(q), jnp.asarray(q8all), jnp.asarray(scall).reshape(N, 1),
        jnp.asarray(chunk_case), jnp.asarray(chunk_court),
        jnp.asarray(chunk_date), **filt,
    )
    lv, li, lc, ls = fused_layout_brute_topk(
        jnp.asarray(q), jnp.asarray(slots), jnp.asarray(part_int8),
        jnp.asarray(part_scale), None, jnp.asarray(slot_court),
        jnp.asarray(slot_date), jnp.asarray(chunk_case),
        jnp.asarray(chunk_court), jnp.asarray(chunk_date),
        num_chunks=2, **filt,
    )
    np.testing.assert_array_equal(np.asarray(ec), np.asarray(lc))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(li))
    np.testing.assert_allclose(np.asarray(ev), np.asarray(lv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(es), np.asarray(ls))


def test_sharded_layout_brute_matches_single_chip(stack, monkeypatch):
    """The multi-chip twin of the batch-aware mode pick: forcing the
    layout-brute branch in sharded-partitioned mode (8-CPU mesh) returns
    the single-chip brute-mode results — every chip streams its shard's
    layout, shard-local top-k lists merge over ICI."""
    from trie_semantic_search_tpu.core.config import MeshConfig
    from trie_semantic_search_tpu.parallel.mesh import make_mesh

    built, fused_single, emb = stack
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    fused_mc = FusedHybridSearch(
        built.trie, built.vector, built.columns,
        ann_mode="partitioned", mesh=mesh,
    )
    assert fused_mc.ann_mode == "sharded-partitioned"
    monkeypatch.setattr(fused_mc, "_layout_brute_batch", lambda batch: True)
    qs = [c[4] for c in CASES] + ["mapp v. ohio"]
    kwargs = dict(
        court_filters=[None, ["Supreme Court of California"], None, None],
        date_ranges=[None, None,
                     (dt.date(1960, 1, 1), dt.date(1969, 1, 1)), None],
        min_similarity=[0.2, 0.2, 0.2, 0.99],
        exact_weight=[2.0] * 4,
        k=5,
        recall_target=1.0,
    )
    embs = embed(emb, qs)
    v1, i1, c1, s1 = fused_single.query_batch(embs, qs, **kwargs)
    vm, im, cm, sm = fused_mc.query_batch(embs, qs, **kwargs)
    for b in range(4):
        set1 = {int(c) for c in c1[b] if c >= 0}
        setm = {int(c) for c in cm[b] if c >= 0}
        assert set1 == setm, (b, set1, setm)
        p1 = {int(c): int(s) for c, s in zip(c1[b], s1[b]) if c >= 0}
        pm = {int(c): int(s) for c, s in zip(cm[b], sm[b]) if c >= 0}
        assert p1 == pm, b
        v1d = {int(c): float(v) for c, v in zip(c1[b], v1[b]) if c >= 0}
        vmd = {int(c): float(v) for c, v in zip(cm[b], vm[b]) if c >= 0}
        for case in set1:
            # sharded layout reranks in bf16; single-chip brute keeps int8
            assert abs(v1d[case] - vmd[case]) < 2e-2, (b, case)
    assert cm[3][0] == c1[3][0] and vm[3][0] == 2.0
