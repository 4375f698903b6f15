"""Multi-chip sharded search tests on the virtual 8-device CPU mesh
(SURVEY.md §4: fake meshes so sharded top-k merge is testable without
hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import MeshConfig
from trie_semantic_search_tpu.ops import l2_normalize, quantize_int8
from trie_semantic_search_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    corpus_sharding,
    make_mesh,
    pad_corpus,
    pad_rows,
    sharded_brute_topk,
    sharded_int8_topk,
)


def np_topk(scores, k):
    idx = np.argsort(-scores, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    return make_mesh(MeshConfig(data_parallel=8, model_parallel=1))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)))
    c = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((800, 64)), jnp.float32)))
    return q, c


def test_make_mesh_shapes(cpu_devices):
    m = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert m.shape[DATA_AXIS] == 4 and m.shape[MODEL_AXIS] == 2
    m = make_mesh(MeshConfig(data_parallel=0, model_parallel=2))
    assert m.shape[DATA_AXIS] == 4


def test_make_mesh_invalid(cpu_devices):
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(model_parallel=3))


def test_pad_rows():
    assert pad_rows(100, 8) == 104
    assert pad_rows(104, 8) == 104
    assert pad_rows(1, 1024) == 1024


def test_pad_corpus(mesh):
    m = np.ones((100, 16), np.float32)
    padded, n = pad_corpus(m, mesh, row_multiple=8)
    assert n == 100
    assert padded.shape[0] % (8 * 8) == 0
    assert (padded[100:] == 0).all()


def test_sharded_brute_topk_matches_oracle(mesh, data):
    q, c = data
    cj = jax.device_put(jnp.asarray(c), corpus_sharding(mesh))
    v, i = sharded_brute_topk(mesh, jnp.asarray(q), cj, 10)
    nv, ni = np_topk(q @ c.T, 10)
    np.testing.assert_allclose(np.asarray(v), nv, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_sharded_brute_topk_jit(mesh, data):
    q, c = data
    cj = jax.device_put(jnp.asarray(c), corpus_sharding(mesh))
    f = jax.jit(lambda q, c: sharded_brute_topk(mesh, q, c, 5))
    v, i = f(jnp.asarray(q), cj)
    nv, ni = np_topk(q @ c.T, 5)
    np.testing.assert_allclose(np.asarray(v), nv, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_sharded_int8_topk_recall(mesh, data):
    q, c = data
    cq, cs = quantize_int8(c)
    cqj = jax.device_put(cq, corpus_sharding(mesh))
    csj = jax.device_put(cs, corpus_sharding(mesh))
    v, i = sharded_int8_topk(mesh, jnp.asarray(q), cqj, csj, 10)
    _, ni = np_topk(q @ c.T, 10)
    recall = np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(np.asarray(i), ni)]
    )
    assert recall >= 0.9


def _fused_inputs(mesh, n_cases=64, N=256, D=32, B=4, seed=12):
    """Shared fixture data for the sharded fused step."""
    from trie_semantic_search_tpu.ops import quantize_int8

    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cq, cs = quantize_int8(corpus)
    chunk_case = rng.integers(0, n_cases, N).astype(np.int32)
    chunk_court = rng.integers(0, 4, N).astype(np.int32)
    chunk_date = rng.integers(0, 1000, N).astype(np.int32)
    # case-level columns consistent with the chunk-level ones (first chunk
    # of a case defines it — the builder derives chunk cols FROM case cols)
    case_court = np.zeros(n_cases, np.int32)
    case_date = np.zeros(n_cases, np.int32)
    for i in range(N - 1, -1, -1):
        case_court[chunk_case[i]] = chunk_court[i]
        case_date[chunk_case[i]] = chunk_date[i]
    # ...and push back so every chunk of a case agrees with its case
    chunk_court = case_court[chunk_case]
    chunk_date = case_date[chunk_case]
    court_table = rng.random((B, 4)) < 0.6
    return (corpus, cq, cs, chunk_case, chunk_court, chunk_date,
            case_court, case_date, court_table, rng)


def _run_fused(mesh, corpus, cq, cs, chunk_case, chunk_court, chunk_date,
               case_court, case_date, court_table, lex, lex_src,
               date_lo, date_hi, min_sim, ew, K, n_valid=None, **kw):
    import jax
    from trie_semantic_search_tpu.parallel import corpus_sharding, row_sharding
    from trie_semantic_search_tpu.parallel.collectives import sharded_fused_topk

    B = court_table.shape[0]
    csh, rsh = corpus_sharding(mesh), row_sharding(mesh)
    v, r, c, s = sharded_fused_topk(
        mesh,
        jnp.asarray(corpus[:B]),
        jax.device_put(jnp.asarray(cq), csh),
        jax.device_put(jnp.asarray(cs), csh),
        jax.device_put(jnp.asarray(chunk_case), rsh),
        jax.device_put(jnp.asarray(chunk_court), rsh),
        jax.device_put(jnp.asarray(chunk_date), rsh),
        jnp.asarray(court_table),
        jnp.asarray(date_lo),
        jnp.asarray(date_hi),
        jnp.asarray(lex),
        jnp.asarray(lex_src),
        jnp.maximum(jnp.asarray(lex), 0),  # representative chunk per hit
        jnp.asarray(case_court),
        jnp.asarray(case_date),
        jnp.asarray(min_sim),
        jnp.asarray(ew),
        k=K,
        n_valid=n_valid,
        **kw,
    )
    return np.array(v), np.array(c), np.array(s)


def test_sharded_fused_topk(mesh):
    """Multi-chip step-7: shard-local filtered scan + ICI merge + global
    lexical boost + dedup-by-case matches a NumPy oracle."""
    N, D, B, K = 256, 32, 4, 6
    (corpus, cq, cs, chunk_case, chunk_court, chunk_date,
     case_court, case_date, court_table, rng) = _fused_inputs(mesh, N=N, D=D, B=B)
    date_lo = np.zeros(B, np.int32)
    date_hi = np.full(B, 800, np.int32)
    lex = np.full((B, 3), -1, np.int32)
    lex_src = np.zeros((B, 3), np.int32)
    # query 0: one lexical hit on a case that passes its own filters
    ok_case = next(
        int(c) for c in range(64)
        if court_table[0, case_court[c]] and 0 <= case_date[c] <= 800
    )
    lex[0, 0] = ok_case
    lex_src[0, 0] = 1  # SRC_CASE_NAME
    min_sim = np.full(B, 0.3, np.float32)
    ew = np.full(B, 2.0, np.float32)

    v, c, s = _run_fused(
        mesh, corpus, cq, cs, chunk_case, chunk_court, chunk_date,
        case_court, case_date, court_table, lex, lex_src,
        date_lo, date_hi, min_sim, ew, K,
    )

    # numpy oracle: dedup by case — best chunk per distinct case
    scores = corpus[:B] @ corpus.T  # approx (int8 error ~0.03)
    keep = (
        court_table[:, chunk_court]
        & (chunk_date[None, :] >= date_lo[:, None])
        & (chunk_date[None, :] <= date_hi[:, None])
        & (scores >= min_sim[:, None])
    )
    masked = np.where(keep, scores, -np.inf)
    for b in range(B):
        order = np.argsort(-masked[b], kind="stable")
        expected_cases, seen = [], set()
        for i in order:
            if not np.isfinite(masked[b][i]):
                break
            cc = int(chunk_case[i])
            if cc not in seen:
                seen.add(cc)
                expected_cases.append(cc)
            if len(expected_cases) >= K:
                break
        got = [int(x) for x in c[b] if x >= 0]
        assert len(got) == len(set(got)), "dedup-by-case violated"
        if b == 0:
            assert got[0] == ok_case and v[0, 0] == 2.0  # lexical boost first
            assert s[0, 0] == 1  # provenance: SRC_CASE_NAME
            got = [g for g in got if g != ok_case]
            expected_cases = [e for e in expected_cases if e != ok_case]
        # int8 scoring: allow small rank jitter, compare as sets mostly
        overlap = len(set(got) & set(expected_cases[:len(got)])) / max(1, len(got))
        assert overlap >= 0.6, (got, expected_cases)


def test_sharded_fused_topk_pad_rows_never_surface(mesh):
    """ADVICE round 1 (medium): with a pad_corpus-padded corpus and
    min_similarity <= 0, pad rows must not surface as phantom hits."""
    from trie_semantic_search_tpu.parallel import pad_corpus

    N, D, B, K = 100, 32, 2, 8  # N NOT divisible by 8 shards → real padding
    (corpus, _, _, chunk_case, chunk_court, chunk_date,
     case_court, case_date, _, rng) = _fused_inputs(mesh, N=N, D=D, B=B)
    from trie_semantic_search_tpu.ops import quantize_int8

    padded, n = pad_corpus(corpus, mesh, 8)
    Npad = padded.shape[0]
    cq, cs = quantize_int8(padded)
    # pad the columns with a *hazardous* value: case 0, passing court/date —
    # only the n_valid row mask keeps these out
    pad_case = np.zeros(Npad, np.int32)
    pad_case[:N] = chunk_case
    pad_court = np.zeros(Npad, np.int32)
    pad_court[:N] = chunk_court
    pad_date = np.zeros(Npad, np.int32)
    pad_date[:N] = chunk_date
    court_table = np.ones((B, 4), bool)
    v, c, s = _run_fused(
        mesh, corpus, cq, cs, pad_case, pad_court, pad_date,
        case_court, case_date, court_table,
        np.full((B, 2), -1, np.int32), np.zeros((B, 2), np.int32),
        np.full(B, -(2**31), np.int32), np.full(B, 2**31 - 1, np.int32),
        np.full(B, -1.0, np.float32),  # min_sim < 0: zero-score pads WOULD pass
        np.full(B, 2.0, np.float32), K, n_valid=N,
    )
    # every returned case must be reachable from a REAL chunk
    real_cases = set(chunk_case.tolist())
    for b in range(B):
        for score, case in zip(v[b], c[b]):
            if case >= 0:
                assert case in real_cases
                assert np.isfinite(score)


def test_sharded_fused_topk_lexical_hits_respect_filters(mesh):
    """Round-1 VERDICT item 3: a lexically-hit case failing the court/date
    filter must NOT surface (parity with ops/hybrid.lexical_side_list)."""
    N, D, B, K = 256, 32, 2, 6
    (corpus, cq, cs, chunk_case, chunk_court, chunk_date,
     case_court, case_date, _, rng) = _fused_inputs(mesh, N=N, D=D, B=B)
    # court table: query 0 allows only court 1; pick a lexical case in court 2
    court_table = np.zeros((B, 4), bool)
    court_table[:, 1] = True
    bad_case = next(int(c) for c in range(64) if case_court[c] == 2)
    lex = np.full((B, 3), -1, np.int32)
    lex[0, 0] = bad_case
    lex_src = np.ones((B, 3), np.int32)
    v, c, s = _run_fused(
        mesh, corpus, cq, cs, chunk_case, chunk_court, chunk_date,
        case_court, case_date, court_table, lex, lex_src,
        np.full(B, -(2**31), np.int32), np.full(B, 2**31 - 1, np.int32),
        np.full(B, 0.3, np.float32), np.full(B, 2.0, np.float32), K,
    )
    assert bad_case not in c[0].tolist()
    assert not (v[0] == 2.0).any()  # no boosted score slipped through
    # and every surfaced case is in the allowed court
    for case in c[0]:
        if case >= 0:
            assert case_court[case] == 1


# ---------------------------------------------------------------------------
# round 3: the sharded path runs the SAME kernels as single-chip serving
# ---------------------------------------------------------------------------


def test_sharded_fused_pallas_kernel_matches_xla(mesh):
    """VERDICT r2 item 1: sharded brute serving through the per-shard
    Pallas fused-scan kernel (interpret mode on the CPU mesh) returns the
    XLA path's results — same glue (local row offsets, pad masking, local
    dedup, ICI merge)."""
    from trie_semantic_search_tpu.ops.pallas_scan import TILE_N

    N = 8 * TILE_N  # one kernel tile per shard
    (corpus, cq, cs, chunk_case, chunk_court, chunk_date, case_court,
     case_date, court_table, rng) = _fused_inputs(
        mesh, n_cases=512, N=N, D=32, B=4, seed=21
    )
    B = 4
    lex = np.full((B, 3), -1, np.int32)
    lex[0, 0] = 7
    lex_src = np.full((B, 3), 1, np.int32)
    args = (mesh, corpus, cq, cs, chunk_case, chunk_court, chunk_date,
            case_court, case_date, court_table, lex, lex_src,
            np.zeros(B, np.int32), np.full(B, 1000, np.int32),
            np.full(B, 0.0, np.float32), np.full(B, 2.0, np.float32), 5)
    v_x, c_x, s_x = _run_fused(*args, recall_target=1.0, scan_mode="xla")
    v_p, c_p, s_p = _run_fused(
        *args, recall_target=0.9, scan_mode="pallas", scan_interpret=True
    )
    np.testing.assert_array_equal(c_x, c_p)
    np.testing.assert_array_equal(s_x, s_p)
    np.testing.assert_allclose(v_x, v_p, atol=1e-6)


def test_sharded_partitioned_matches_sharded_brute(mesh, monkeypatch):
    """The sharded-partitioned mode (per-shard partition blocks + shared
    global centroids + ICI merge) agrees with the sharded exact brute scan
    when every partition is probed — both with the XLA probe scan and the
    probe kernel in interpret mode."""
    import jax
    from trie_semantic_search_tpu.index.kmeans import train_kmeans
    from trie_semantic_search_tpu.index.sharded import (
        build_sharded_partitions,
    )
    from trie_semantic_search_tpu.parallel import corpus_sharding, row_sharding
    from trie_semantic_search_tpu.parallel.collectives import (
        sharded_partitioned_topk,
    )
    from jax.sharding import NamedSharding, PartitionSpec as PS

    N, D, B, P = 2048, 32, 4, 8
    (corpus, cq, cs, chunk_case, chunk_court, chunk_date, case_court,
     case_date, court_table, rng) = _fused_inputs(
        mesh, n_cases=256, N=N, D=D, B=B, seed=33
    )
    lex = np.full((B, 3), -1, np.int32)
    lex_case = next(
        int(c) for c in range(256)
        if court_table[1, case_court[c]] and 0 <= case_date[c] <= 1000
    )
    lex[1, 0] = lex_case
    lex_src = np.full((B, 3), 1, np.int32)
    date_lo = np.zeros(B, np.int32)
    date_hi = np.full(B, 1000, np.int32)
    min_sim = np.full(B, 0.0, np.float32)
    ew = np.full(B, 2.0, np.float32)
    K = 5

    v_b, c_b, s_b = _run_fused(
        mesh, corpus, cq, cs, chunk_case, chunk_court, chunk_date,
        case_court, case_date, court_table, lex, lex_src, date_lo,
        date_hi, min_sim, ew, K, recall_target=1.0,
    )

    centroids = train_kmeans(corpus, P, iters=5, sample=N, seed=0)
    parts = build_sharded_partitions(
        corpus, N, 8, centroids, chunk_court, chunk_date
    )
    csh, rsh = corpus_sharding(mesh), row_sharding(mesh)
    p3 = NamedSharding(mesh, PS("data", None, None))
    p4 = NamedSharding(mesh, PS("data", None, None, None))

    def run(upk, pinterp):
        v, r, c, s = sharded_partitioned_topk(
            mesh,
            jnp.asarray(corpus[:B]),
            jnp.asarray(centroids, jnp.float32),
            jax.device_put(jnp.asarray(parts["part_rows"]), p3),
            jax.device_put(jnp.asarray(parts["part_int8"]), p4),
            jax.device_put(jnp.asarray(parts["part_scale"]), p3),
            jax.device_put(jnp.asarray(parts["part_cword"]), p3),
            jax.device_put(jnp.asarray(parts["part_cbit"]), p3),
            jax.device_put(jnp.asarray(parts["part_date"]), p3),
            jax.device_put(jnp.asarray(corpus, jnp.bfloat16), csh),
            jax.device_put(jnp.asarray(chunk_case), rsh),
            jnp.asarray(court_table),
            jnp.asarray(date_lo), jnp.asarray(date_hi),
            jnp.asarray(lex), jnp.asarray(lex_src),
            jnp.maximum(jnp.asarray(lex), 0),
            jnp.asarray(case_court), jnp.asarray(case_date),
            jnp.asarray(min_sim), jnp.asarray(ew),
            k=K, nprobe=P,  # probe ALL partitions → no probe loss
            use_probe_kernel=upk, probe_interpret=pinterp,
        )
        return np.array(v), np.array(c), np.array(s)

    for upk in (False, True):
        v_p, c_p, s_p = run(upk, upk)
        for b in range(B):
            set_b = {int(c) for c in c_b[b] if c >= 0}
            set_p = {int(c) for c in c_p[b] if c >= 0}
            # clear winners agree; the k-th boundary may swap near-ties
            # (partitioned reranks candidates in bf16, brute ranks int8)
            assert (c_b[b][:2] == c_p[b][:2]).all(), (upk, b, c_b[b], c_p[b])
            assert len(set_b ^ set_p) <= 2, (upk, b, set_b, set_p)
            # scores of shared cases agree to bf16-rescore tolerance
            sb = {int(c): float(v) for c, v in zip(c_b[b], v_b[b]) if c >= 0}
            sp = {int(c): float(v) for c, v in zip(c_p[b], v_p[b]) if c >= 0}
            for case in set_b & set_p:
                assert abs(sb[case] - sp[case]) < 2e-2, (upk, b, case)
        # lexical boost survives with its provenance
        assert lex_case in c_p[1].tolist()
        assert s_p[1][c_p[1].tolist().index(lex_case)] == 1  # SRC_CASE_NAME


def test_sharded_partitions_capacity_capped_under_duplicates():
    """One giant duplicate cluster must not size every shard-partition
    block: capacity caps per shard and spilled rows reassign WITHIN their
    shard (rows never change chips), every valid row placed exactly once."""
    from trie_semantic_search_tpu.index.ann import _capacity_cap
    from trie_semantic_search_tpu.index.kmeans import train_kmeans
    from trie_semantic_search_tpu.index.sharded import (
        build_sharded_partitions,
    )

    rng = np.random.default_rng(5)
    N, D, P, S = 4096, 32, 16, 4
    dup = rng.standard_normal((1, D)).astype(np.float32)
    uniq = rng.standard_normal((N // 2, D)).astype(np.float32)
    v = np.concatenate([np.repeat(dup, N // 2, axis=0), uniq])
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    centroids = train_kmeans(v, P, iters=5, sample=N, seed=0)
    parts = build_sharded_partitions(
        v, N, S, centroids,
        np.zeros(N, np.int32), np.zeros(N, np.int32), overalloc=2.0,
    )
    rows = parts["part_rows"]  # [S, P, m]
    m = rows.shape[2]
    cap = _capacity_cap(N // S, P, 2.0)
    assert m <= -(-cap // 128) * 128, (m, cap)
    assert m < N // 2  # far below the duplicate-group size
    shard_rows = N // S
    for s in range(S):
        got = np.sort(rows[s][rows[s] >= 0])
        np.testing.assert_array_equal(got, np.arange(shard_rows))
