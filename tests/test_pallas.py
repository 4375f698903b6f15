"""Pallas fused scan+top-k kernel: interpret-mode parity vs the XLA path
(the kernel itself runs compiled only on TPU; interpret mode validates the
exact same kernel body on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trie_semantic_search_tpu.ops import pallas_scan as ps


def run_interpret(q8, qs, cq, cs, k, tile_b, tile_n):
    kernel = functools.partial(ps._scan_kernel, k=k, tile_n=tile_n)
    B, D = q8.shape
    N = cq.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(B // tile_b, N // tile_n),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda b, n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda b, n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, k), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, k), jnp.float32),
            pltpu.VMEM((tile_b, k), jnp.int32),
        ],
        interpret=True,
    )(q8, qs, cq, cs)


def make_data(B, D, N, seed=0):
    rng = np.random.default_rng(seed)
    q8 = jnp.asarray(rng.integers(-127, 127, (B, D)), jnp.int8)
    qs = jnp.asarray(rng.random((B, 1)).astype(np.float32) * 0.01 + 1e-3)
    cq = jnp.asarray(rng.integers(-127, 127, (N, D)), jnp.int8)
    cs = jnp.asarray(rng.random((N, 1)).astype(np.float32) * 0.01 + 1e-3)
    return q8, qs, cq, cs


@pytest.mark.parametrize("tile_b,tile_n", [(4, 64), (8, 32), (8, 256)])
def test_kernel_matches_xla(tile_b, tile_n):
    q8, qs, cq, cs = make_data(8, 64, 256)
    v, i = run_interpret(q8, qs, cq, cs, 5, tile_b, tile_n)
    rv, ri = ps.xla_int8_topk(q8, qs, cq, cs, 5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_kernel_duplicate_scores_tie_break():
    """All-equal scores: indices must come out ascending (deterministic)."""
    B, D, N, K = 4, 32, 128, 6
    q8 = jnp.zeros((B, D), jnp.int8)
    qs = jnp.ones((B, 1), jnp.float32)
    cq = jnp.zeros((N, D), jnp.int8)
    cs = jnp.ones((N, 1), jnp.float32)
    v, i = run_interpret(q8, qs, cq, cs, K, 4, 32)
    np.testing.assert_array_equal(np.asarray(i)[0], np.arange(K))
    rv, ri = ps.xla_int8_topk(q8, qs, cq, cs, K)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_fused_dispatch_fallback_on_cpu():
    """On a CPU backend the dispatcher uses the XLA path (still correct)."""
    q8, qs, cq, cs = make_data(4, 32, 128, seed=3)
    v, i = ps.fused_int8_topk(q8, qs, cq, cs, 7)
    rv, ri = ps.xla_int8_topk(q8, qs, cq, cs, 7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


# ---------------------------------------------------------------------------
# fused filtered scan kernel (scan + court/date/min-sim masks + block
# pre-reduction): interpret-mode parity vs an exact numpy emulation of the
# kernel's semantics, plus recall + filter-correctness properties.
# ---------------------------------------------------------------------------


def make_filtered_data(B, D, N, V, seed=0):
    rng = np.random.default_rng(seed)
    q8 = jnp.asarray(rng.integers(-127, 127, (B, D)), jnp.int8)
    qs = jnp.asarray(rng.random((B, 1)).astype(np.float32) * 0.01 + 1e-3)
    cq = jnp.asarray(rng.integers(-127, 127, (N, D)), jnp.int8)
    cs = jnp.asarray(rng.random((N, 1)).astype(np.float32) * 0.01 + 1e-3)
    court = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    date = jnp.asarray(rng.integers(0, 1000, N), jnp.int32)
    table = jnp.asarray(rng.random((B, V)) < 0.7)
    lo = jnp.asarray(rng.integers(0, 300, B), jnp.int32)
    hi = jnp.asarray(rng.integers(600, 1000, B), jnp.int32)
    ms = jnp.full(B, -1e30, jnp.float32)
    return q8, qs, cq, cs, court, date, table, lo, hi, ms


def emulate_fused(q8, qs, cq, cs, court, date, table, lo, hi, ms,
                  tile_n, lanes, k):
    """Exact numpy emulation of the kernel's masked scan + running
    top-T-per-lane reduce (lane l keeps the T best rows with
    ``row % lanes == l`` across the whole corpus, ties to the lower row)."""
    q8, qs, cq, cs = map(np.asarray, (q8, qs, cq, cs))
    court, date, table = map(np.asarray, (court, date, table))
    lo, hi, ms = map(np.asarray, (lo, hi, ms))
    B, N = q8.shape[0], cq.shape[0]
    scores = (q8.astype(np.int32) @ cq.astype(np.int32).T).astype(
        np.float32) * qs * cs.reshape(1, -1)
    keep = (
        table[np.arange(B)[:, None], court[None, :]]
        & (date[None, :] >= lo[:, None]) & (date[None, :] <= hi[:, None])
        & (scores >= ms[:, None])
    )
    scores = np.where(keep, scores, -np.inf)
    n_keep = min(max(2, -(-k // lanes) + 1), tile_n // lanes)
    s = scores.reshape(B, N // lanes, lanes)  # rows j·lanes+l in col l
    order = np.argsort(-s, axis=1, kind="stable")[:, :n_keep]  # ties→low row
    red_v = np.take_along_axis(s, order, axis=1)  # [B, T, lanes]
    idx = order * lanes + np.arange(lanes)[None, None, :]
    return red_v.reshape(B, -1), idx.reshape(B, -1)


@pytest.mark.parametrize("tile_b,tile_n,lanes,V", [
    (4, 64, 32, 16),   # W=1 bitmask word
    (8, 128, 32, 40),  # W=2 words (court id crosses the 32-bit boundary)
])
def test_fused_kernel_matches_emulation(tile_b, tile_n, lanes, V):
    B, D, N, K = 8, 64, 256, 7
    q8, qs, cq, cs, court, date, table, lo, hi, ms = make_filtered_data(
        B, D, N, V, seed=1
    )
    v, i = ps.pallas_fused_topk(
        q8, qs, cq, cs, court, date, table, lo, hi, ms, k=K,
        tile_b=tile_b, tile_n=tile_n, lanes=lanes, interpret=True,
    )
    ev, ei = emulate_fused(q8, qs, cq, cs, court, date, table, lo, hi, ms,
                           tile_n, lanes, K)
    order = np.argsort(-ev, axis=1, kind="stable")[:, :K]
    ref_v = np.take_along_axis(ev, order, axis=1)
    ref_i = np.take_along_axis(ei, order, axis=1)
    np.testing.assert_allclose(np.asarray(v), ref_v, atol=1e-5)
    # indices must agree wherever candidates are real (scores distinct w/
    # prob 1 on this data; -inf slots carry -1 in the kernel output)
    got_i = np.asarray(i)
    real = np.isfinite(ref_v)
    np.testing.assert_array_equal(got_i[real], ref_i[real])
    assert (got_i[~real] == -1).all()


def test_fused_kernel_filters_respected():
    """Every finite candidate passes its query's court/date/min-sim filter."""
    B, D, N, V, K = 8, 32, 512, 40, 16
    q8, qs, cq, cs, court, date, table, lo, hi, ms = make_filtered_data(
        B, D, N, V, seed=2
    )
    ms = jnp.full(B, 0.0, jnp.float32)  # active threshold
    v, i = ps.pallas_fused_topk(
        q8, qs, cq, cs, court, date, table, lo, hi, ms, k=K,
        tile_b=4, tile_n=128, lanes=32, interpret=True,
    )
    v, i = np.asarray(v), np.asarray(i)
    court_n, date_n, table_n = map(np.asarray, (court, date, table))
    lo_n, hi_n = np.asarray(lo), np.asarray(hi)
    for b in range(B):
        for val, idx in zip(v[b], i[b]):
            if not np.isfinite(val):
                assert idx == -1
                continue
            assert table_n[b, court_n[idx]]
            assert lo_n[b] <= date_n[idx] <= hi_n[b]
            assert val >= 0.0


def test_fused_kernel_filter_skip_flags():
    """use_court/use_date=False with trivial filters == filtered defaults:
    the static skip must not change results when the filters are no-ops."""
    B, D, N, V, K = 8, 32, 512, 40, 8
    q8, qs, cq, cs, court, date, _table, _lo, _hi, ms = make_filtered_data(
        B, D, N, V, seed=6
    )
    open_table = jnp.ones((B, V), bool)
    open_lo = jnp.full(B, -(2**31), jnp.int32)
    open_hi = jnp.full(B, 2**31 - 1, jnp.int32)
    kw = dict(k=K, tile_b=4, tile_n=128, lanes=32, interpret=True)
    v0, i0 = ps.pallas_fused_topk(
        q8, qs, cq, cs, court, date, open_table, open_lo, open_hi, ms, **kw
    )
    v1, i1 = ps.pallas_fused_topk(
        q8, qs, cq, cs, court, date, open_table, open_lo, open_hi, ms,
        use_court=False, use_date=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_fused_kernel_recall_vs_exact():
    """Top-k recall vs the exact masked scan stays high (the stride-family
    pre-reduction loses an entry only on in-family collisions)."""
    B, D, N, V, K = 16, 64, 2048, 8, 10
    q8, qs, cq, cs, court, date, table, lo, hi, ms = make_filtered_data(
        B, D, N, V, seed=3
    )
    v, i = ps.pallas_fused_topk(
        q8, qs, cq, cs, court, date, table, lo, hi, ms, k=K,
        tile_b=8, tile_n=256, lanes=128, interpret=True,
    )
    # exact oracle: same masks, full top-k
    scores = (np.asarray(q8, np.int32) @ np.asarray(cq, np.int32).T
              ).astype(np.float32) * np.asarray(qs) * np.asarray(cs).reshape(1, -1)
    keep = (
        np.asarray(table)[np.arange(B)[:, None], np.asarray(court)[None, :]]
        & (np.asarray(date)[None, :] >= np.asarray(lo)[:, None])
        & (np.asarray(date)[None, :] <= np.asarray(hi)[:, None])
    )
    scores = np.where(keep, scores, -np.inf)
    oracle = np.argsort(-scores, axis=1)[:, :K]
    got = np.asarray(i)
    recalls = [
        len(set(got[b].tolist()) & set(oracle[b].tolist())) / K
        for b in range(B)
    ]
    assert float(np.mean(recalls)) >= 0.95


# ---------------------------------------------------------------------------
# scalar-prefetch probe kernel (partitioned ANN): interpret-mode parity.
# ---------------------------------------------------------------------------


def test_probe_kernel_matches_emulation():
    B, D, P, m, NP, lanes, V = 4, 32, 16, 64, 4, 32, 40
    rng = np.random.default_rng(5)
    q8 = jnp.asarray(rng.integers(-127, 127, (B, D)), jnp.int8)
    qs = jnp.asarray(rng.random((B, 1)).astype(np.float32) * 0.01 + 1e-3)
    pint8 = jnp.asarray(rng.integers(-127, 127, (P, m, D)), jnp.int8)
    pscale = jnp.asarray(
        rng.random((P, m)).astype(np.float32) * 0.01 + 1e-3
    )
    prows = np.arange(P * m, dtype=np.int32).reshape(P, m)
    prows[-1, -5:] = -1  # pad slots in the last partition
    chunk_court = rng.integers(0, V, P * m).astype(np.int32)
    chunk_date = rng.integers(0, 1000, P * m).astype(np.int32)
    pcw, pcb, pdt = ps.partition_filter_columns(
        prows, chunk_court, chunk_date
    )
    table = rng.random((B, V)) < 0.7
    qwords = ps.pack_court_words(jnp.asarray(table))
    lo = rng.integers(0, 300, B).astype(np.int32)
    hi = rng.integers(600, 1000, B).astype(np.int32)
    ms = np.full(B, -1e30, np.float32)
    top_p = rng.integers(0, P, (B, NP)).astype(np.int32)
    top_p[0, -1] = P - 1  # cover the padded partition

    v, s = ps.pallas_probe_candidates(
        q8, qs, jnp.asarray(top_p), pint8, pscale, jnp.asarray(prows),
        pcw, pcb, pdt, qwords, jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(ms), lanes=lanes, interpret=True,
    )
    v = np.asarray(v).reshape(B, NP, 2, lanes)
    s = np.asarray(s).reshape(B, NP, 2, lanes)

    # numpy emulation: top-2 per lane over the m//lanes sub-blocks
    q8n, qsn = np.asarray(q8, np.int32), np.asarray(qs)
    pin, psn = np.asarray(pint8, np.int32), np.asarray(pscale)
    for b in range(B):
        for pi, pid in enumerate(top_p[b]):
            scores = (pin[pid] @ q8n[b]).astype(np.float32) * psn[pid] * qsn[b, 0]
            rows = prows[pid]
            keep = (
                (rows >= 0)
                & table[b, chunk_court[np.maximum(rows, 0)]]
                & (chunk_date[np.maximum(rows, 0)] >= lo[b])
                & (chunk_date[np.maximum(rows, 0)] <= hi[b])
            )
            scores = np.where(keep, scores, -np.inf)
            sm = scores.reshape(m // lanes, lanes)
            order = np.argsort(-sm, axis=0, kind="stable")  # desc, ties→low j
            ev = np.take_along_axis(sm, order[:2], axis=0)  # [2, lanes]
            ej = order[:2] * lanes + np.arange(lanes)
            np.testing.assert_allclose(v[b, pi], ev, atol=1e-5)
            real = np.isfinite(ev)
            np.testing.assert_array_equal(s[b, pi][real], ej[real])


def test_probe_kernel_in_fused_partitioned():
    """fused_partitioned_topk with precomputed partition columns returns
    the same results whether they are passed or derived in-program (the
    XLA scan path runs on CPU either way — this guards the column layout)."""
    from trie_semantic_search_tpu.ops.hybrid import fused_partitioned_topk

    B, D, P, m, C = 4, 16, 8, 32, 64
    N = P * m
    rng = np.random.default_rng(9)
    qv = rng.standard_normal((B, D)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    cents = rng.standard_normal((P, D)).astype(np.float32)
    pint8 = rng.integers(-127, 127, (P, m, D)).astype(np.int8)
    pscale = (rng.random((P, m)) * 0.01 + 1e-3).astype(np.float32)
    prows = np.arange(N, dtype=np.int32).reshape(P, m)
    chunk_case = rng.integers(0, C, N).astype(np.int32)
    chunk_court = rng.integers(0, 8, N).astype(np.int32)
    chunk_date = rng.integers(0, 100, N).astype(np.int32)
    pcw, pcb, pdt = ps.partition_filter_columns(
        prows, chunk_court, chunk_date
    )
    kw = dict(
        court_table=jnp.ones((B, 8), bool),
        date_lo=jnp.zeros(B, jnp.int32),
        date_hi=jnp.full(B, 100, jnp.int32),
        trie_rows=jnp.full((B, 4), -1, jnp.int32),
        trie_src=jnp.full((B, 4), 3, jnp.int32),
        trie_chunk_of_case=jnp.zeros(C, jnp.int32),
        min_similarity=jnp.full(B, -1e30, jnp.float32),
        exact_weight=jnp.full(B, 2.0, jnp.float32),
        k=5, nprobe=4,
    )
    a = fused_partitioned_topk(
        jnp.asarray(qv), jnp.asarray(cents), jnp.asarray(prows),
        jnp.asarray(pint8), jnp.asarray(pscale), None,
        jnp.asarray(chunk_case), jnp.asarray(chunk_court),
        jnp.asarray(chunk_date), recall_target=0.97,
        part_cword=pcw, part_cbit=pcb, part_date=pdt, **kw,
    )
    b = fused_partitioned_topk(
        jnp.asarray(qv), jnp.asarray(cents), jnp.asarray(prows),
        jnp.asarray(pint8), jnp.asarray(pscale), None,
        jnp.asarray(chunk_case), jnp.asarray(chunk_court),
        jnp.asarray(chunk_date), recall_target=0.97, **kw,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pack_court_words():
    table = np.zeros((2, 40), bool)
    table[0, [0, 31, 32, 39]] = True
    table[1, 5] = True
    w = np.asarray(ps.pack_court_words(jnp.asarray(table)))
    assert w.shape == (2, 2)
    assert w[0, 0] == (1 | (1 << 31)) % 2**32
    assert w[0, 1] == (1 | (1 << 7))
    assert w[1, 0] == 1 << 5 and w[1, 1] == 0


def test_pallas_gather_rescore_matches_xla():
    """Scalar-prefetch gather rescore (interpret mode) == the XLA
    take+einsum path."""
    import jax.numpy as jnp

    from trie_semantic_search_tpu.ops.pallas_scan import (
        pallas_gather_rescore,
    )
    from trie_semantic_search_tpu.ops.scoring import gather_rescore

    rng = np.random.default_rng(9)
    N, D, B, C = 4096, 64, 4, 24
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = rng.integers(0, N, (B, C)).astype(np.int32)
    a = pallas_gather_rescore(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(idx),
        interpret=True,
    )
    b = gather_rescore(jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_auto_tile_n_and_pad_align():
    """Big corpora get the 8192-row tile; everything else keeps TILE_N.
    pad_align_for targets always satisfy the chosen tile's divisibility."""
    assert ps.auto_tile_n(ps.TILE_N * 4) == ps.TILE_N
    assert ps.auto_tile_n(ps._BIG_N) == ps.TILE_N_BIG
    assert ps.auto_tile_n(ps._BIG_N + ps.TILE_N) == ps.TILE_N  # not divisible
    assert ps.auto_tile_n(8 * 1024 * 1024) == ps.TILE_N_BIG
    for n in (100, ps.TILE_N, ps._BIG_N - 5, ps._BIG_N + 5):
        align = ps.pad_align_for(n)
        npad = -(-n // align) * align
        assert npad % ps.auto_tile_n(npad) == 0
        assert npad % ps.TILE_N == 0  # every existing gate still holds


def test_fused_kernel_identical_across_tile_n():
    """The lane family is row % lanes under ANY tile size, so the fused
    scan's output is bit-identical across tile_n (the auto_tile_n switch
    can never change results, only grid-step overhead)."""
    B, D, N, V, K = 8, 64, 512, 16, 7
    q8, qs, cq, cs, court, date, table, lo, hi, ms = make_filtered_data(
        B, D, N, V, seed=11
    )
    outs = [
        ps.pallas_fused_topk(
            q8, qs, cq, cs, court, date, table, lo, hi, ms, k=K,
            tile_b=8, tile_n=tn, lanes=32, interpret=True,
        )
        for tn in (64, 128, 256)
    ]
    for v, i in outs[1:]:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(outs[0][0]))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(outs[0][1]))


def test_gather_rescore_segmented_matches_single():
    """Segmented rescore stores (Mosaic's ~4 GiB per-input cap) produce
    identical scores through BOTH the Pallas gather kernel (interpret)
    and the XLA fallback."""
    import jax.numpy as jnp

    from trie_semantic_search_tpu.ops.pallas_scan import (
        pallas_gather_rescore,
    )
    from trie_semantic_search_tpu.ops.scoring import gather_rescore

    rng = np.random.default_rng(13)
    N, D, B, C = 1536, 64, 4, 24
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, C)).astype(np.int32))
    segs = tuple(jnp.asarray(corpus[lo : lo + 512]) for lo in (0, 512, 1024))
    single = jnp.asarray(corpus)

    a1 = pallas_gather_rescore(q, single, idx, interpret=True)
    a2 = pallas_gather_rescore(q, segs, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    b1 = gather_rescore(q, single, idx)
    b2 = gather_rescore(q, segs, idx)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-4)


def test_split_rescore_corpus():
    from trie_semantic_search_tpu.ops import pallas_scan as psm

    v = (
        np.arange(100 * 8, dtype=np.float32).reshape(100, 8) + 1.0
    )  # 3.2 KB — fits in one segment; all-nonzero so pads are detectable
    segs = psm.split_rescore_corpus(v)
    # single segment, zero-padded up to the 32-row alignment lcm (the
    # gather kernel's group-start proof needs n % A == 0 for every dtype)
    assert len(segs) == 1 and segs[0].shape[0] == 128
    np.testing.assert_array_equal(segs[0][:100], v)
    assert not segs[0][100:].any()
    old = psm.GATHER_SEG_BYTES
    try:
        psm.GATHER_SEG_BYTES = 8 * 4 * 32  # 32 rows per segment
        segs = psm.split_rescore_corpus(v)
        assert [s.shape[0] for s in segs] == [32, 32, 32, 32]
        flat = np.concatenate(segs)
        np.testing.assert_array_equal(flat[:100], v)
        assert not flat[100:].any()
    finally:
        psm.GATHER_SEG_BYTES = old
