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


def test_sharded_fused_topk(mesh):
    """Multi-chip step-7: shard-local filtered scan + ICI merge + global
    lexical boost matches a NumPy oracle."""
    import jax
    from trie_semantic_search_tpu.parallel.collectives import sharded_fused_topk
    from trie_semantic_search_tpu.parallel import corpus_sharding, row_sharding

    rng = np.random.default_rng(12)
    N, D, B, K = 256, 32, 4, 6
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    from trie_semantic_search_tpu.ops import quantize_int8

    cq, cs = quantize_int8(corpus)
    chunk_case = rng.integers(0, 64, N).astype(np.int32)
    chunk_court = rng.integers(0, 4, N).astype(np.int32)
    chunk_date = rng.integers(0, 1000, N).astype(np.int32)
    court_table = rng.random((B, 4)) < 0.6
    date_lo = np.zeros(B, np.int32)
    date_hi = np.full(B, 800, np.int32)
    lex = np.full((B, 3), -1, np.int32)
    lex[0, 0] = 7  # query 0 has one lexical hit (case 7)
    queries = corpus[:B]
    min_sim = np.full(B, 0.3, np.float32)
    ew = np.full(B, 2.0, np.float32)

    csh = corpus_sharding(mesh)
    rsh = row_sharding(mesh)
    v, c = sharded_fused_topk(
        mesh,
        jnp.asarray(queries),
        jax.device_put(cq, csh),
        jax.device_put(cs, csh),
        jax.device_put(jnp.asarray(chunk_case), rsh),
        jax.device_put(jnp.asarray(chunk_court), rsh),
        jax.device_put(jnp.asarray(chunk_date), rsh),
        jnp.asarray(court_table),
        jnp.asarray(date_lo),
        jnp.asarray(date_hi),
        jnp.asarray(lex),
        jnp.asarray(min_sim),
        jnp.asarray(ew),
        k=K,
    )
    v, c = np.array(v), np.array(c)

    # numpy oracle
    scores = queries @ corpus.T  # approx (int8 error ~0.03)
    keep = (
        court_table[:, chunk_court]
        & (chunk_date[None, :] >= date_lo[:, None])
        & (chunk_date[None, :] <= date_hi[:, None])
        & (scores >= min_sim[:, None])
    )
    masked = np.where(keep, scores, -np.inf)
    for b in range(B):
        order = np.argsort(-masked[b], kind="stable")[:K]
        expected_cases = [chunk_case[i] for i in order if np.isfinite(masked[b][i])]
        got = [x for x in c[b] if x >= 0]
        if b == 0:
            assert got[0] == 7 and v[0, 0] == 2.0  # lexical boost first
            got = got[1:]
        # int8 scoring: allow small rank jitter, compare as sets mostly
        overlap = len(set(got) & set(expected_cases)) / max(1, len(got))
        assert overlap >= 0.6, (got, expected_cases)
