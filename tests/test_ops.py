"""Device-op tests: top-k, scoring, quantization, dedup — against NumPy
oracles (SURVEY.md §4: golden tests vs brute-force oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trie_semantic_search_tpu.ops import (
    brute_force_topk,
    chunked_topk,
    cosine_scores,
    cosine_scores_int8,
    exact_topk,
    gather_rescore,
    l2_normalize,
    merge_topk,
    quantize_int8,
    segment_max_dedup,
)


def np_topk(scores: np.ndarray, k: int):
    idx = np.argsort(-scores, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_exact_topk_matches_numpy(rng):
    s = rng.standard_normal((4, 100)).astype(np.float32)
    v, i = exact_topk(jnp.asarray(s), 10)
    nv, ni = np_topk(s, 10)
    np.testing.assert_allclose(np.asarray(v), nv, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_topk_deterministic_tie_break():
    s = jnp.zeros((1, 16))
    _, i = exact_topk(s, 4)
    np.testing.assert_array_equal(np.asarray(i)[0], [0, 1, 2, 3])


def test_chunked_topk_exact(rng):
    s = rng.standard_normal((3, 512)).astype(np.float32)
    v, i = chunked_topk(jnp.asarray(s), 16, num_chunks=8)
    nv, ni = np_topk(s, 16)
    np.testing.assert_allclose(np.asarray(v), nv, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_chunked_topk_fallback_non_divisible(rng):
    s = rng.standard_normal((2, 100)).astype(np.float32)
    v, i = chunked_topk(jnp.asarray(s), 7, num_chunks=8)
    nv, _ = np_topk(s, 7)
    np.testing.assert_allclose(np.asarray(v), nv, rtol=1e-6)


def test_merge_topk(rng):
    # two shards of 50, global = concat
    s = rng.standard_normal((2, 100)).astype(np.float32)
    v0, i0 = np_topk(s[:, :50], 5)
    v1, i1 = np_topk(s[:, 50:], 5)
    values = jnp.stack([jnp.asarray(v0), jnp.asarray(v1)], axis=1)  # [B,S,k]
    indices = jnp.stack([jnp.asarray(i0), jnp.asarray(i1) + 50], axis=1)
    mv, mi = merge_topk(values, indices, 5)
    nv, ni = np_topk(s, 5)
    np.testing.assert_allclose(np.asarray(mv), nv, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mi), ni)


def test_cosine_scores_matches_numpy(rng):
    q = l2_normalize(jnp.asarray(rng.standard_normal((4, 64)), dtype=jnp.float32))
    c = l2_normalize(jnp.asarray(rng.standard_normal((32, 64)), dtype=jnp.float32))
    s = cosine_scores(q, c)
    expected = np.asarray(q) @ np.asarray(c).T
    np.testing.assert_allclose(np.asarray(s), expected, atol=1e-5)
    assert np.all(np.asarray(s) <= 1.0 + 1e-5)


def test_quantize_int8_roundtrip(rng):
    v = rng.standard_normal((16, 64)).astype(np.float32)
    q, scale = quantize_int8(v)
    assert q.dtype == jnp.int8
    recon = np.asarray(q, dtype=np.float32) * np.asarray(scale)
    np.testing.assert_allclose(recon, v, atol=np.abs(v).max() / 127 + 1e-6)


def test_int8_scores_close_to_f32(rng):
    q = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)))
    c = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)))
    cq, cs = quantize_int8(c)
    s8 = cosine_scores_int8(jnp.asarray(q), cq, cs)
    sf = q @ c.T
    np.testing.assert_allclose(np.asarray(s8), sf, atol=0.03)


def test_int8_topk_recall(rng):
    """int8 scoring must preserve top-10 recall ≥ 0.9 before rescoring."""
    q = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((8, 384)), jnp.float32)))
    c = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((2000, 384)), jnp.float32)))
    cq, cs = quantize_int8(c)
    s8 = np.asarray(cosine_scores_int8(jnp.asarray(q), cq, cs))
    _, i8 = np_topk(s8, 10)
    _, it = np_topk(q @ c.T, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i8, it)])
    assert recall >= 0.9


def test_brute_force_topk(rng):
    q = l2_normalize(jnp.asarray(rng.standard_normal((4, 64)), jnp.float32))
    c = l2_normalize(jnp.asarray(rng.standard_normal((256, 64)), jnp.float32))
    v, i = jax.jit(lambda q, c: brute_force_topk(q, c, 10))(q, c)
    nv, ni = np_topk(np.asarray(q) @ np.asarray(c).T, 10)
    np.testing.assert_allclose(np.asarray(v), nv, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ni)


def test_gather_rescore(rng):
    q = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((100, 32)), jnp.float32)
    idx = jnp.asarray([[0, 5, 99], [1, 2, 3]], jnp.int32)
    out = gather_rescore(q, c, idx)
    expected = np.einsum("bd,bcd->bc", np.asarray(q), np.asarray(c)[np.asarray(idx)])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_segment_max_dedup():
    vals = jnp.asarray([[0.9, 0.8, 0.7, 0.6], [0.5, 0.5, 0.4, 0.3]], jnp.float32)
    segs = jnp.asarray([[2, 2, 1, 1], [0, 0, 0, 5]], jnp.int32)
    out = np.asarray(segment_max_dedup(vals, segs, 8))
    # row 0: keep 0.9 (seg2 max) and 0.7 (seg1 max)
    np.testing.assert_allclose(out[0], [0.9, -np.inf, 0.7, -np.inf])
    # row 1: 0.5 tie → keep first occurrence only
    np.testing.assert_allclose(out[1], [0.5, -np.inf, -np.inf, 0.3])


def test_segment_max_dedup_invalid_ids():
    vals = jnp.asarray([[1.0, 2.0]], jnp.float32)
    segs = jnp.asarray([[-1, 3]], jnp.int32)
    out = np.asarray(segment_max_dedup(vals, segs, 4))
    np.testing.assert_allclose(out[0], [-np.inf, 2.0])
