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
