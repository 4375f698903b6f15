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
