"""Round-3 probe-path tuning on the real TPU (VERDICT r2 item 4).

The latency-regime partitioned path saturated at 6.4k QPS in round 2 —
per-query DMA-bound at nprobe*m*D bytes (round-2 shape: 32*4096*384 =
50 MB/query). This sweep re-tunes (P, m, nprobe) at fixed corpus size:
smaller partitions cut the probed bytes linearly while clustered recall
holds (the query's neighbours share its partition).

Corpus: 8.4M rows as 16384 natural clusters of 512, generated on device
partition-major. Configs regroup c clusters per partition (centroid =
normalised group mean), so every config scans the same corpus and the
same query set. Recall@10 vs the exact bf16 oracle (slab scan).

One JSON line per config to stdout:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_probe_tune.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import fetch_sync, timed_slope  # noqa: E402
from trie_semantic_search_tpu.ops.hybrid import (  # noqa: E402
    fused_partitioned_topk,
)

C, mc, D = 16384, 512, 384  # clusters x members
N = C * mc  # 8,388,608
K = 10
TRIALS = 3
R_LO, R_HI = 2, 6
HBM_GBS = 819e9

print(f"device: {jax.devices()[0]}", file=sys.stderr)

SLAB = 128  # clusters per generation step


@jax.jit
def gen(keys):
    def one(key):
        kc, kn = jax.random.split(key)
        cent = jax.random.normal(kc, (SLAB, D), jnp.float32)
        cent /= jnp.linalg.norm(cent, axis=-1, keepdims=True)
        noise = jax.random.normal(kn, (SLAB, mc, D), jnp.float32)
        v = cent[:, None, :] + 0.35 * noise / np.sqrt(D)
        v /= jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.max(jnp.abs(v), axis=-1) / 127.0
        q = jnp.clip(jnp.round(v / scale[..., None]), -127, 127)
        return cent, q.astype(jnp.int8), scale, v.astype(jnp.bfloat16)

    return jax.lax.map(one, keys)


keys = jax.random.split(jax.random.PRNGKey(0), C // SLAB)
cents, blocks, scales, vbf = jax.block_until_ready(gen(keys))
ccent = cents.reshape(C, D)  # cluster centroids
corpus_bf16 = vbf.reshape(N, D)
del vbf
chunk_case = jnp.arange(N, dtype=jnp.int32)
chunk_court = (chunk_case % 16).astype(jnp.int32)
chunk_date = (chunk_case % 20000).astype(jnp.int32)
print("corpus generated", file=sys.stderr)

BMAX = 32


def make_q(key, r, b):
    kp2, kn3 = jax.random.split(key)
    cl = jax.random.randint(kp2, (r, b), 0, C)
    out = ccent[cl] + 0.3 * jax.random.normal(
        kn3, (r, b, D), jnp.float32
    ) / np.sqrt(D)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


kq = jax.random.split(jax.random.PRNGKey(11), 64).reshape(2, 32, 2)
qpools = {
    rv: [make_q(kq[ri, t], rv, BMAX) for t in range(TRIALS + 1)]
    for ri, rv in enumerate((R_LO, R_HI))
}
jax.block_until_ready(qpools)

# exact bf16 oracle for the recall query set (qpools[R_HI][0])
NSLAB = 64


@jax.jit
def oracle(qs, corpus):
    def body(carry, slab):
        bv, bi = carry
        s, base = slab
        sc = jnp.einsum(
            "bd,nd->bn", qs.astype(jnp.bfloat16), s,
            preferred_element_type=jnp.float32,
        )
        v, i = jax.lax.top_k(sc, K)
        mv = jnp.concatenate([bv, v], axis=1)
        mi = jnp.concatenate([bi, i + base], axis=1)
        v2, pos = jax.lax.top_k(mv, K)
        return (v2, jnp.take_along_axis(mi, pos, axis=1)), None

    init = (
        jnp.full((qs.shape[0], K), -jnp.inf, jnp.float32),
        jnp.full((qs.shape[0], K), -1, jnp.int32),
    )
    slabs = (
        corpus.reshape(NSLAB, N // NSLAB, D),
        (jnp.arange(NSLAB, dtype=jnp.int32) * (N // NSLAB)),
    )
    (v, i), _ = jax.lax.scan(body, init, slabs)
    return v, i


recall_qs = qpools[R_HI][0].reshape(-1, D)  # [R_HI*BMAX, D]
print("computing oracle...", file=sys.stderr)
_, oracle_idx = jax.block_until_ready(
    oracle(recall_qs[:128], corpus_bf16)
)
oracle_sets = np.asarray(oracle_idx)
print("oracle done", file=sys.stderr)


def common(B):
    return dict(
        court_table=jnp.ones((B, 16), bool),
        date_lo=jnp.zeros(B, jnp.int32),
        date_hi=jnp.full(B, 2**31 - 1, jnp.int32),
        trie_rows=jnp.full((B, 8), -1, jnp.int32),
        trie_src=jnp.full((B, 8), 3, jnp.int32),
        trie_chunk_of_case=chunk_case,
        min_similarity=jnp.full(B, 0.2, jnp.float32),
        exact_weight=jnp.full(B, 2.0, jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "B")
)
def loop(qs_r, cent, prows, pint8, pscale, cbf, ccase, ccourt, cdate,
         ct, dlo, dhi, tr, ts, tcc, msim, ew, k, nprobe, B):
    def body(carry, qb):
        v, i, cases, src = fused_partitioned_topk(
            qb, cent, prows, pint8, pscale, cbf, ccase, ccourt, cdate,
            ct, dlo, dhi, tr, ts, tcc, msim, ew,
            k=k, nprobe=nprobe, overfetch=4, rescore_factor=4,
            recall_target=0.95, use_probe_kernel=True,
            probe_interpret=False,
        )
        return carry + v.sum(), i

    acc, idxs = jax.lax.scan(body, 0.0, qs_r)
    return acc, idxs


def run_config(name, group, nprobe, B):
    P = C // group
    m = mc * group
    cent = ccent.reshape(P, group, D).mean(axis=1)
    cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
    prows = jnp.arange(N, dtype=jnp.int32).reshape(P, m)
    pint8 = blocks.reshape(P, m, D)
    pscale = scales.reshape(P, m)
    a = common(B)

    def run(rv, t):
        q = qpools[rv][t][:, :B]
        return loop(
            q, cent, prows, pint8, pscale, corpus_bf16, chunk_case,
            chunk_court, chunk_date, a["court_table"], a["date_lo"],
            a["date_hi"], a["trie_rows"], a["trie_src"],
            a["trie_chunk_of_case"], a["min_similarity"],
            a["exact_weight"], K, nprobe, B,
        )

    t0 = time.perf_counter()
    try:
        fetch_sync(run(R_LO, 0))
    except Exception as e:
        print(json.dumps({"config": name, "error": str(e)[:300]}))
        sys.stdout.flush()
        return
    compile_s = time.perf_counter() - t0
    step_s = timed_slope(run, R_LO, R_HI, trials=TRIALS)
    # recall on the oracle query set
    _, idxs = run(R_HI, 0)
    got = np.asarray(idxs).reshape(-1, idxs.shape[-1])[:, :K]
    npairs = min(len(got), len(oracle_sets))
    rec = float(np.mean([
        len(set(got[i].tolist()) & set(oracle_sets[i].tolist())) / K
        for i in range(npairs)
    ]))
    ms = step_s * 1000
    dma_mb = nprobe * m * D / 1e6
    print(json.dumps({
        "config": name, "P": P, "m": m, "nprobe": nprobe, "batch": B,
        "batch_ms": round(ms, 3), "qps": round(B / step_s, 1),
        "recall_at_10": round(rec, 4),
        "probed_mb_per_query": round(dma_mb, 1),
        "dma_floor_ms": round(B * nprobe * m * D / HBM_GBS * 1000, 2),
        "compile_s": round(compile_s, 1),
    }))
    sys.stdout.flush()


# round-2 baseline shape (P=2048, m=4096)
run_config("P2048_np32_B16", 8, 32, 16)
run_config("P2048_np32_B32", 8, 32, 32)
# finer partitions: linearly less probed DMA per query
run_config("P8192_np32_B32", 2, 32, 32)
run_config("P8192_np16_B32", 2, 16, 32)
run_config("P8192_np64_B32", 2, 64, 32)
run_config("P16384_np32_B32", 1, 32, 32)
run_config("P16384_np64_B32", 1, 64, 32)
run_config("P16384_np64_B16", 1, 64, 16)
run_config("P16384_np128_B32", 1, 128, 32)
print("done", file=sys.stderr)
