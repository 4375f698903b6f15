"""Round-3 probe-path validation AFTER the gather-rescore fix.

Measures the full fused partitioned program (probe kernel + Pallas
scalar-prefetch rescore over the SEGMENTED bf16 store — Mosaic caps one
kernel input at ~4 GiB) at the re-tuned (P, m) shapes, with recall@10
against the exact bf16 oracle computed on the SAME query sets. One JSON
line per config:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_probe_tune2.py
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
from trie_semantic_search_tpu.ops.pallas_scan import (  # noqa: E402
    partition_filter_columns,
)

C, mc, D = 16384, 512, 384
N = C * mc
K = 10
TRIALS = 3
R_LO, R_HI = 2, 6
SEGS = 4  # bf16 rescore store: 4 × 1.6 GB segments (cap is ~4 GiB)

print(f"device: {jax.devices()[0]}", file=sys.stderr)
SLAB = 128


def _slab_vectors(key):
    """One slab's centroid + normalised vectors (shared by both passes)."""
    kc, kn = jax.random.split(key)
    cent = jax.random.normal(kc, (SLAB, D), jnp.float32)
    cent /= jnp.linalg.norm(cent, axis=-1, keepdims=True)
    noise = jax.random.normal(kn, (SLAB, mc, D), jnp.float32)
    v = cent[:, None, :] + 0.35 * noise / np.sqrt(D)
    v /= jnp.linalg.norm(v, axis=-1, keepdims=True)
    return cent, v


@jax.jit
def gen_int8(keys):
    def one(key):
        cent, v = _slab_vectors(key)
        scale = jnp.max(jnp.abs(v), axis=-1) / 127.0
        q = jnp.clip(jnp.round(v / scale[..., None]), -127, 127)
        return cent, q.astype(jnp.int8), scale

    return jax.lax.map(one, keys)


@jax.jit
def gen_bf16(keys):
    def one(key):
        _, v = _slab_vectors(key)
        return v.astype(jnp.bfloat16)

    return jax.lax.map(one, keys)


keys = jax.random.split(jax.random.PRNGKey(0), C // SLAB)
cents, blocks, scales = jax.block_until_ready(gen_int8(keys))
ccent = cents.reshape(C, D)
kps = len(keys) // SEGS
corpus_segs = tuple(
    jax.block_until_ready(
        gen_bf16(keys[i * kps : (i + 1) * kps]).reshape(-1, D)
    )
    for i in range(SEGS)
)
SEG_ROWS = N // SEGS
chunk_case = jnp.arange(N, dtype=jnp.int32)
chunk_court = (chunk_case % 16).astype(jnp.int32)
chunk_date = (chunk_case % 20000).astype(jnp.int32)
print("corpus generated (segmented bf16 store)", file=sys.stderr)


def make_q(key, r, b):
    kp2, kn3 = jax.random.split(key)
    cl = jax.random.randint(kp2, (r, b), 0, C)
    out = ccent[cl] + 0.3 * jax.random.normal(
        kn3, (r, b, D), jnp.float32
    ) / np.sqrt(D)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


NSLAB = 16  # per segment


@jax.jit
def oracle_seg(qs, seg, base, carry_v, carry_i):
    def body(carry, slab):
        bv, bi = carry
        s, sbase = slab
        sc = jnp.einsum(
            "bd,nd->bn", qs.astype(jnp.bfloat16), s,
            preferred_element_type=jnp.float32,
        )
        v, i = jax.lax.top_k(sc, K)
        mv = jnp.concatenate([bv, v], axis=1)
        mi = jnp.concatenate([bi, i + sbase], axis=1)
        v2, pos = jax.lax.top_k(mv, K)
        return (v2, jnp.take_along_axis(mi, pos, axis=1)), None

    slabs = (
        seg.reshape(NSLAB, SEG_ROWS // NSLAB, D),
        base + jnp.arange(NSLAB, dtype=jnp.int32) * (SEG_ROWS // NSLAB),
    )
    (v, i), _ = jax.lax.scan(body, (carry_v, carry_i), slabs)
    return v, i


def oracle(qs):
    v = jnp.full((qs.shape[0], K), -jnp.inf, jnp.float32)
    i = jnp.full((qs.shape[0], K), -1, jnp.int32)
    for s, seg in enumerate(corpus_segs):
        v, i = oracle_seg(qs, seg, jnp.int32(s * SEG_ROWS), v, i)
    return v, i


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "rescore")
)
def loop(qs_r, cent, prows, pint8, pscale, cbf, pw, pb, pd, ccase,
         ccourt, cdate, k, nprobe, rescore, ct, dlo, dhi, tr, ts, msim,
         ew):
    def body(carry, qb):
        v, i, cases, src = fused_partitioned_topk(
            qb, cent, prows, pint8, pscale,
            cbf if rescore else None,
            ccase, ccourt, cdate,
            ct, dlo, dhi, tr, ts, ccase, msim, ew,
            k=k, nprobe=nprobe, overfetch=4, rescore_factor=4,
            recall_target=0.95, part_cword=pw, part_cbit=pb, part_date=pd,
            use_probe_kernel=True, probe_interpret=False,
        )
        return carry + v.sum(), i

    acc, idxs = jax.lax.scan(body, 0.0, qs_r)
    return acc, idxs


def run_config(name, group, nprobe, B, rescore=True):
    P = C // group
    m = mc * group
    cent = ccent.reshape(P, group, D).mean(axis=1)
    cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
    prows = jnp.arange(N, dtype=jnp.int32).reshape(P, m)
    pint8 = blocks.reshape(P, m, D)
    pscale = scales.reshape(P, m)
    pw, pb, pd = partition_filter_columns(
        np.asarray(prows), np.asarray(chunk_court), np.asarray(chunk_date)
    )
    salt = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    kq = jax.random.split(
        jax.random.PRNGKey((hash(name) + 7919 * salt) % (2**31)), 64
    ).reshape(2, 32, 2)
    qpools = {
        rv: [make_q(kq[ri, t], rv, B) for t in range(TRIALS + 1)]
        for ri, rv in enumerate((R_LO, R_HI))
    }
    jax.block_until_ready(qpools)
    ct = jnp.ones((B, 16), bool)
    dlo = jnp.zeros(B, jnp.int32)
    dhi = jnp.full(B, 2**31 - 1, jnp.int32)
    tr = jnp.full((B, 8), -1, jnp.int32)
    ts = jnp.full((B, 8), 3, jnp.int32)
    msim = jnp.full(B, 0.2, jnp.float32)
    ew = jnp.full(B, 2.0, jnp.float32)

    def run(rv, t):
        return loop(qpools[rv][t], cent, prows, pint8, pscale,
                    corpus_segs, pw, pb, pd, chunk_case, chunk_court,
                    chunk_date, K, nprobe, rescore, ct, dlo, dhi, tr, ts,
                    msim, ew)

    t0 = time.perf_counter()
    try:
        fetch_sync(run(R_LO, 0))
    except Exception as e:
        print(json.dumps({"config": name, "error": str(e)[:300]}))
        sys.stdout.flush()
        return
    compile_s = time.perf_counter() - t0
    step_s = timed_slope(run, R_LO, R_HI, trials=TRIALS)
    # recall on the R_HI trial-0 query set, oracle on the SAME flat slice
    _, idxs = run(R_HI, 0)
    got = np.asarray(idxs).reshape(R_HI * B, -1)[:, :K]
    _, oi = oracle(qpools[R_HI][0].reshape(R_HI * B, D))
    osets = np.asarray(oi)
    rec = float(np.mean([
        len(set(got[i].tolist()) & set(osets[i].tolist())) / K
        for i in range(len(got))
    ]))
    ms = step_s * 1000
    print(json.dumps({
        "config": name, "P": P, "m": m, "nprobe": nprobe, "batch": B,
        "rescore": rescore,
        "batch_ms": round(ms, 3), "qps": round(B / step_s, 1),
        "recall_at_10": round(rec, 4),
        "probed_mb_per_query": round(nprobe * m * D / 1e6, 1),
        "compile_s": round(compile_s, 1),
    }))
    sys.stdout.flush()


import os  # noqa: E402

DEFAULT = (
    "P8192_np16_B32:2:16:32 P8192_np32_B32:2:32:32 P8192_np16_B16:2:16:16 "
    "P8192_np16_B32_norescore:2:16:32:norescore "
    "P2048_np32_B32_baselineshape:8:32:32"
)
for spec in os.environ.get("TSS_CONFIGS", DEFAULT).split():
    parts = spec.split(":")
    name, group, nprobe, B = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    run_config(name, group, nprobe, B, rescore="norescore" not in parts[4:])
print("done", file=sys.stderr)
