"""Round-3 fused-scan tuning on the real TPU (VERDICT r2 items 1 + 3).

Measures pallas_fused_topk variants at CAP scale (8.4M x 384 int8) and at
shard scale (1M rows = 8.4M / 8 chips) to (a) close the gap to the HBM
floor — round 2 ran 5.7x over on the serving shape, with B=256/TILE_B=128
streaming the corpus twice — and (b) record kernel-grade QPS for the
per-shard program of the sharded serving path.

One JSON line per config to stdout. Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_scan_tune.py
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
from trie_semantic_search_tpu.ops.hybrid import quantize_queries  # noqa: E402
from trie_semantic_search_tpu.ops.pallas_scan import (  # noqa: E402
    pallas_fused_topk,
)

P, m, D = 2048, 4096, 384
N = P * m  # 8,388,608
K = 10
B = 256
TRIALS = 3
R_LO, R_HI = 2, 6
HBM_GBS = 819e9

print(f"device: {jax.devices()[0]}", file=sys.stderr)

# ---- clustered corpus generated on device (same recipe as bench capscale)
SLAB = 64


@jax.jit
def gen(keys):
    def one(key):
        kc, kn = jax.random.split(key)
        cent = jax.random.normal(kc, (SLAB, D), jnp.float32)
        cent /= jnp.linalg.norm(cent, axis=-1, keepdims=True)
        noise = jax.random.normal(kn, (SLAB, m, D), jnp.float32)
        v = cent[:, None, :] + 0.35 * noise / np.sqrt(D)
        v /= jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.max(jnp.abs(v), axis=-1) / 127.0
        q = jnp.clip(jnp.round(v / scale[..., None]), -127, 127)
        return cent, q.astype(jnp.int8), scale

    return jax.lax.map(one, keys)


keys = jax.random.split(jax.random.PRNGKey(0), P // SLAB)
cents, blocks, scales = jax.block_until_ready(gen(keys))
centroids = cents.reshape(P, D)
corpus_q = blocks.reshape(N, D)
corpus_scale = scales.reshape(N, 1)
chunk_court = (jnp.arange(N, dtype=jnp.int32) % 16).astype(jnp.int32)
chunk_date = (jnp.arange(N, dtype=jnp.int32) % 20000).astype(jnp.int32)
print("corpus generated", file=sys.stderr)


def make_q(key, r, b):
    kp2, kn3 = jax.random.split(key)
    part = jax.random.randint(kp2, (r, b), 0, P)
    out = centroids[part] + 0.3 * jax.random.normal(
        kn3, (r, b, D), jnp.float32
    ) / np.sqrt(D)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


kq = jax.random.split(jax.random.PRNGKey(11), 64).reshape(2, 32, 2)
qpools = {
    rv: [make_q(kq[ri, t], rv, B) for t in range(TRIALS + 1)]
    for ri, rv in enumerate((R_LO, R_HI))
}
jax.block_until_ready(qpools)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_b", "tile_n", "use_court", "use_date"),
)
def loop(qs_r, cq, cs, ccourt, cdate, ct, dlo, dhi, msim, k, tile_b,
         tile_n, use_court, use_date):
    def body(carry, qb):
        q8, q_scale = quantize_queries(qb)
        v, i = pallas_fused_topk(
            q8, q_scale, cq, cs, ccourt, cdate, ct, dlo, dhi, msim,
            k=k, tile_b=tile_b, tile_n=tile_n,
            use_court=use_court, use_date=use_date,
        )
        return carry + v.sum(), i

    acc, idxs = jax.lax.scan(body, 0.0, qs_r)
    return acc, idxs


def run_config(name, n_rows, tile_b, tile_n, k=K, use_filters=True,
               bq=B):
    cq = corpus_q[:n_rows]
    cs = corpus_scale[:n_rows]
    cc = chunk_court[:n_rows]
    cd = chunk_date[:n_rows]
    ct = jnp.ones((bq, 16), bool)
    dlo = jnp.zeros(bq, jnp.int32)
    dhi = jnp.full(bq, 2**31 - 1, jnp.int32)
    msim = jnp.full(bq, 0.2, jnp.float32)

    def run(rv, t):
        q = qpools[rv][t][:, :bq]
        return loop(q, cq, cs, cc, cd, ct, dlo, dhi, msim, k, tile_b,
                    tile_n, use_filters, use_filters)

    t0 = time.perf_counter()
    try:
        fetch_sync(run(R_LO, 0))
    except Exception as e:
        print(json.dumps({"config": name, "error": str(e)[:400]}))
        sys.stdout.flush()
        return
    compile_s = time.perf_counter() - t0
    step_s = timed_slope(run, R_LO, R_HI, trials=TRIALS)
    ms = step_s * 1000
    floor_ms = n_rows * D / HBM_GBS * 1000
    print(json.dumps({
        "config": name, "rows": n_rows, "batch": bq, "k": k,
        "tile_b": tile_b, "tile_n": tile_n, "filters": use_filters,
        "batch_ms": round(ms, 2), "qps": round(bq / step_s, 1),
        "hbm_floor_ms": round(floor_ms, 2),
        "x_over_floor": round(ms / floor_ms, 2),
        "compile_s": round(compile_s, 1),
    }))
    sys.stdout.flush()


# baseline (round-2 serving shape): two corpus passes at B=256
run_config("base_tb128", N, 128, 2048)
# one corpus pass: both query tiles resident
run_config("tb256", N, 256, 2048)
# bigger corpus tiles (fewer grid steps, larger DMA)
run_config("tb256_tn4096", N, 256, 4096)
run_config("tb256_tn8192", N, 256, 8192)
# filter mask work compiled away
run_config("tb256_nofilter", N, 256, 2048, use_filters=False)
# serving-k (n_keep=3) at the best single-pass shape
run_config("tb256_k160", N, 256, 2048, k=160)
# per-shard program at shard-scale N (8.4M over 8 chips)
NS = N // 8
run_config("shard_1M_tb256", NS, 256, 2048)
run_config("shard_1M_tb128", NS, 128, 2048)
print("done", file=sys.stderr)
