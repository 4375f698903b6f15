"""Round-4 encode+scan fusion profile (round-3 VERDICT item 9 / weak 7).

Round 3 recorded an unexplained gap: the fused encode+scan step measured
~8 ms while its parts measured ~3.6 ms summed (docs/ROADMAP.md). This
driver slope-times, with identical shapes and the tunnel overhead
cancelled:

  * encode    — MiniLM forward alone
  * scan      — fused hybrid scan alone (embeddings precomputed)
  * fused     — one dispatch doing encode + scan (the serving program)
  * pipelined — two back-to-back dispatches (encode, then scan)

and reports fused / (encode + scan). Done-criterion: fused <= 1.3x the
sum of its parts, or the numbers to explain why not. Runs on whatever
backend is up (CPU fallback measures XLA:CPU scheduling, not the MXU —
re-run on the TPU when the relay returns).

Usage: python scripts/r4_fusion_profile.py [--chunks 262144] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

guard_dead_tpu_relay()

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=262_144)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import timed_slope
    from trie_semantic_search_tpu.models import minilm
    from trie_semantic_search_tpu.ops.hybrid import fused_hybrid_topk

    dev = jax.devices()[0]
    N, D, B, L, K = args.chunks, 384, args.batch, 64, 10
    R = args.reps

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    @jax.jit
    def make_corpus(k):
        v = jax.random.normal(k, (N, D), jnp.float32)
        v /= jnp.linalg.norm(v, axis=1, keepdims=True)
        scale = jnp.max(jnp.abs(v), axis=1, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    corpus_q, corpus_scale = jax.block_until_ready(make_corpus(kc))
    config = minilm.MiniLMConfig()
    params = jax.device_put(minilm.init_params(jax.random.PRNGKey(1), config))

    rng = np.random.default_rng(2)
    n_cases = N // 4
    chunk_case = jnp.asarray(rng.integers(0, n_cases, N), jnp.int32)
    chunk_court = jnp.asarray(rng.integers(0, 16, N), jnp.int32)
    chunk_date = jnp.asarray(rng.integers(0, 40000, N), jnp.int32)
    court_table = jnp.ones((B, 16), bool)
    date_lo = jnp.zeros(B, jnp.int32)
    date_hi = jnp.full(B, 2**31 - 1, jnp.int32)
    rep_chunk = jnp.asarray(
        np.minimum(np.arange(n_cases, dtype=np.int32) * 4, N - 1))
    min_sim = jnp.full(B, 0.2, jnp.float32)
    ew = jnp.full(B, 2.0, jnp.float32)
    no_rows = jnp.full((B, 16), -1, jnp.int32)
    no_src = jnp.full((B, 16), 3, jnp.int32)

    corpus = (corpus_q, corpus_scale, chunk_case, chunk_court, chunk_date,
              rep_chunk)

    def scan_of(emb, c):
        cq, cs, cc, cco, cd, rc = c
        return fused_hybrid_topk(
            emb, cq, cs, cc, cco, cd, court_table, date_lo, date_hi,
            no_rows, no_src, rc, min_sim, ew, k=K, overfetch=4,
            recall_target=1.0,
        )

    # R-repetition loop programs (identical loop structure so slope units
    # match); per-rep distinct inputs via fold_in
    def enc_loop_fn(params, ids_r, mask, c):
        def body(acc, ids):
            e = minilm.encode(params, ids, mask, config)
            return acc + e.sum(), None
        return jax.lax.scan(body, 0.0, ids_r)[0]

    def scan_loop_fn(embs_r, c):
        def body(acc, e):
            v, i, cases, src = scan_of(e, c)
            return acc + v.sum(), None
        return jax.lax.scan(body, 0.0, embs_r)[0]

    def fused_loop_fn(params, ids_r, mask, c):
        def body(acc, ids):
            e = minilm.encode(params, ids, mask, config)
            v, i, cases, src = scan_of(e, c)
            return acc + v.sum(), None
        return jax.lax.scan(body, 0.0, ids_r)[0]

    enc_loop = jax.jit(enc_loop_fn)
    scan_loop = jax.jit(scan_loop_fn)
    fused_loop = jax.jit(fused_loop_fn)

    mask = jnp.ones((B, L), jnp.int32)
    ids_pool = {}
    emb_pool = {}
    for r in (2, R):
        ids_pool[r] = [jnp.asarray(
            np.random.default_rng(100 * r + t).integers(
                0, config.vocab_size, (r, B, L)), jnp.int32)
            for t in range(6)]
        emb_pool[r] = [jax.block_until_ready(jax.vmap(
            lambda i: minilm.encode(params, i, mask, config))(ids))
            for ids in ids_pool[r]]

    enc_s = timed_slope(
        lambda r, t: enc_loop(params, ids_pool[r][t], mask, corpus), 2, R)
    scan_s = timed_slope(
        lambda r, t: scan_loop(emb_pool[r][t], corpus), 2, R)
    fused_s = timed_slope(
        lambda r, t: fused_loop(params, ids_pool[r][t], mask, corpus), 2, R)

    # two-dispatch pipeline: encode program then scan program (what a
    # disaggregated serving loop would dispatch)
    enc_one = jax.jit(lambda p, i, m: minilm.encode(p, i, m, config))
    scan_one = jax.jit(lambda e, c: scan_of(e, c)[0].sum())
    jax.block_until_ready(enc_one(params, ids_pool[2][0][0], mask))
    jax.block_until_ready(scan_one(emb_pool[2][0][0], corpus))
    ts = []
    for t in range(5):
        t0 = time.perf_counter()
        e = enc_one(params, ids_pool[R][t][0], mask)
        jax.block_until_ready(scan_one(e, corpus))
        ts.append(time.perf_counter() - t0)
    pipelined_ms = sorted(ts)[len(ts) // 2] * 1000

    out = {
        "device": str(dev), "chunks": N, "batch": B,
        "encode_ms": round(enc_s * 1000, 3),
        "scan_ms": round(scan_s * 1000, 3),
        "sum_parts_ms": round((enc_s + scan_s) * 1000, 3),
        "fused_ms": round(fused_s * 1000, 3),
        "fused_over_sum": round(fused_s / (enc_s + scan_s), 3),
        "two_dispatch_ms": round(pipelined_ms, 3),
        "meets_1p3x": fused_s <= 1.3 * (enc_s + scan_s),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
