"""Benchmark: full hybrid query step on one TPU chip.

Measures the serving hot path end-to-end on device — MiniLM query encoding
(full 6-layer 384-d model) + int8 cosine scan over a CAP-scale synthetic
corpus shard + exact top-k, together with the batched trie walk — and
reports QPS/chip.

Baseline: the reference's stated concurrent-throughput target is
"hundreds of QPS" (``/root/reference/README.md:140``); ``vs_baseline`` is
the ratio against 500 QPS (the top of "hundreds"). The BASELINE.json north
star is >10,000 QPS/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def fetch_sync(res) -> None:
    """Force a dispatched computation to actually finish.

    Timing discipline for the remote-TPU tunnel (all measured here):
      * repeated identical (executable, inputs) dispatches are CACHED by
        the serving layer (~0.1 ms returns) — every timed dispatch must use
        distinct inputs;
      * ``block_until_ready`` can acknowledge a pipelined dispatch BEFORE
        remote execution (measured 0.1 ms acks with the real cost appearing
        at the next fetch) — only fetching a value derived from the result
        is a reliable sync point;
      * a synced dispatch carries ~60 ms of tunnel round-trip — amortize by
        timing two in-program repetition counts and taking the SLOPE.
    """
    leaf = res
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    np.asarray(leaf).ravel()[:1]


def timed_slope(run, r_lo: int, r_hi: int, trials: int = 4) -> float:
    """Seconds per unit of in-program repetition: run(r, trial) dispatches
    a program doing ``r`` repetitions with trial-distinct inputs; the fixed
    tunnel overhead cancels in the (r_hi - r_lo) difference."""
    med = {}
    for r in (r_lo, r_hi):
        fetch_sync(run(r, 0))  # compile + drain
        ts = []
        for t in range(trials):
            t0 = time.perf_counter()
            fetch_sync(run(r, t + 1))
            ts.append(time.perf_counter() - t0)
        med[r] = statistics.median(ts)
    return max((med[r_hi] - med[r_lo]) / (r_hi - r_lo), 1e-9)


def build_synthetic_trie(num_paths: int = 20000, vocab: int = 5000, seed: int = 0):
    from trie_semantic_search_tpu.index.trie import TrieBuilder

    rng = np.random.default_rng(seed)
    b = TrieBuilder()
    paths = []
    for row in range(num_paths):
        path = [f"w{t}" for t in rng.integers(0, vocab, rng.integers(2, 8))]
        b.insert(path, row)
        paths.append(path)
    return b.freeze(), paths


def main() -> None:
    """CAP-scale headline (round-3 VERDICT item 3): the COMPLETE hybrid
    query step — encode + trie walk + fused PARTITIONED scan (the serving
    default above the brute break-even) — on a >=5M-chunk corpus, with the
    exact-mode cost and the approximate path's recall vs the exact int8
    oracle measured alongside (VERDICT item 8). One JSON line to stdout;
    detail lines to stderr. The corpus is generated ON DEVICE from a fixed
    PRNG key in partition-major layout (a converged-k-means equivalent), so
    there is no host-side build to cache — regeneration IS the cache."""
    import os

    import jax
    import jax.numpy as jnp

    from trie_semantic_search_tpu.models import minilm
    from trie_semantic_search_tpu.ops.hybrid import (
        fused_hybrid_topk_chunked,
        fused_layout_brute_topk,
        fused_partitioned_topk,
        pick_num_chunks,
    )
    from trie_semantic_search_tpu.ops.pallas_scan import (
        partition_filter_columns,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"bench device: {dev}", file=sys.stderr)

    P = int(os.environ.get("TSS_BENCH_P", 5120))
    m = int(os.environ.get("TSS_BENCH_M", 1024))  # round-3 tuned layout
    N = P * m  # 5,242,880 at defaults
    D = 384
    L = 64  # query token length
    K = 10
    NPROBE = int(os.environ.get("TSS_BENCH_NPROBE", 64))  # r3 tuned value
    RT = 0.97  # fused_recall_target serving default (core/config.py)
    # the single dev core crawls at TPU batch sizes — scale the fallback
    # run down (the driver contract only needs the line to complete)
    B = 256 if on_tpu else 64
    TRIALS = 10 if on_tpu else 3
    R_LO, R_HI = (2, 8) if on_tpu else (1, 3)
    B_REC = 64  # recall-measurement queries (vs the exact oracle)

    # ---- corpus: clustered, generated on device in partition-major layout
    # (deterministic across backends: threefry bits; no host transfer)
    SLAB = min(64, P)

    @jax.jit
    def gen(keys):
        """Cluster + duplicate structured corpus (round-4 VERDICT item 3:
        real CAP embeddings are duplicate-heavy and cross-clustered; an
        unstructured random corpus lets tiny nprobe reach recall 1.0 for
        free). Two structural properties make nprobe be EARNED here:

        * super-topic clustering — each slab's 64 partition centroids are
          drawn around only 8 shared super-topics, so sibling partitions
          hold near-identical content and a query's true top-k spreads
          across several of them (the k-means-consistent version of CAP's
          topic clustering: rows still live in their NEAREST centroid's
          partition, but many partitions are near-duplicates of each
          other, so small nprobe misses real neighbours);
        * exact duplicates — 10% of rows are bitwise copies of their
          in-partition neighbour (adjacent row ids, usually adjacent
          cases), the boilerplate-duplication shape that broke round-3
          tuning, exercising deterministic tie-breaking in both the
          oracle and probe paths."""
        def one(key):
            kg, kc, kn, kd = jax.random.split(key, 4)
            G = 8  # super-topics per 64-partition slab
            sup = jax.random.normal(kg, (G, D), jnp.float32)
            sup /= jnp.linalg.norm(sup, axis=-1, keepdims=True)
            cent = sup[jnp.arange(SLAB) // (SLAB // G)] + (
                0.25 * jax.random.normal(kc, (SLAB, D), jnp.float32)
                / np.sqrt(D)
            )
            cent /= jnp.linalg.norm(cent, axis=-1, keepdims=True)
            noise = jax.random.normal(kn, (SLAB, m, D), jnp.float32)
            v = cent[:, None, :] + 0.35 * noise / np.sqrt(D)
            v /= jnp.linalg.norm(v, axis=-1, keepdims=True)
            dup = jax.random.uniform(kd, (SLAB, m)) < 0.10
            v = jnp.where(dup[..., None], jnp.roll(v, 1, axis=1), v)
            scale = jnp.max(jnp.abs(v), axis=-1) / 127.0
            q = jnp.clip(jnp.round(v / scale[..., None]), -127, 127)
            return cent, q.astype(jnp.int8), scale
        return jax.lax.map(one, keys)

    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.PRNGKey(0), P // SLAB)
    cents, blocks, scales = jax.block_until_ready(gen(keys))
    centroids = cents.reshape(P, D)
    part_int8 = blocks.reshape(P, m, D)
    part_scale = scales.reshape(P, m)
    part_rows = jnp.arange(N, dtype=jnp.int32).reshape(P, m)
    print(
        f"corpus: {N} chunks x {D} (int8 "
        f"{part_int8.nbytes / 2**30:.2f} GB) generated in "
        f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
    )

    # chunk metadata columns (4 chunks per case) + partitioned filter
    # encodings for the probe path
    n_cases = N // 4
    chunk_case = (jnp.arange(N, dtype=jnp.int32) // 4).astype(jnp.int32)
    chunk_court = (chunk_case % 16).astype(jnp.int32)
    chunk_date = (chunk_case % 40000).astype(jnp.int32)
    rep_chunk = jnp.minimum(
        jnp.arange(n_cases, dtype=jnp.int32) * 4, N - 1
    )
    pcw, pcb, pdt = partition_filter_columns(
        np.asarray(part_rows), np.asarray(chunk_court), np.asarray(chunk_date)
    )

    def filt(b):
        return dict(
            court_table=jnp.ones((b, 16), bool),
            date_lo=jnp.zeros(b, jnp.int32),
            date_hi=jnp.full(b, 2**31 - 1, jnp.int32),
            min_similarity=jnp.full(b, 0.2, jnp.float32),
            exact_weight=jnp.full(b, 2.0, jnp.float32),
        )

    # ---- model ----
    config = minilm.MiniLMConfig()
    params = jax.device_put(minilm.init_params(jax.random.PRNGKey(1), config))

    # ---- trie (device arrays) ----
    trie, paths = build_synthetic_trie()
    eo, et, tg, po, pc, _se, ie, _pw = trie.device()
    rng = np.random.default_rng(7)
    tq = np.full((B, 8), -1, np.int32)
    for i in range(B):
        p = paths[rng.integers(0, len(paths))]
        ids = [trie.vocab[t] for t in p][:8]
        tq[i, : len(ids)] = ids
    trie_queries = jnp.asarray(tq)

    from trie_semantic_search_tpu.ops.hybrid import resolve_probe_kernel
    from trie_semantic_search_tpu.ops.trie_kernels import (
        batched_walk,
        gather_postings,
    )

    upk, pik = resolve_probe_kernel(RT, m, D)
    fb = filt(B)

    # the corpus/trie arrays are EXPLICIT jit arguments, never closed-over:
    # a captured device array lowers as an HLO constant, which (a) bloats
    # the compile payload shipped over the remote-compile tunnel by the
    # corpus size (~2.2 GB here) and (b) duplicates it in HBM
    corpus_args = (
        centroids, part_rows, part_int8, part_scale,
        chunk_case, chunk_court, chunk_date, rep_chunk, pcw, pcb, pdt,
    )
    trie_args = (eo, et, tg, po, pc, ie)

    # ---- exact oracle + serving-grade nprobe selection -----------------
    # Builds persist a tuned_nprobe chosen by the min-recall tuner
    # (index/tuning.py, vector.hnsw.tune_on_build); the bench corpus has
    # no artifact, so the same selection runs here: smallest nprobe whose
    # recall@K vs the exact int8 oracle meets the serving recall target
    # AND whose worst single query clears a min floor (round-4 ADVICE:
    # mean-only over easy queries is not the real tuner's acceptance).
    # Tuning queries and the finally-reported recall use DISJOINT query
    # sets (round-4 VERDICT item 3: tuning and scoring on the same 64
    # queries is self-grading). Queries live IN the corpus embedding
    # space (perturbed centroid members) so overlap is meaningful.
    kq = jax.random.PRNGKey(7)
    kp, kn2 = jax.random.split(kq)
    qpart = jax.random.randint(kp, (2 * B_REC,), 0, P)
    qv_all = centroids[qpart] + 0.3 * jax.random.normal(
        kn2, (2 * B_REC, D), jnp.float32
    ) / np.sqrt(D)
    qv_all = qv_all / jnp.linalg.norm(qv_all, axis=-1, keepdims=True)
    qv, qv_eval = qv_all[:B_REC], qv_all[B_REC:]  # tune | held-out
    fr = filt(B_REC)
    no_trie = jnp.full((B_REC, 16), -1, jnp.int32)
    no_src = jnp.full((B_REC, 16), 3, jnp.int32)

    def make_approx(nprobe):
        @jax.jit
        def approx_scan(q, corpus):
            (cents, prows, pint8, pscale,
             ccase, ccourt, cdate, repc, w, b_, d_) = corpus
            r = fused_partitioned_topk(
                q, cents, prows, pint8, pscale, None,
                ccase, ccourt, cdate,
                fr["court_table"], fr["date_lo"], fr["date_hi"],
                no_trie, no_src, repc,
                fr["min_similarity"], fr["exact_weight"],
                k=K, nprobe=nprobe, overfetch=1, rescore_factor=4,
                recall_target=RT, part_cword=w, part_cbit=b_, part_date=d_,
                use_probe_kernel=upk, probe_interpret=pik,
            )
            return r[0], r[1]  # (scores, case rows)
        return approx_scan

    def make_approx_stream():
        """Layout-brute (stream) mode at the recall batch size — the
        engine's large-batch serving program over the same partition
        blocks (ops.hybrid.fused_layout_brute_topk)."""
        nc = pick_num_chunks(N, B_REC, K)

        @jax.jit
        def stream_scan(q, corpus):
            (cents, prows, pint8, pscale,
             ccase, ccourt, cdate, repc, w, b_, d_) = corpus
            r = fused_layout_brute_topk(
                q, prows, pint8, pscale, None,
                ccourt.reshape(P, m), cdate.reshape(P, m),
                ccase, ccourt, cdate,
                fr["court_table"], fr["date_lo"], fr["date_hi"],
                no_trie, no_src, repc,
                fr["min_similarity"], fr["exact_weight"],
                k=K, overfetch=1, num_chunks=nc, recall_target=RT,
            )
            return r[0], r[1]
        return stream_scan

    corpus_q = part_int8.reshape(N, D)
    corpus_scale = part_scale.reshape(N, 1)

    @jax.jit
    def exact_scan(q, cq, cscale, ccase, ccourt, cdate, repc):
        r = fused_hybrid_topk_chunked(
            q, cq, cscale, ccase, ccourt, cdate,
            fr["court_table"], fr["date_lo"], fr["date_hi"],
            no_trie, no_src, repc,
            fr["min_similarity"], fr["exact_weight"],
            k=K, overfetch=1, num_chunks=16, recall_target=1.0,
        )
        return r[0], r[1]  # (scores, case rows)

    exact_args = (corpus_q, corpus_scale, chunk_case, chunk_court,
                  chunk_date, rep_chunk)
    t0 = time.perf_counter()
    oracle = jax.device_get(
        jax.block_until_ready(exact_scan(qv, *exact_args))
    )
    exact_first_s = time.perf_counter() - t0  # compile + run
    # the held-out oracle reuses the compiled program (same shape); this
    # second, distinct-query dispatch also times the exact-mode steady
    # cost (one tunnel RTT included on TPU)
    t0 = time.perf_counter()
    oracle_eval = jax.device_get(
        jax.block_until_ready(exact_scan(qv_eval, *exact_args))
    )
    exact_dispatch_ms = (time.perf_counter() - t0) * 1000

    MIN_FLOOR = 0.95  # worst-single-query acceptance floor (ADVICE r4)
    _approx_cache: dict = {}

    def recall_at(nprobe: int, queries, oracle_pair):
        """(strict mean, strict min, tie-aware min) case recall@K vs the
        exact oracle. Tie-aware credit follows index/tuning.py's
        ADVICE-corrected formula — every oracle case scoring strictly
        above the k-th score is REQUIRED; substitutions are forgiven only
        at BITWISE-equal f32 score (both paths score rows as int32
        int8-dot × identical scales, so equal rows score bitwise-equal;
        any fp divergence just degrades toward the strict metric, never
        over-credits)."""
        o_vals, o_rows = oracle_pair
        if nprobe not in _approx_cache:
            _approx_cache[nprobe] = (
                make_approx_stream() if nprobe == "stream"
                else make_approx(nprobe)
            )
        s_vals, s_rows = jax.device_get(jax.block_until_ready(
            _approx_cache[nprobe](queries, corpus_args)
        ))
        strict, tie = [], []
        for b in range(len(o_rows)):
            # score over the oracle's REAL entries: dead (-1, -inf) slots —
            # identical dedup/threshold underfill on both sides — must not
            # count as misses (a set() over padded rows collapses every -1
            # into one element and silently caps recall below 1.0 even for
            # byte-identical results)
            oreal = [
                (int(r), float(v))
                for r, v in zip(o_rows[b], o_vals[b]) if r >= 0
            ]
            sset = {int(r) for r in s_rows[b] if r >= 0}
            d = max(len(oreal), 1)
            strict.append(len(sset & {r for r, _ in oreal}) / d)
            kth = oreal[-1][1] if oreal else -np.inf
            above = {r for r, v in oreal if v > kth}
            served_boundary = int(np.sum(
                (s_vals[b] == kth) & (np.asarray(s_rows[b]) >= 0)
            ))
            credit = len(sset & above) + min(
                d - len(above), served_boundary
            )
            # tie-aware credit is strict-plus-forgiveness: fp drift that
            # breaks the bitwise boundary equality must degrade TOWARD the
            # strict metric, never below it (a served set identical to the
            # oracle is always credit 1.0)
            tie.append(max(credit / d, strict[-1]))
        strict = np.asarray(strict)
        if os.environ.get("TSS_BENCH_DEBUG") and strict.min() < 1.0:
            b = int(np.argmin(strict))
            print(
                f"[debug nprobe={nprobe}] worst b={b} strict={strict[b]}\n"
                f"  oracle {list(zip(o_rows[b].tolist(), o_vals[b].tolist()))}\n"
                f"  served {list(zip(s_rows[b].tolist(), s_vals[b].tolist()))}",
                file=sys.stderr,
            )
        return float(strict.mean()), float(strict.min()), float(min(tie))

    if on_tpu:  # each candidate is one fresh compile — TPU only
        NPROBE_RUN, recall, recall_min, recall_tie_min = NPROBE, None, None, None
        last = None
        for cand in sorted({8, 16, 32, NPROBE}):
            if cand > NPROBE:
                continue
            mean_r, min_r, tie_r = recall_at(cand, qv, oracle)
            last = (cand, mean_r, min_r, tie_r)
            print(
                f"nprobe sweep: {cand} -> recall@{K} vs exact mean "
                f"{mean_r:.4f} min {min_r:.4f} tie-aware min {tie_r:.4f}",
                file=sys.stderr,
            )
            if mean_r >= RT and tie_r >= MIN_FLOOR:
                NPROBE_RUN, recall, recall_min, recall_tie_min = (
                    cand, mean_r, min_r, tie_r
                )
                break
        if recall is None:
            # target unreachable: serve the default. The sweep's last
            # iteration already measured NPROBE — reuse it instead of
            # re-paying a compile (ADVICE r4).
            assert last is not None and last[0] == NPROBE
            recall, recall_min, recall_tie_min = last[1], last[2], last[3]
    else:
        NPROBE_RUN = NPROBE
        recall, recall_min, recall_tie_min = recall_at(NPROBE, qv, oracle)
    # held-out score at the chosen operating point (same compiled program,
    # disjoint queries — the number the JSON reports)
    recall_eval, recall_eval_min, recall_eval_tie = recall_at(
        NPROBE_RUN, qv_eval, oracle_eval
    )
    print(
        f"exact mode: dispatch {exact_dispatch_ms:.1f} ms/{B_REC} queries "
        f"(first incl. compile {exact_first_s:.1f}s); serving mode "
        f"(recall_target={RT}, tie-aware floor={MIN_FLOOR}, "
        f"nprobe={NPROBE_RUN}) held-out recall@10 vs exact = mean "
        f"{recall_eval:.4f} min {recall_eval_min:.4f} tie-aware min "
        f"{recall_eval_tie:.4f} (tune-set mean {recall:.4f} min "
        f"{recall_min:.4f})", file=sys.stderr,
    )

    def make_query_step(nprobe):
        """The COMPLETE hybrid query program, SURVEY §7 step 7: encode +
        trie walk + fused semantic stage + device filters + lexical boost +
        dedup + top-k. ``nprobe`` is an int for the partitioned probe
        stage, or ``"stream"`` for the layout-brute stage (the engine's
        large-batch auto mode: one fused stream of the partition blocks per
        TILE_B query tile). The corpus was generated AS int8 so int8 scores
        are exact for it — no bf16 rescore copy needed."""
        nc_b = pick_num_chunks(N, B, K)

        @jax.jit
        def query_step(params, input_ids, attention_mask, trie_ids,
                       corpus, trie_arrs):
            (cents, prows, pint8, pscale,
             ccase, ccourt, cdate, repc, w, b_, d_) = corpus
            eo_, et_, tg_, po_, pc_, ie_ = trie_arrs
            emb = minilm.encode(params, input_ids, attention_mask, config)
            nodes = batched_walk(eo_, et_, tg_, trie_ids)
            rows, valid = gather_postings(po_, pc_, ie_, nodes, 16)
            lex_rows = jnp.where(valid, rows, -1)
            lex_src = jnp.full_like(lex_rows, 3)  # SRC_CONTENT
            if nprobe == "stream":
                v, i, cases, src = fused_layout_brute_topk(
                    emb, prows, pint8, pscale, None,
                    ccourt.reshape(P, m), cdate.reshape(P, m),
                    ccase, ccourt, cdate,
                    fb["court_table"], fb["date_lo"], fb["date_hi"],
                    lex_rows, lex_src, repc,
                    fb["min_similarity"], fb["exact_weight"],
                    k=K, overfetch=1, num_chunks=nc_b, recall_target=RT,
                )
            else:
                v, i, cases, src = fused_partitioned_topk(
                    emb, cents, prows, pint8, pscale, None,
                    ccase, ccourt, cdate,
                    fb["court_table"], fb["date_lo"], fb["date_hi"],
                    lex_rows, lex_src, repc,
                    fb["min_similarity"], fb["exact_weight"],
                    k=K, nprobe=nprobe, overfetch=1, rescore_factor=4,
                    recall_target=RT, part_cword=w, part_cbit=b_,
                    part_date=d_,
                    use_probe_kernel=upk, probe_interpret=pik,
                )
            return v, i, rows, valid
        return query_step

    # DISTINCT inputs for every timed dispatch + fetch-synced slope timing
    # (see fetch_sync for the measured tunnel pitfalls). Pre-materialised
    # per-trial device arrays — indexing a device array inside the timed
    # region would dispatch a slice op of its own.
    rng2 = np.random.default_rng(2)
    ids_t = [
        jnp.asarray(rng2.integers(0, config.vocab_size, (B, L)), jnp.int32)
        for _ in range(TRIALS + 1)
    ]
    mask = jnp.ones((B, L), jnp.int32)
    pools = {
        rv: [
            jnp.asarray(
                rng2.integers(0, config.vocab_size, (rv, B, L)), jnp.int32
            )
            for _ in range(TRIALS + 1)
        ]
        for rv in (R_LO, R_HI)
    }
    masks_r = {rv: jnp.ones((rv, B, L), jnp.int32) for rv in (R_LO, R_HI)}
    tries_r = {
        rv: jnp.broadcast_to(trie_queries, (rv, *trie_queries.shape))
        for rv in (R_LO, R_HI)
    }
    jax.block_until_ready((ids_t, pools))

    def measure_point(nprobe: int, trials: int) -> dict:
        """Compile + time the full hybrid program at one nprobe operating
        point: single-dispatch latency and slope-based steady-state QPS."""
        query_step = make_query_step(nprobe)

        @jax.jit
        def serving_loop(params, ids_r, mask_r, trie_r, corpus, trie_arrs):
            """R back-to-back query batches in one dispatch — the
            pipelined serving steady state."""
            def body(carry, xs):
                i, mm, tqs = xs
                v, ix, rows, valid = query_step(
                    params, i, mm, tqs, corpus, trie_arrs
                )
                return carry + v.sum(), (rows, valid)
            acc, (rows, valid) = jax.lax.scan(
                body, 0.0, (ids_r, mask_r, trie_r)
            )
            return acc, rows[-1], valid[-1]

        # warmup (compile the single-step program)
        t0 = time.perf_counter()
        out = query_step(
            params, ids_t[0], mask, trie_queries, corpus_args, trie_args
        )
        fetch_sync(out)
        print(
            f"query_step[nprobe={nprobe}] compiled+ran in "
            f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
        )

        # single-dispatch latency (includes the tunnel's ~30-60 ms
        # round-trip — reported separately; production serving runs
        # device-local)
        lat_times = []
        for t in range(trials):
            t0 = time.perf_counter()
            out = query_step(
                params, ids_t[t + 1], mask, trie_queries,
                corpus_args, trie_args,
            )
            fetch_sync(out)
            lat_times.append(time.perf_counter() - t0)
        dispatch_batch_ms = statistics.median(lat_times) * 1000

        # steady-state per-batch time: slope between R_LO and R_HI
        # in-program batches (tunnel overhead cancels exactly)
        def run_loop(rv, t):
            return serving_loop(
                params, pools[rv][t], masks_r[rv], tries_r[rv],
                corpus_args, trie_args,
            )

        step_s = timed_slope(run_loop, R_LO, R_HI, trials=trials)
        res = run_loop(R_HI, 0)
        out = (out[0], out[1], res[1], res[2])
        return {
            "nprobe": nprobe,
            "qps": B / step_s,
            "batch_ms": step_s * 1000,
            "dispatch_batch_ms": dispatch_batch_ms,
            "out": out,
        }

    # Operating points. 1: the tuned probe point (tune_on_build analogue —
    # what a built artifact serves small batches with). 2: the fixed
    # nprobe=64 serving default every prior recorded round timed, kept for
    # round-over-round comparability (round-4 VERDICT item 3: carry BOTH).
    # 3: the layout-brute stream — the engine's batch-aware auto mode
    # (search.fused._layout_brute_batch): at B·nprobe >= P·ceil(B/TILE_B)
    # the probe path reads MORE corpus rows than one fused stream of the
    # partition blocks, so serving streams. The headline is whatever mode
    # the engine would actually serve this batch size with, quality-gated
    # on held-out recall at the same target + floor as the tuner.
    num_tiles = -(-B // 256)
    stream_auto = B * NPROBE_RUN >= P * num_tiles
    stream_pt = stream_rec = None
    if stream_auto:
        stream_rec = recall_at("stream", qv_eval, oracle_eval)
        print(
            f"stream mode held-out recall@{K} vs exact: mean "
            f"{stream_rec[0]:.4f} min {stream_rec[1]:.4f} tie-aware min "
            f"{stream_rec[2]:.4f}", file=sys.stderr,
        )
        if not (stream_rec[0] >= RT and stream_rec[2] >= MIN_FLOOR):
            stream_auto = False  # quality gate failed: serve probed
    tuned_pt = measure_point(NPROBE_RUN, TRIALS)
    if NPROBE != NPROBE_RUN:
        default_pt = measure_point(NPROBE, max(3, TRIALS // 2))
    else:
        default_pt = tuned_pt
    if stream_auto:
        stream_pt = measure_point("stream", TRIALS)
        head_pt = stream_pt
        head_rec = stream_rec
        mode_str = (
            f"layout-brute stream (engine auto mode at B={B}: "
            f"B*nprobe={B * NPROBE_RUN} >= P*tiles={P * num_tiles} -> one "
            "fused corpus stream per query tile; held-out recall gated at "
            f"target {RT} + tie-aware floor {MIN_FLOOR}; probed operating "
            "points reported alongside)"
        )
    else:
        head_pt = tuned_pt
        head_rec = (recall_eval, recall_eval_min, recall_eval_tie)
        mode_str = (
            f"partitioned nprobe={NPROBE_RUN} recall_target={RT} "
            f"min_floor={MIN_FLOOR} (tuned on held-out exact-oracle "
            "queries over a cluster+duplicate-structured corpus; "
            "build-time tune_on_build analogue)"
        )
    qps, batch_ms = head_pt["qps"], head_pt["batch_ms"]
    dispatch_batch_ms = head_pt["dispatch_batch_ms"]
    out = head_pt["out"]

    # correctness spot-check: trie hits resolve to the right rows
    valid = np.asarray(out[3])
    hit_rate = float(valid.any(axis=1).mean())

    result = {
        "metric": "hybrid_query_qps_per_chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 500.0, 2),
        "batch_size": B,
        "corpus_chunks": N,
        "mode": mode_str,
        # every operating point (round-4 VERDICT item 3): the headline is
        # the engine's auto-mode pick for this batch size; the tuned and
        # fixed-default probe points keep round-over-round comparability
        # with every prior recorded bench
        "qps_tuned": round(tuned_pt["qps"], 1),
        "nprobe_tuned": NPROBE_RUN,
        "qps_default": round(default_pt["qps"], 1),
        "nprobe_default": NPROBE,
        **(
            {
                "qps_stream": round(stream_pt["qps"], 1),
                "stream_num_tiles": num_tiles,
            }
            if stream_pt is not None else {}
        ),
        "recall_at_10_vs_exact": round(head_rec[0], 4),
        "recall_min_vs_exact": round(head_rec[1], 4),
        "recall_tie_min_vs_exact": round(head_rec[2], 4),
        "recall_probed_heldout": round(recall_eval, 4),
        "recall_tune_set": round(recall, 4),
        "exact_mode_dispatch_ms": round(exact_dispatch_ms, 2),
        "exact_mode_batch": B_REC,
        "batch_latency_ms": round(batch_ms, 3),
        "single_dispatch_batch_ms": round(dispatch_batch_ms, 3),
        "amortized_query_ms": round(batch_ms / B, 4),
        "trie_hit_rate": round(hit_rate, 3),
        "includes": (
            "encode + trie walk + fused layout stream(slab scan + device "
            "court/date filters + lexical boost + dedup + top-k)"
            if stream_pt is not None else
            "encode + trie walk + fused partitioned(probe + device "
            "court/date filters + lexical boost + dedup + top-k)"
        ),
        "device": str(dev),
    }
    print(json.dumps(result))


def suite() -> None:
    """Run the five BASELINE.json benchmark configs end-to-end and print a
    JSON line per config to stderr (stdout keeps the single headline line
    for the driver). Configs (BASELINE.md §'Benchmark configs'):

      1. simple_demo   — case-name/citation trie exact + prefix lookup
      2. ingestion_demo— content-trie build + batched prefix queries
      3. brute cosine  — exact top-k over 384-d embeddings
      4. partitioned   — ANN at recall@10 >= 0.95 vs exact oracle
      5. hybrid        — trie + semantic + metadata filters
    """
    import datetime as dt
    import tempfile

    import jax
    import jax.numpy as jnp

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
    from trie_semantic_search_tpu.index.ann import PartitionedANN
    from trie_semantic_search_tpu.index.builder import build_indexes
    from trie_semantic_search_tpu.index.trie import TrieIndex
    from trie_semantic_search_tpu.ops.scoring import brute_force_topk, l2_normalize
    from trie_semantic_search_tpu.search.engine import SearchEngine, SearchQuery
    from trie_semantic_search_tpu.storage.store import StorageManager

    rng = np.random.default_rng(0)
    out: list[dict] = []

    def report(name: str, **kw) -> None:
        rec = {"config": name, **kw}
        out.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    # -- 1. simple_demo: trie exact + prefix lookups ------------------------
    trie = TrieIndex()
    names = [f"case number {i} v. state of example {i % 50}" for i in range(5000)]
    for row, n in enumerate(names):
        trie.insert_case_name(n, row)
        trie.insert_citation(f"{row} U.S. {row * 3 + 1} (19{50 + row % 50})", row)
    trie.freeze()
    queries = [names[i] for i in rng.integers(0, len(names), 256)]
    trie.search_batch_rows(queries)  # warm (compile)
    # distinct queries for the timed call (the tunnel caches identical
    # dispatches — see capscale note)
    queries = [names[i] for i in rng.integers(0, len(names), 256)]
    t0 = time.perf_counter()
    rows, valid = trie.search_batch_rows(queries)
    dt1 = time.perf_counter() - t0
    hits = float(valid.any(axis=1).mean())
    report("simple_demo", lookups=len(queries), hit_rate=hits,
           ms_per_lookup=round(dt1 / len(queries) * 1000, 4))

    # -- 2. ingestion_demo: content trie + batched prefix queries -----------
    t0 = time.perf_counter()
    content = TrieIndex()
    vocab = [f"word{i}" for i in range(2000)]
    for row in range(2000):
        toks = [vocab[i] for i in rng.integers(0, 2000, 40)]
        content.insert_content(toks, row, 0)
    content.freeze()
    build_s = time.perf_counter() - t0
    def mk_phrases():
        return [
            " ".join(vocab[i] for i in rng.integers(0, 2000, 3))
            for _ in range(256)
        ]
    content.search_batch_rows(mk_phrases())  # warm (compile)
    t0 = time.perf_counter()
    content.search_batch_rows(mk_phrases())  # distinct timed queries
    q_s = time.perf_counter() - t0
    st = content.get_stats()["content"]
    report("ingestion_demo", build_seconds=round(build_s, 3),
           nodes=st["nodes"], postings=st["postings"],
           ms_per_query=round(q_s / 256 * 1000, 4))

    # -- 3. brute-force cosine top-k ----------------------------------------
    # clustered corpus (like real sentence embeddings; uniform random
    # vectors have no neighborhood structure and are meaningless for ANN)
    centers = np.asarray(l2_normalize(
        jnp.asarray(rng.standard_normal((512, 384)), jnp.float32)))
    # noise scaled so ||noise|| ~ 0.5 (per-dim std 0.5/sqrt(D)); with
    # unscaled per-dim noise the 384-d points are ~5x noise and the data
    # degenerates to uniform-random (meaningless for ANN)
    noise_std = 0.5 / np.sqrt(384)
    pts = centers[rng.integers(0, 512, 100_000)] + noise_std * rng.standard_normal(
        (100_000, 384)).astype(np.float32)
    corpus = np.asarray(l2_normalize(jnp.asarray(pts)))
    qv = corpus[rng.integers(0, len(corpus), 256)]
    f = jax.jit(lambda q, c: brute_force_topk(q, c, 10))
    cj = jnp.asarray(corpus, jnp.bfloat16)
    qj = jnp.asarray(qv)
    jax.block_until_ready(f(qj, cj))
    # distinct query batch per timed iteration (identical dispatches are
    # cached by the tunnel)
    q_iters = [
        jnp.asarray(corpus[rng.integers(0, len(corpus), 256)])
        for _ in range(5)
    ]
    jax.block_until_ready(q_iters)
    # pipeline the 5 dispatches, fetch-sync the last (device executes
    # in-order, so one fetch drains all five; see fetch_sync)
    t0 = time.perf_counter()
    outs = [f(qi_, cj) for qi_ in q_iters]
    fetch_sync(outs[-1])
    dt3 = (time.perf_counter() - t0) / 5
    report("brute_cosine_topk", corpus=100_000, batch=256,
           batch_ms=round(dt3 * 1000, 3), qps=round(256 / dt3, 1))

    # -- 4. partitioned ANN recall -------------------------------------------
    ann = PartitionedANN()
    ann.config.num_partitions = 256
    ann.build(corpus)
    _, oracle_i = ann.search_brute(qv, 10)

    def recall_at(nprobe):
        _, got = ann.search(qv, 10, nprobe=nprobe)
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(got, oracle_i)
        ]))

    # fixed probe ladder (each nprobe is a separate jit compile over the
    # remote tunnel - a full binary-search tune is minutes of compiles)
    nprobe = 32
    recall = recall_at(nprobe)
    if recall < 0.95:
        nprobe = 64
        recall = recall_at(nprobe)
    q_timed = corpus[rng.integers(0, len(corpus), 256)]  # distinct queries
    t0 = time.perf_counter()
    ann.search(q_timed, 10, nprobe=nprobe)  # timed (compiled above)
    dt4 = time.perf_counter() - t0
    report("partitioned_ann", recall_at_10=round(recall, 4), nprobe=nprobe,
           partitions=256, batch_ms=round(dt4 * 1000, 3))

    # -- 5. hybrid search with filters --------------------------------------
    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config()
        cfg.storage.db_path = f"{tmp}/b.db"
        cfg.vector.hnsw.num_partitions = 16
        storage = StorageManager(cfg.storage)
        courts = ["Supreme Court of the United States", "Ninth Circuit"]
        for i in range(200):
            meta = CaseMetadata(
                id=new_case_id(), name=f"Hybrid Case {i} v. Example",
                citation=f"{i} U.S. {i + 1} (1960)", court=courts[i % 2],
                decision_date=dt.date(1950 + i % 40, 1, 1),
            )
            storage.store_case_metadata(meta)
            storage.store_case_text(
                meta.id,
                f"Opinion text about doctrine {i % 20} and procedure "
                f"{i % 7} in the matter of case {i}. " * 3,
            )
        built = build_indexes(storage, cfg)
        engine = SearchEngine(cfg, storage, built.trie, built.vector, built.columns)
        def mk_queries(salt: int):
            return [
                SearchQuery(
                    query=f"doctrine {(i + salt) % 20} and procedure",
                    court_filter=[courts[i % 2]],
                    date_range=(dt.date(1950, 1, 1), dt.date(1995, 1, 1)),
                )
                for i in range(64)
            ]
        engine.search_batch(mk_queries(0))  # warm at the timed batch size
        engine.query_cache.clear()
        qs = mk_queries(7)  # distinct timed queries (tunnel dispatch cache)
        t0 = time.perf_counter()
        res = engine.search_batch(qs)
        dt5 = time.perf_counter() - t0
        filled = float(np.mean([len(r) > 0 for r in res]))
        report("hybrid_filtered", batch=64, batch_ms=round(dt5 * 1000, 2),
               qps=round(64 / dt5, 1), result_rate=filled)

    print(json.dumps({"metric": "baseline_suite", "value": len(out),
                      "unit": "configs", "vs_baseline": 1.0,
                      "results": out}))


def capscale() -> None:
    """CAP-scale bench (round-1 VERDICT items 2 + 8): 8.4M chunks on one
    chip (3.2 GB int8 — the full corpus budget of a v5e), with the device
    filters + lexical merge + dedup active, plus the 1M-row recall/memory
    harness on the real PartitionedANN.

    Three configs, one JSON line each to stderr, summary line to stdout:

      A. 8.4M × 384 chunked-brute fused hybrid, B=256 (the large-batch
         serving path: corpus read once per batch; no [B, N] score matrix).
      B. 8.4M × 384 partitioned fused, B=16, nprobe=32 (the low-latency
         path: per-query HBM traffic is nprobe·m·D, independent of N) —
         recall measured against A's exact int8 scan.
      C. 1M × 384 PartitionedANN (the real index class): recall@10 vs the
         f32/bf16 exact oracle at tuned nprobe, and bytes vs the HNSW
         equal-memory budget (M=16 links: 4·D + 8·M + 64 per vector).

    Break-even note (measured architecture constraint): partition probing
    reads B·nprobe·m rows per batch vs the brute scan's N once, so brute
    wins when B ≥ N/(nprobe·m); the engine's auto mode encodes this.
    """
    import jax
    import jax.numpy as jnp

    from trie_semantic_search_tpu.ops.hybrid import (
        fused_hybrid_topk_chunked,
        fused_partitioned_topk,
    )

    out: list[dict] = []

    def report(name: str, **kw) -> None:
        rec = {"config": name, **kw}
        out.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    import os

    # full scale by default; env knobs allow a small smoke run (CPU/CI)
    P = int(os.environ.get("TSS_CAPSCALE_P", 2048))
    m = int(os.environ.get("TSS_CAPSCALE_M", 4096))
    D = 384
    N = P * m  # 8,388,608 at defaults
    K = 10
    dev = jax.devices()[0]
    print(f"capscale device: {dev}; N={N}", file=sys.stderr)

    # ---- corpus: clustered, generated on device in partition-major layout
    # (no host->device bulk transfer; nearest centroid == own partition by
    # construction, like a converged k-means)
    SLAB = min(64, P)  # partitions per generation step

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
    part_int8 = blocks.reshape(P, m, D)
    part_scale = scales.reshape(P, m)
    part_rows = jnp.arange(N, dtype=jnp.int32).reshape(P, m)
    corpus_q = part_int8.reshape(N, D)
    corpus_scale = part_scale.reshape(N, 1)
    int8_gb = round(corpus_q.nbytes / 2**30, 2)

    # chunk columns: each chunk its own case (pure ANN recall is measured
    # at chunk granularity; dedup machinery still runs)
    chunk_case = jnp.arange(N, dtype=jnp.int32)
    chunk_court = (chunk_case % 16).astype(jnp.int32)
    chunk_date = (chunk_case % 20000).astype(jnp.int32)

    # ---- queries: perturbed members of random partitions
    B_BRUTE = 256
    B_PART = int(os.environ.get("TSS_CAPSCALE_BPART", 16))
    kq = jax.random.PRNGKey(7)
    kp, kn2 = jax.random.split(kq)
    qpart = jax.random.randint(kp, (B_BRUTE,), 0, P)
    qv = centroids[qpart] + 0.3 * jax.random.normal(
        kn2, (B_BRUTE, D), jnp.float32
    ) / np.sqrt(D)
    qv = qv / jnp.linalg.norm(qv, axis=-1, keepdims=True)

    R_TRIE = 8
    def common(B):
        # open filters for the recall configs; the filtered timing config
        # narrows them below
        return dict(
            court_table=jnp.ones((B, 16), bool),
            date_lo=jnp.zeros(B, jnp.int32),
            date_hi=jnp.full(B, 2**31 - 1, jnp.int32),
            trie_rows=jnp.full((B, R_TRIE), -1, jnp.int32),
            trie_src=jnp.full((B, R_TRIE), 3, jnp.int32),
            trie_chunk_of_case=chunk_case,  # case i ↔ chunk i
            min_similarity=jnp.full(B, 0.2, jnp.float32),
            exact_weight=jnp.full(B, 2.0, jnp.float32),
        )

    # ---- config A: chunked-brute fused hybrid at B=256 (exact) ----
    # Timing discipline (measured on this tunnel): repeated identical
    # dispatches are CACHED by the serving layer (~0.1 ms returns) and a
    # single dispatch costs ~33 ms in tunnel round-trip. So: R in-program
    # batches per dispatch (amortizes the tunnel) and DISTINCT queries for
    # every dispatch (defeats the cache).
    import functools as _ft

    TRIALS = 4
    R_LO, R_HI = 2, 8
    NCHUNKS = 16
    args_a = common(B_BRUTE)

    @_ft.partial(
        jax.jit, static_argnames=("recall_target", "use_filters")
    )
    def loop_a(qs_r, cq, cscale, ccase, ccourt, cdate, ct, dlo, dhi,
               tr, ts, tcc, msim, ew, recall_target=1.0, use_filters=True):
        def body(carry, qb):
            v, i, cases, src = fused_hybrid_topk_chunked(
                qb, cq, cscale, ccase, ccourt, cdate, ct, dlo, dhi,
                tr, ts, tcc, msim, ew, k=K, overfetch=1,
                num_chunks=NCHUNKS, recall_target=recall_target,
                use_court=use_filters, use_date=use_filters,
            )
            return carry + v.sum(), (v, i)
        acc, (vs, idxs) = jax.lax.scan(body, 0.0, qs_r)
        return acc, vs, idxs

    def a_args():
        a = args_a
        return (a["court_table"], a["date_lo"], a["date_hi"],
                a["trie_rows"], a["trie_src"], a["trie_chunk_of_case"],
                a["min_similarity"], a["exact_weight"])

    kq2 = jax.random.split(jax.random.PRNGKey(11), 64).reshape(2, 32, 2)

    def make_q(key, r, b):
        kp2, kn3 = jax.random.split(key)
        part = jax.random.randint(kp2, (r, b), 0, P)
        out = centroids[part] + 0.3 * jax.random.normal(
            kn3, (r, b, D), jnp.float32
        ) / np.sqrt(D)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    qa_pools = {
        rv: [make_q(kq2[ri, t], rv, B_BRUTE) for t in range(TRIALS + 1)]
        for ri, rv in enumerate((R_LO, R_HI))
    }
    jax.block_until_ready(qa_pools)

    def time_a(recall_target, use_filters=True):
        def run(rv, t):
            return loop_a(
                qa_pools[rv][t], corpus_q, corpus_scale, chunk_case,
                chunk_court, chunk_date, *a_args(),
                recall_target=recall_target, use_filters=use_filters,
            )

        t_compile = time.perf_counter()
        fetch_sync(run(R_LO, 0))
        compile_s = time.perf_counter() - t_compile
        step_s = timed_slope(run, R_LO, R_HI, trials=TRIALS)
        acc, vs, idxs = run(R_HI, 0)
        return step_s * 1000, compile_s, vs, idxs

    batch_ms, compile_a, vs_a, idxs_a = time_a(1.0)
    va, ia = vs_a[0], idxs_a[0]  # first batch results (oracle queries)
    print(f"A compiled+ran in {compile_a:.1f}s", file=sys.stderr)
    # HBM floor: one full int8-corpus read per batch
    floor_ms = corpus_q.nbytes / 819e9 * 1000
    report(
        "capscale_brute_8M", corpus_chunks=N, dim=D, batch=B_BRUTE,
        int8_gb=int8_gb, batch_ms=round(batch_ms, 2),
        qps=round(B_BRUTE / (batch_ms / 1000), 1),
        hbm_floor_ms=round(floor_ms, 2),
        x_over_floor=round(batch_ms / floor_ms, 2),
        recall_at_10=1.0, note="exact int8 scan (oracle for config B)",
    )

    # ---- config A2: same program, Pallas fused scan per slab ----
    pal_ms, compile_p, vs_p, idxs_p = time_a(0.97)
    exact_sets = np.asarray(idxs_a).reshape(-1, K)
    pal_sets = np.asarray(idxs_p).reshape(-1, K)
    rec_p = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(pal_sets, exact_sets)
    ]))
    report(
        "capscale_brute_8M_pallas", corpus_chunks=N, batch=B_BRUTE,
        batch_ms=round(pal_ms, 2),
        qps=round(B_BRUTE / (pal_ms / 1000), 1),
        x_over_floor=round(pal_ms / floor_ms, 2),
        recall_at_10_vs_exact=round(rec_p, 4),
        compile_s=round(compile_p, 1),
        note="per-slab Pallas fused scan (recall_target=0.97)",
    )

    # ---- config A3: same Pallas scan, no filters requested ----
    # the serving engine statically drops the court/date mask work when a
    # batch carries no filters (the common case); this config's filters
    # are trivially open, so config A's exact results remain the oracle
    nf_ms, compile_nf, vs_nf, idxs_nf = time_a(0.97, use_filters=False)
    nf_sets = np.asarray(idxs_nf).reshape(-1, K)
    rec_nf = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(nf_sets, exact_sets)
    ]))
    report(
        "capscale_brute_8M_pallas_nofilter", corpus_chunks=N, batch=B_BRUTE,
        batch_ms=round(nf_ms, 2),
        qps=round(B_BRUTE / (nf_ms / 1000), 1),
        x_over_floor=round(nf_ms / floor_ms, 2),
        recall_at_10_vs_exact=round(rec_nf, 4),
        compile_s=round(compile_nf, 1),
        note="Pallas fused scan, court/date mask work compiled away "
             "(the no-filters-requested serving case)",
    )

    # ---- config B: partitioned fused at B=16 (low-latency path) ----
    # no bf16 rescore copy: the corpus was generated AS int8, so int8
    # scores are already exact for it (corpus_bf16=None skips the gather).
    # Same discipline: R_B in-program batches/dispatch, distinct queries.
    args_b = common(B_PART)
    kq3 = jax.random.split(jax.random.PRNGKey(13), 64).reshape(2, 32, 2)
    qb_pools = {
        rv: [make_q(kq3[ri, t], rv, B_PART) for t in range(TRIALS + 1)]
        for ri, rv in enumerate((R_LO, R_HI))
    }
    jax.block_until_ready(qb_pools)

    # exact oracle for B's recall queries (one flat exact-scan dispatch)
    flat_q = qb_pools[R_HI][0].reshape(R_HI * B_PART, D)
    args_o = common(R_HI * B_PART)
    vo, io, co, so = fused_hybrid_topk_chunked(
        flat_q, corpus_q, corpus_scale, chunk_case, chunk_court, chunk_date,
        k=K, overfetch=1, num_chunks=NCHUNKS, **args_o,
    )
    oracle_b = np.asarray(io).reshape(R_HI, B_PART, K)

    from trie_semantic_search_tpu.ops.pallas_scan import (
        partition_filter_columns,
    )

    pcw, pcb, pdt = partition_filter_columns(
        np.asarray(part_rows), np.asarray(chunk_court),
        np.asarray(chunk_date),
    )

    @_ft.partial(jax.jit, static_argnames=("nprobe", "recall_target"))
    def loop_b(qs_r, cents, prows, pint8, pscale, ccase, ccourt, cdate,
               ct, dlo, dhi, tr, ts, tcc, msim, ew, pw, pb, pd, nprobe,
               recall_target=1.0):
        def body(carry, qb):
            v, i, cases, src = fused_partitioned_topk(
                qb, cents, prows, pint8, pscale, None,
                ccase, ccourt, cdate, ct, dlo, dhi, tr, ts, tcc, msim, ew,
                k=K, nprobe=nprobe, overfetch=1, rescore_factor=4,
                recall_target=recall_target,
                part_cword=pw, part_cbit=pb, part_date=pd,
            )
            return carry + v.sum(), (v, i)
        acc, (vs, idxs) = jax.lax.scan(body, 0.0, qs_r)
        return acc, vs, idxs

    def b_args():
        a = args_b
        return (a["court_table"], a["date_lo"], a["date_hi"],
                a["trie_rows"], a["trie_src"], a["trie_chunk_of_case"],
                a["min_similarity"], a["exact_weight"])

    for variant, rt in (("", 1.0), ("_probekernel", 0.97)):
        for nprobe in (32, 64):
            def run_b(rv, t, _np_=nprobe, _rt_=rt):
                return loop_b(
                    qb_pools[rv][t], centroids, part_rows, part_int8,
                    part_scale, chunk_case, chunk_court, chunk_date,
                    *b_args(), pcw, pcb, pdt,
                    nprobe=_np_, recall_target=_rt_,
                )

            t0 = time.perf_counter()
            fetch_sync(run_b(R_LO, 0))
            compile_s = time.perf_counter() - t0
            bms = timed_slope(run_b, R_LO, R_HI, trials=TRIALS) * 1000
            acc, vb, ib = run_b(R_HI, 0)
            got = np.asarray(ib)[:, :, :K].reshape(-1, K)
            recall = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(got, oracle_b.reshape(-1, K))
            ]))
            report(
                "capscale_partitioned_8M" + variant, corpus_chunks=N,
                batch=B_PART,
                nprobe=nprobe, probed_frac=round(nprobe * m / N, 4),
                batch_ms=round(bms, 2),
                qps=round(B_PART / (bms / 1000), 1),
                recall_at_10_vs_exact=round(recall, 4),
                compile_s=round(compile_s, 1),
            )
            if recall >= 0.95:
                break

    # free the 8M corpus before the 1M harness
    del corpus_q, corpus_scale, part_int8, part_scale, blocks, scales
    del va, ia, vs_a, idxs_a, vs_p, idxs_p, qa_pools, qb_pools
    del vo, io, co, so, vb, ib, acc

    # ---- config C: 1M-row recall/memory harness on the real class ----
    from trie_semantic_search_tpu.core.config import AnnConfig
    from trie_semantic_search_tpu.index.ann import PartitionedANN

    rng = np.random.default_rng(1)
    N1 = int(os.environ.get("TSS_CAPSCALE_N1", 1_000_000))
    D1, P1 = 384, max(8, int(np.sqrt(N1)) // 32 * 32)
    n_centers = max(64, N1 // 256)
    centers = rng.standard_normal((n_centers, D1)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    asn = rng.integers(0, n_centers, N1)
    v1 = centers[asn] + 0.35 * rng.standard_normal((N1, D1)).astype(
        np.float32
    ) / np.sqrt(D1)
    v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
    t0 = time.perf_counter()
    ann = PartitionedANN(AnnConfig(num_partitions=P1, kmeans_iters=6,
                                   kmeans_sample=131_072))
    ann.build(v1)
    build_s = time.perf_counter() - t0
    q1 = v1[rng.integers(0, N1, 128)]
    # timing queries DISTINCT from the recall queries: the tunnel caches
    # repeated identical dispatches (see config A note)
    q_time = [v1[rng.integers(0, N1, 128)] for _ in range(4)]
    _, oracle1 = ann.search_brute(q1, K)  # bf16 exact scan
    nprobe1, recall1, bms1 = None, 0.0, None
    for nprobe in (16, 32, 64, 128):
        _, got1 = ann.search(q1, K, nprobe=nprobe)  # compile + recall
        t_times = []
        for qt in q_time:
            t0 = time.perf_counter()
            ann.search(qt, K, nprobe=nprobe)
            t_times.append(time.perf_counter() - t0)
        bms1 = statistics.median(t_times) * 1000
        recall1 = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(got1, oracle1)
        ]))
        nprobe1 = nprobe
        if recall1 >= 0.95:
            break
    st = ann.get_stats()
    # HNSW equal-memory budget: f32 vectors + M=16 graph links + overhead
    hnsw_bytes = N1 * (4 * D1 + 8 * 16 + 64)
    report(
        "recall_1m_384", rows=N1, dim=D1, partitions=P1,
        build_seconds=round(build_s, 1), nprobe=nprobe1,
        recall_at_10=round(recall1, 4), batch_ms=round(bms1, 2),
        bytes_total=st.nbytes_total, hnsw_equal_memory_bytes=hnsw_bytes,
        memory_vs_hnsw=round(st.nbytes_total / hnsw_bytes, 3),
    )

    print(json.dumps({
        "metric": "capscale_suite", "value": len(out), "unit": "configs",
        "vs_baseline": 1.0, "results": out,
    }))


if __name__ == "__main__":
    from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

    if guard_dead_tpu_relay():
        # stdout keeps the one-JSON-line driver contract; note on stderr
        print(
            "bench: axon TPU relay down (port 8093 refused); "
            "falling back to the CPU backend",
            file=sys.stderr,
        )
    from trie_semantic_search_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    if "--suite" in sys.argv:
        import jax  # noqa: F401

        suite()
    elif "--capscale" in sys.argv:
        capscale()
    else:
        main()
