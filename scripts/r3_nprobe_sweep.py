"""Sweep serving nprobe against the serve-bench recall criterion.

Loads the CAP-scale artifacts ONCE, then for each nprobe measures
case-level set-overlap recall@10 (the serving determinism invariant makes
this the honest metric: ties break to the lower row id, so the exact
oracle's winners are reproducible) AND tie-aware score recall (a result
within eps of the oracle's 10th score), for off-corpus serving-shaped
queries. Prints one JSON line per nprobe; pick the smallest nprobe
meeting the target and persist it with r3_retune_nprobe.py --set.

  python scripts/r3_nprobe_sweep.py --work /tmp/capbuild3 --cpu
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)

from r3_serve_bench import make_queries  # noqa: E402  (same query shapes)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/capbuild3")
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--nprobes", default="1,2,4,8,16,32,64,128,256,488")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.index.builder import load_artifacts
    from trie_semantic_search_tpu.search.engine import SearchEngine
    from trie_semantic_search_tpu.storage.store import StorageManager

    work = Path(args.work)
    cfg = Config()
    cfg.storage.db_path = str(work / "db.sqlite")
    cfg.storage.backup.enabled = False
    cfg.trie.index_path = str(work / "trie")
    cfg.trie.content_windowing = "phrase_start"
    cfg.vector.hnsw.index_path = str(work / "vec")

    t0 = time.perf_counter()
    storage = StorageManager(cfg.storage)
    artifacts = load_artifacts(cfg)
    assert artifacts is not None
    trie, vector, columns = artifacts
    engine = SearchEngine(cfg, storage, trie, vector, columns)
    fused = engine._get_fused()
    print(f"loaded in {time.perf_counter() - t0:.0f}s "
          f"(mode={fused.ann_mode}, nprobe={fused.ann.default_nprobe})",
          file=sys.stderr)

    Q = args.queries
    rng = np.random.default_rng(7)
    qtexts = make_queries(rng, Q, "recall")  # same as servebench recall
    embs = np.asarray(engine.vector_index.generate_embeddings(qtexts),
                      np.float32)
    qn = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True),
                           1e-12)

    # exact oracle over the full corpus (the shared serving-invariant
    # implementation in index/tuning.py: per-case best score, lower case
    # row on ties)
    from trie_semantic_search_tpu.index.tuning import case_level_oracle

    t0 = time.perf_counter()
    chunk_case = np.asarray(vector.refs, np.int32)[:, 0]
    rows_list, oracle_k_score = case_level_oracle(
        vector.vectors, chunk_case, qn, k=10, return_scores=True
    )
    oracle_rows = [set(r) for r in rows_list]
    print(f"oracle in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    for n in (int(x) for x in args.nprobes.split(",")):
        # single-chip partitioned serving reads ann.default_nprobe, which
        # resolves config.num_probes first (fused.py query_batch)
        fused.ann.config.num_probes = n
        t0 = time.perf_counter()
        vals, chunks, cases, srcs = fused.query_batch(
            qn, qtexts,
            court_filters=[None] * Q,
            date_ranges=[None] * Q,
            min_similarity=[-1.0] * Q,
            exact_weight=[0.0] * Q,
            k=16,
            overfetch=cfg.search.fused_overfetch,
            recall_target=cfg.search.fused_recall_target,
        )
        dt = time.perf_counter() - t0
        overlap, tie_ok = [], []
        for b in range(Q):
            served = [int(c) for c in cases[b] if c >= 0][:10]
            sv = [float(v) for v, c in zip(vals[b], cases[b]) if c >= 0][:10]
            overlap.append(len(set(served) & oracle_rows[b]) / 10.0)
            # tie-aware: every served result scores >= oracle 10th - eps
            tie_ok.append(float(np.mean(
                np.asarray(sv) >= oracle_k_score[b] - 1e-3
            )) if sv else 0.0)
        print(json.dumps({
            "nprobe": n,
            "recall_overlap_mean": round(float(np.mean(overlap)), 4),
            "recall_overlap_min": round(float(np.min(overlap)), 4),
            "tie_score_recall_mean": round(float(np.mean(tie_ok)), 4),
            "first_call_s": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
