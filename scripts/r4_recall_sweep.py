"""Serving-path recall sweep over a built artifact (round-3 VERDICT
item 7 done-evidence): mean AND min case-level recall@10 vs the exact
oracle at each nprobe, marking the artifact's tuned operating point.

  python scripts/r4_recall_sweep.py --work /root/r4_embed \
      [--nprobes 8,16,32,64,128]

One JSON line: per-nprobe {mean, min, p5} recall and the tuned nprobe's
row — the round-3 flagship tuned to mean 0.984 / min 0.90; the
min-recall-floor tuner must land where min >= 0.95.

Round-5 (VERDICT item 6): every probe under the ``--floor`` carries a
persisted per-probe audit — strict recall, tie-aware recall (the
round-4-ADVICE-corrected credit that forgives ONLY substitutions within
the exact f32 boundary tie), the number of strictly-above-boundary oracle
cases the served set is missing (real recall loss), and a verdict:
``pure_tie`` (miss fully explained by boundary-tie substitution) vs
``real_loss``. The top-level ``unexplained_misses`` counts probes whose
tie-aware recall is still under the floor at the tuned operating point.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--nprobes", default="")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--floor", type=float, default=0.95,
                    help="min-recall floor to audit misses against")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

    import numpy as np

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.index.builder import load_artifacts
    from trie_semantic_search_tpu.index.tuning import (
        _served_cases,
        build_probe_embeddings,
        case_level_oracle,
        tie_aware_recall,
    )
    from trie_semantic_search_tpu.storage.store import StorageManager
    from trie_semantic_search_tpu.text.processor import TextProcessor

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
    _trie, vector, _columns = artifacts
    load_s = time.perf_counter() - t0
    print(f"loaded in {load_s:.1f}s", file=sys.stderr)

    probes = build_probe_embeddings(
        storage, TextProcessor(cfg.text_processing),
        lambda texts: vector.generate_embeddings(texts),
    )
    assert probes is not None
    chunk_case = np.asarray(vector.refs)[:, 0]
    oracle_lists, tie_sets, above_sets = case_level_oracle(
        vector.vectors, chunk_case, probes, args.k,
        return_tie_sets=True, return_above_sets=True,
    )
    oracle = [set(o) for o in oracle_lists]

    tuned = int(vector.ann.tuned_nprobe or 0)
    P = int(vector.ann.centroids.shape[0])
    if args.nprobes:
        grid = sorted({int(x) for x in args.nprobes.split(",")})
    else:
        grid = sorted({8, 16, 32, 64, 128, tuned or 64})
    grid = [n for n in grid if 0 < n <= P]

    rows = []
    k = args.k
    for nprobe in grid:
        t0 = time.perf_counter()
        served = _served_cases(vector.ann, chunk_case, probes, k, nprobe)
        per = np.asarray([
            len(set(s) & o) / max(len(o), 1)
            for s, o in zip(served, oracle)
        ])
        # tie-aware (ADVICE-corrected credit): every strictly-above-
        # boundary oracle case is REQUIRED; only substitutions within the
        # exact f32 boundary tie are forgiven. Strict cells stay the
        # primary record.
        per_tie = np.asarray([
            tie_aware_recall(set(s), o, t, a)
            for s, t, a, o in zip(served, tie_sets, above_sets, oracle)
        ])
        # persisted per-probe audit of every floor miss (VERDICT item 6)
        floor_misses = []
        for i in np.flatnonzero(per < args.floor):
            s = set(served[i])
            missing_above = len(above_sets[i] - s)
            ta = float(per_tie[i])
            floor_misses.append({
                "probe": int(i),
                "strict": round(float(per[i]), 4),
                "tie_aware": round(ta, 4),
                "missing_above": missing_above,
                "boundary_size": len(tie_sets[i] - above_sets[i]),
                "verdict": (
                    "pure_tie" if ta >= args.floor else "real_loss"
                ),
            })
        rows.append({
            "nprobe": nprobe,
            "mean": round(float(per.mean()), 4),
            "min": round(float(per.min()), 4),
            "min_tie_aware": round(float(per_tie.min()), 4),
            "p5": round(float(np.percentile(per, 5)), 4),
            "floor": args.floor,
            "floor_misses": floor_misses,
            "unexplained_misses": sum(
                1 for fm in floor_misses if fm["verdict"] == "real_loss"
            ),
            "seconds": round(time.perf_counter() - t0, 1),
            "tuned": nprobe == tuned,
        })
        print(f"nprobe={nprobe}: mean {rows[-1]['mean']} "
              f"min {rows[-1]['min']} "
              f"(tie-aware {rows[-1]['min_tie_aware']})", file=sys.stderr)

    print(json.dumps({
        "work": str(work),
        "chunks": int(len(chunk_case)),
        "partitions": P,
        "probes": int(len(probes)),
        "tuned_nprobe": tuned,
        "artifact_load_seconds": round(load_s, 1),
        "sweep": rows,
    }))


if __name__ == "__main__":
    main()
