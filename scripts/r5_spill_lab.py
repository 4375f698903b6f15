"""Round-5 floor-fix lab: duplicate-heavy corpus, per-probe min recall.

Reproduces the tunefloor_r05 failure geometry (mega duplicate groups +
clustered topics; probe 21's oracle top-10 was a 25-way duplicate tie in
partitions the centroid ranking never reached) at CPU-lab scale, then
measures the two round-5 fixes:

  A. baseline       — kmeans_dedup=False, pad_replicas=False (round-4 build)
  B. dedup-kmeans   — kmeans_dedup=True only
  C. dedup+replicas — both (the new defaults)

Metric: case-level strict + tie-aware recall@10 vs the exact oracle
(index.tuning.case_level_oracle — the same computation tunefloor uses),
min/mean/p5 over 64 probes at nprobe in {4, 8, 16, 32, 64}.

Run:  JAX_PLATFORMS=cpu python scripts/r5_spill_lab.py
Writes bench_results/spill_lab_r05.json.
"""

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay  # noqa: E402

guard_dead_tpu_relay()  # no-op here (CPU forced above) — kept for the
# entry-point regression net in tests/test_relay_guard.py

from trie_semantic_search_tpu.core.config import AnnConfig  # noqa: E402
from trie_semantic_search_tpu.index.ann import PartitionedANN  # noqa: E402
from trie_semantic_search_tpu.index.tuning import (  # noqa: E402
    case_level_oracle,
    tie_aware_recall,
)

D = 96
P = 512
CHUNKS_PER_CASE = 10
K = 10
NPROBES = (4, 8, 16, 32, 64)


def normed(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def make_corpus(seed=0):
    """~200k chunks: 48 topic clusters + duplicate groups shaped like the
    CAP boilerplate distribution (2 mega groups, 8 medium, 20 small).
    Duplicate copies land in DISTINCT cases (shuffled case assignment) so
    the case-level oracle sees wide exact-score boundaries."""
    rng = np.random.default_rng(seed)
    topics = normed(rng.standard_normal((48, D)).astype(np.float32))
    n_base = 160_000
    t = rng.integers(0, 48, n_base)
    base = normed(
        topics[t] + 0.35 * rng.standard_normal((n_base, D)).astype(np.float32)
    )
    groups = [30_000, 12_000] + [1_500] * 8 + [25] * 20
    dup_vecs = normed(
        topics[rng.integers(0, 48, len(groups))]
        + 0.35 * rng.standard_normal((len(groups), D)).astype(np.float32)
    )
    dups = np.concatenate(
        [np.repeat(dup_vecs[i : i + 1], g, axis=0) for i, g in enumerate(groups)]
    )
    corpus = np.concatenate([base, dups])
    # shuffle rows so duplicates scatter across cases (build order is the
    # case order; real boilerplate appears once per case)
    perm = rng.permutation(len(corpus))
    corpus = corpus[perm]
    chunk_case = np.arange(len(corpus)) // CHUNKS_PER_CASE
    # queries: 32 duplicate-adjacent probes (the failure class) + 32 topic
    # probes, all paraphrase-shaped (vector + noise)
    qd = normed(
        dup_vecs[rng.integers(0, len(groups), 32)]
        + 0.15 * rng.standard_normal((32, D)).astype(np.float32)
    )
    qt = normed(
        topics[rng.integers(0, 48, 32)]
        + 0.25 * rng.standard_normal((32, D)).astype(np.float32)
    )
    return corpus.astype(np.float32), chunk_case, np.concatenate([qd, qt])


def served_cases(ann, chunk_case, queries, k, nprobe):
    k_rows = min(k * 16, ann.num_vectors)
    _, idx = ann.search(queries, k_rows, nprobe=nprobe)
    out = []
    for r in np.asarray(idx):
        seen = []
        for row in r:
            if row < 0:
                continue
            c = int(chunk_case[row])
            if c not in seen:
                seen.append(c)
                if len(seen) >= k:
                    break
        out.append(seen)
    return out


def main():
    corpus, chunk_case, queries = make_corpus()
    oracle_lists, ties, aboves = case_level_oracle(
        corpus, chunk_case, queries, K,
        return_tie_sets=True, return_above_sets=True,
    )
    oracle = [set(o) for o in oracle_lists]

    variants = {
        "baseline": dict(kmeans_dedup=False, pad_replicas=False),
        "dedup_kmeans": dict(kmeans_dedup=True, pad_replicas=False),
        "dedup_plus_replicas": dict(kmeans_dedup=True, pad_replicas=True),
        "replicas_only": dict(kmeans_dedup=False, pad_replicas=True,
                              replica_choices=4),
        "replicas_c8": dict(kmeans_dedup=False, pad_replicas=True,
                            replica_choices=8),
    }
    out = {"chunks": len(corpus), "partitions": P, "queries": len(queries),
           "k": K, "variants": {}}
    for name, kw in variants.items():
        t0 = time.time()
        ann = PartitionedANN(AnnConfig(num_partitions=P, **kw))
        ann.build_streaming(corpus, seed=0)
        rows = np.asarray(ann.part_rows)
        rec = {"build_s": round(time.time() - t0, 1),
               "replicas": int((rows >= 0).sum()) - len(corpus),
               "slots": int(rows.size), "sweep": {}}
        for nprobe in NPROBES:
            served = served_cases(ann, chunk_case, queries, K, nprobe)
            strict = np.asarray([
                len(set(s) & o) / max(len(o), 1)
                for s, o in zip(served, oracle)
            ])
            tie = np.asarray([
                tie_aware_recall(set(s), o, t, a)
                for s, o, t, a in zip(served, oracle, ties, aboves)
            ])
            rec["sweep"][str(nprobe)] = {
                "mean": round(float(strict.mean()), 4),
                "min": round(float(strict.min()), 4),
                "p5": round(float(np.percentile(strict, 5)), 4),
                "tie_min": round(float(tie.min()), 4),
                "tie_mean": round(float(tie.mean()), 4),
            }
            print(f"[{name}] nprobe={nprobe}: {rec['sweep'][str(nprobe)]}",
                  flush=True)
        out["variants"][name] = rec
    Path("bench_results/spill_lab_r05.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({n: v["sweep"]["16"] for n, v in out["variants"].items()}))


if __name__ == "__main__":
    main()
