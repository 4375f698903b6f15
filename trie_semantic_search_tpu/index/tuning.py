"""Serving-grade nprobe tuning: case-level recall with query-shaped probes.

Why this exists (round-3 postmortem): ``PartitionedANN.tune_nprobe``
measures tie-aware *score* recall of corpus rows used as their own
queries. On a real corpus that criterion is degenerate — duplicate-text
groups embed identically, every returned duplicate ties the oracle's
k-th score, and the tuner happily returns ``nprobe=1`` while true
serving recall (case-level set overlap vs the exact oracle, the metric
the serving invariant "ties break to the lower row id" makes
reproducible) collapses: measured on the 5M-chunk CAP build, nprobe=1
gave 0.53 mean / 0.00 min case overlap vs 0.98 at nprobe=488.

This tuner measures what serving reports:

* **queries**: held-out *query-shaped* probes (half-sentence /
  paraphrase texts re-embedded by the same encoder — see
  ``models.quality.build_probes``), not corpus rows;
* **metric**: top-``k`` *case* set overlap against the exact
  full-corpus oracle (per-case best chunk score, lower case row on
  ties) — the exact computation ``scripts/r3_serve_bench.py`` records;
* **search path**: ``ann.search`` row results deduplicated to cases,
  the same candidate shape the fused serving program dedups on device.

Cost: one exact oracle pass (slab matmul over the corpus memmap,
O(Q·N·D)) plus O(log P) probe sweeps — a build-time cost, run once at
finalize.

Reference parity: the reference's HNSW intent exposes ``ef_search`` as
the recall/latency knob (src/config.rs vector section); this is the
TPU-native equivalent of picking ef_search empirically.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

_log = logging.getLogger("tss_tpu.index.tuning")


def tie_aware_recall(
    served: set,
    oracle_topk: set,
    tie_set: frozenset,
    above_set: frozenset,
) -> float:
    """Recall@k that forgives *only* substitutions within the exact
    boundary tie (round-4 ADVICE fix — the earlier ``|served ∩ tie_set|``
    metric over-credited: tie_set contains the strictly-above-boundary
    cases too, so dropping a genuinely better case while picking up an
    extra boundary-tie member still scored 1.0).

    credit = |served ∩ above| + min(k - |above|, |served ∩ boundary|)

    where ``above`` = oracle cases with exact score strictly greater than
    the k-th score (every one of them is REQUIRED — missing any is real
    recall loss) and ``boundary`` = cases whose exact score bitwise-equals
    the k-th score (any ``k - |above|`` of them are equally correct)."""
    k_slots = max(len(oracle_topk), 1)
    boundary = tie_set - above_set
    credit = len(served & above_set) + min(
        k_slots - len(above_set), len(served & boundary)
    )
    return credit / k_slots


def case_level_oracle(
    vectors: np.ndarray,  # [N, D] f32 (memmap ok)
    chunk_case: np.ndarray,  # [N] int case row per chunk
    query_embs: np.ndarray,  # [Q, D] (need not be normalized)
    k: int = 10,
    slab: int = 262_144,
    return_scores: bool = False,
    return_tie_sets: bool = False,
    return_above_sets: bool = False,
) -> "list[list[int]] | tuple":
    """Exact top-``k`` case rows per query: per-case best chunk score over
    the FULL corpus, ties to the lower case row (the serving invariant).
    Streams the corpus in slabs so the memmap never materializes.
    ``return_scores=True`` additionally returns each query's k-th (last
    winner) score — the tie-aware acceptance threshold.
    ``return_tie_sets=True`` additionally returns, per query, the set of
    case rows whose exact score ``>=`` the k-th score — the top-k *with
    boundary ties*. Membership is decided by comparing entries of the
    SAME f32 score array (bitwise-equal floats, never a tolerance — the
    round-3 postmortem's hard rule for anything tie-aware), so a case
    joins the set only when it is *exactly* as good as the k-th winner.
    ``return_above_sets=True`` additionally returns, per query, the set
    of case rows whose exact score is *strictly greater* than the k-th
    score — the non-negotiable members of any correct top-k. A served
    set missing one of these has lost real recall no matter how many
    boundary-tie members it substituted (round-4 ADVICE: the >= tie set
    alone over-credits such swaps)."""
    q = np.asarray(query_embs, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    Q = len(q)
    C = int(chunk_case.max()) + 1 if len(chunk_case) else 0
    best = np.full((Q, C), -np.inf, np.float32)
    cc_all = np.asarray(chunk_case, np.int64)
    mono = bool(np.all(np.diff(cc_all) >= 0))
    for lo in range(0, len(vectors), slab):
        v = np.array(vectors[lo : lo + slab], np.float32)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        s = q @ v.T  # [Q, slab]
        cc = cc_all[lo : lo + slab]
        if mono and len(cc):
            # chunk→case is nondecreasing in build order: segment-max via
            # reduceat (np.maximum.at is ~100x slower)
            starts = np.concatenate([[0], np.flatnonzero(np.diff(cc)) + 1])
            m = np.maximum.reduceat(s, starts, axis=1)
            best[:, cc[starts]] = np.maximum(best[:, cc[starts]], m)
        else:
            for b in range(Q):
                np.maximum.at(best[b], cc, s[b])
    out = []
    kth: list[float] = []
    tie_sets: list[frozenset] = []
    above_sets: list[frozenset] = []
    rows = np.arange(C)
    for b in range(Q):
        order = np.lexsort((rows, -best[b]))[:k]
        out.append([int(r) for r in order])
        kb = float(best[b][order[-1]]) if len(order) else -np.inf
        kth.append(kb)
        if return_tie_sets:
            tie_sets.append(frozenset(
                int(r) for r in np.flatnonzero(best[b] >= kb)
            ) if len(order) else frozenset())
        if return_above_sets:
            above_sets.append(frozenset(
                int(r) for r in np.flatnonzero(best[b] > kb)
            ) if len(order) else frozenset())
    if return_scores or return_tie_sets or return_above_sets:
        res: list = [out]
        if return_scores:
            res.append(kth)
        if return_tie_sets:
            res.append(tie_sets)
        if return_above_sets:
            res.append(above_sets)
        return tuple(res)
    return out


def _served_cases(
    ann,
    chunk_case: np.ndarray,
    query_embs: np.ndarray,
    k: int,
    nprobe: int,
    row_overfetch: int = 16,
) -> list[list[int]]:
    """Top-``k`` distinct cases through ``ann.search`` at ``nprobe``:
    fetch ``k*row_overfetch`` rows (duplicate-heavy corpora repeat cases)
    and dedup preserving score order — the host-side analogue of the
    fused program's device dedup."""
    k_rows = min(k * row_overfetch, ann.num_vectors)
    _, idx = ann.search(
        np.asarray(query_embs, np.float32), k_rows, nprobe=nprobe
    )
    idx = np.asarray(idx)
    out = []
    for r in idx:
        seen: list[int] = []
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


def tune_nprobe_case_recall(
    ann,  # index.ann.PartitionedANN (built)
    chunk_case: np.ndarray,  # [N] chunk → case row
    vectors: np.ndarray,  # [N, D] f32 corpus (memmap ok)
    query_embs: np.ndarray,  # [Q, D] query-shaped probe embeddings
    k: int = 10,
    target_recall: float = 0.95,
    max_nprobe: Optional[int] = None,
    min_recall: Optional[float] = None,
    tie_exact_floor: bool = True,
) -> int:
    """Smallest ``nprobe`` whose case-level recall@k vs the exact oracle
    reaches ``target_recall``; persists it in ``ann.tuned_nprobe`` (the
    per-artifact field ``ann.save`` writes to the npz meta — NOT the
    caller's shared config object).

    ``min_recall`` additionally constrains the WORST single probe
    (round-3 VERDICT item 7: the 5M build tuned to mean 0.984 but min
    0.90 — the tail probe missed the north star). With it set, an nprobe
    is only accepted when ``mean >= target_recall`` AND every individual
    probe's recall ``>= min_recall``; the sweep therefore lands on the
    smallest nprobe whose recall *distribution* (not just its mean)
    clears the bar.

    ``tie_exact_floor`` (default True) makes the FLOOR check tie-aware:
    a served case counts for the worst-probe metric when its exact score
    is ``>=`` the oracle's k-th score — i.e. picking a different member
    of an exact score tie than the oracle did is not a recall loss
    (round-4 measured the 5M build's floor miss as a pure 14-way tie at
    bitwise-identical f32 0.820125: oracle and served chose different
    equally-correct 10-subsets, zero real recall lost). Per the round-3
    postmortem's rule this is gated to EXACT f32 equality on the
    oracle's own score array — never a tolerance — so any genuinely
    lower-scoring case still counts as a miss. The MEAN acceptance stays
    strict set overlap (the conservative metric every recorded sweep
    reports), so tie-awareness can loosen only the floor, never the
    operating point the mean target picks.

    Same O(log P) doubling-sweep-plus-midpoint shape as
    ``PartitionedANN.tune_nprobe`` (each distinct nprobe is a fresh
    compiled program). If the target is unreachable within
    ``max_nprobe`` (default P//2 — probe cost grows as nprobe·m ≈
    nprobe·N·overalloc/P, so past ~P/2 the probe path no longer beats
    the brute scan and serving's guards would demote it anyway), the
    sweep settles on ``max_nprobe`` rather than chasing nprobe → P.

    The cap is additionally clamped below ``num_vectors / m``:
    ``ann.search`` silently demotes to the exact brute scan past that
    point, so measuring there would report the ORACLE's recall for a
    probe-path nprobe the sharded serving mode probes for real.
    """
    P = int(ann.centroids.shape[0])
    cap = min(max_nprobe or max(8, P // 2), P)
    m = int(ann.part_rows.shape[1]) if ann.part_rows is not None else 0
    if m > 0 and ann.num_vectors > m:
        cap = max(1, min(cap, (ann.num_vectors - 1) // m))
    oracle_lists, tie_sets, above_sets = case_level_oracle(
        vectors, chunk_case, query_embs, k,
        return_tie_sets=True, return_above_sets=True,
    )
    oracle = [set(o) for o in oracle_lists]

    # (strict mean, strict worst, floor worst) per nprobe; the floor
    # worst is tie-aware when tie_exact_floor (see docstring)
    measured: dict[int, tuple[float, float, float]] = {}

    def measure(nprobe: int) -> tuple[float, float, float]:
        if nprobe not in measured:
            served = _served_cases(ann, chunk_case, query_embs, k, nprobe)
            per = np.asarray([
                len(set(s) & o) / max(len(o), 1)
                for s, o in zip(served, oracle)
            ])
            per_tie = np.asarray([
                tie_aware_recall(set(s), o, t, a)
                for s, t, a, o in zip(served, tie_sets, above_sets, oracle)
            ])
            mean, worst = float(per.mean()), float(per.min())
            floor_worst = float(per_tie.min()) if tie_exact_floor else worst
            _log.info(
                "case recall@%d at nprobe=%d: mean %.4f min %.4f "
                "(tie-aware min %.4f)",
                k, nprobe, mean, worst, float(per_tie.min()),
            )
            measured[nprobe] = (mean, worst, floor_worst)
        return measured[nprobe]

    def accept_at(nprobe: int) -> bool:
        mean, _worst, floor_worst = measure(nprobe)
        if mean < target_recall:
            return False
        return min_recall is None or floor_worst >= min_recall

    if accept_at(1):
        hi = 1
    else:
        n, lo, hi = 1, 1, None
        while True:
            n = min(n * 2, cap)
            if accept_at(n):
                hi = n
                break
            lo = n
            if n >= cap:
                break
        if hi is None:  # target unreachable within the cap: settle.
            # A worst-probe recall that stays flat as nprobe doubles is a
            # RANKING-level artifact (score ties / case dedup choosing a
            # different equal-scoring case than the oracle), not probe
            # selection — paying cap probes buys nothing. Settle on the
            # smallest mean-passing nprobe that already achieves (within
            # eps) the best attainable worst-probe recall; fall back to
            # the cap only when even the mean target never passed.
            best_worst = max(w for _m, _s, w in measured.values())
            ok = [
                n for n, (mn, _s, w) in measured.items()
                if mn >= target_recall and w >= best_worst - 1e-3
            ]
            if min_recall is not None and ok:
                hi = min(ok)
                _log.warning(
                    "min-recall floor %.2f unreachable at nprobe<=%d "
                    "(best attainable worst %.2f); settling on "
                    "mean-target nprobe=%d",
                    min_recall, cap, best_worst, hi,
                )
            else:
                hi = cap
                _log.warning(
                    "case recall target %.2f (min %s) unreachable at "
                    "nprobe<=%d; settling on the cap",
                    target_recall, min_recall, cap,
                )
        elif hi - lo > 1:  # one midpoint refine (also when hi == cap)
            mid = (lo + hi) // 2
            if accept_at(mid):
                hi = mid
    ann.tuned_nprobe = int(hi)
    return int(hi)


def build_probe_embeddings(
    storage,  # storage.store.StorageManager
    text_processor,  # text.processor.TextProcessor
    embed_fn,  # Callable[[list[str]], np.ndarray]  (texts → [n, D])
    max_cases: int = 200,
    max_probes: int = 64,
) -> Optional[np.ndarray]:
    """Query-shaped probe embeddings from the stored corpus: half-sentence
    and legal-synonym-paraphrase probes (``models.quality.build_probes``)
    re-embedded with the serving encoder. Returns None when the corpus is
    too small to produce any probes."""
    from ..models.quality import build_probes

    docs = []
    for row, _meta, text in storage.iter_cases_rowid():
        if len(docs) >= max_cases:
            break
        if text:
            docs.append(
                (row, text_processor.extract_sentences(
                    text_processor.normalize_text(text)))
            )
    probes = build_probes(docs, max_probes=max_probes)
    if not probes:
        return None
    return np.asarray(embed_fn([p.query for p in probes]), np.float32)
