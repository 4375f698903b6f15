"""Serving-grade nprobe tuning (index/tuning.py).

Regression for the round-3 postmortem: corpus-row self-queries with
tie-aware score recall tuned the 5M-chunk CAP build to nprobe=1 while
true case-level serving recall was 0.53. The corpus here reproduces the
degeneracy in miniature: duplicate-text "topic" groups spanning many
cases, split across partitions by the balanced-capacity cap.
"""

from __future__ import annotations

import numpy as np
import pytest

from trie_semantic_search_tpu.index.ann import AnnConfig, PartitionedANN
from trie_semantic_search_tpu.index.tuning import (
    case_level_oracle,
    tune_nprobe_case_recall,
)


def _normed(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def duplicate_corpus():
    """[N, D] corpus of T topic groups: chunks of a topic cluster tightly
    across MANY distinct cases — the near-duplicate structure real legal
    corpora carry (boilerplate sentences). The per-case jitter (5e-2) is
    deliberately ABOVE bf16-rescore precision so the oracle's per-topic
    case ranking is resolvable by the index (a real corpus resolves its
    winners too); exact sub-precision ties are covered by
    test_case_level_oracle_tie_break."""
    rng = np.random.default_rng(0)
    T, cases_per_topic, chunks_per_case, D = 8, 32, 16, 32
    topics = _normed(rng.standard_normal((T, D)).astype(np.float32))
    rows, case_of = [], []
    case = 0
    for t in range(T):
        for _ in range(cases_per_topic):
            for _ in range(chunks_per_case):
                jit = 5e-2 * rng.standard_normal(D).astype(np.float32)
                rows.append(_normed(topics[t] + jit))
                case_of.append(case)
            case += 1
    corpus = np.asarray(rows, np.float32)
    return corpus, np.asarray(case_of, np.int64), topics


def test_case_level_oracle_tie_break():
    """EXACT duplicate groups: the oracle must resolve equal scores to the
    lower case row (the serving determinism invariant)."""
    rng = np.random.default_rng(3)
    D = 16
    topics = _normed(rng.standard_normal((2, D)).astype(np.float32))
    # 20 cases per topic, 4 identical chunks each (zero jitter)
    corpus = np.repeat(topics, 80, axis=0)  # [160, D]
    case_of = np.arange(160) // 4
    oracle = case_level_oracle(corpus, case_of, topics, k=10)
    # query = topic vector: all 20 cases of that topic tie exactly;
    # the k winners must be the LOWEST case rows of the topic
    assert oracle[0] == list(range(0, 10))
    assert oracle[1] == list(range(20, 30))
    # rerun → identical (pure function of inputs)
    assert case_level_oracle(corpus, case_of, topics, k=10) == oracle


def test_case_recall_tuner_delivers_promised_recall(duplicate_corpus):
    corpus, case_of, topics = duplicate_corpus
    ann = PartitionedANN(AnnConfig(num_partitions=64, rescore_factor=4))
    ann.build(corpus, seed=0)

    # query-shaped probes: between-topic mixtures (a real query relates
    # to a topic without being any chunk verbatim)
    rng = np.random.default_rng(1)
    w = rng.random((24, 1)).astype(np.float32) * 0.3
    ti = rng.integers(0, len(topics), 24)
    tj = (ti + 1) % len(topics)
    queries = _normed((1 - w) * topics[ti] + w * topics[tj])

    tuned = tune_nprobe_case_recall(
        ann, case_of, corpus, queries, k=10, target_recall=0.9
    )
    assert ann.tuned_nprobe == tuned
    assert ann.config.num_probes == 0  # shared config never mutated

    # the tuned value must actually deliver the recall it promised,
    # measured exactly as serving reports it (case-level set overlap)
    from trie_semantic_search_tpu.index.tuning import _served_cases

    oracle = [set(o) for o in case_level_oracle(corpus, case_of, queries, 10)]
    served = _served_cases(ann, case_of, queries, 10, tuned)
    recall = float(np.mean(
        [len(set(s) & o) / 10 for s, o in zip(served, oracle)]
    ))
    assert recall >= 0.9, f"case recall {recall} at tuned nprobe={tuned}"


def test_case_recall_tuner_caps_instead_of_chasing_P(duplicate_corpus):
    """An unreachable target settles on the cap, not nprobe → P."""
    corpus, case_of, _topics = duplicate_corpus
    ann = PartitionedANN(AnnConfig(num_partitions=64, rescore_factor=4))
    ann.build(corpus, seed=0)
    rng = np.random.default_rng(2)
    # orthogonal garbage queries: no stable oracle overlap achievable
    queries = _normed(rng.standard_normal((8, corpus.shape[1])))
    tuned = tune_nprobe_case_recall(
        ann, case_of, corpus, queries, k=10,
        target_recall=1.0, max_nprobe=16,
    )
    assert tuned <= 16


def test_min_recall_floor_tightens_the_tail(duplicate_corpus):
    """round-3 VERDICT item 7: with ``min_recall`` set, the tuner may not
    accept an nprobe whose MEAN clears the target while one probe's
    recall trails below the floor — the returned value's recall
    distribution must satisfy both."""
    corpus, case_of, topics = duplicate_corpus
    ann = PartitionedANN(AnnConfig(num_partitions=64, rescore_factor=4))
    ann.build(corpus, seed=0)

    rng = np.random.default_rng(4)
    w = rng.random((24, 1)).astype(np.float32) * 0.3
    ti = rng.integers(0, len(topics), 24)
    tj = (ti + 1) % len(topics)
    queries = _normed((1 - w) * topics[ti] + w * topics[tj])

    # measured distribution for these seeds: nprobe=6 -> mean .904 min .70,
    # nprobe=8 -> mean .963 min .80 — so mean-only tuning stops at 6 while
    # a 0.8 floor must push on to 8
    mean_only = tune_nprobe_case_recall(
        ann, case_of, corpus, queries, k=10, target_recall=0.9
    )
    floored = tune_nprobe_case_recall(
        ann, case_of, corpus, queries, k=10, target_recall=0.9,
        min_recall=0.8,
    )
    assert floored > mean_only  # the floor demands more probes
    assert ann.tuned_nprobe == floored

    from trie_semantic_search_tpu.index.tuning import _served_cases

    oracle = [set(o) for o in case_level_oracle(corpus, case_of, queries, 10)]
    served = _served_cases(ann, case_of, queries, 10, floored)
    per = np.asarray(
        [len(set(s) & o) / 10 for s, o in zip(served, oracle)]
    )
    assert per.mean() >= 0.9
    assert per.min() >= 0.8, f"worst probe {per.min()} at nprobe={floored}"


def test_min_recall_floor_unreachable_settles_on_cap(duplicate_corpus):
    corpus, case_of, _topics = duplicate_corpus
    ann = PartitionedANN(AnnConfig(num_partitions=64, rescore_factor=4))
    ann.build(corpus, seed=0)
    rng = np.random.default_rng(5)
    queries = _normed(rng.standard_normal((8, corpus.shape[1])))
    tuned = tune_nprobe_case_recall(
        ann, case_of, corpus, queries, k=10,
        target_recall=0.5, min_recall=1.0, max_nprobe=16,
    )
    assert tuned <= 16


def test_floor_plateau_settles_on_mean_target_not_cap(
    duplicate_corpus, monkeypatch
):
    """When the worst-probe recall PLATEAUS below the floor as nprobe
    doubles (a ranking-level artifact — ties/dedup — that more probes
    cannot fix), the tuner must settle on the smallest MEAN-passing
    nprobe instead of burning cap probes for nothing."""
    import trie_semantic_search_tpu.index.tuning as tuning

    corpus, case_of, _topics = duplicate_corpus
    ann = PartitionedANN(AnnConfig(num_partitions=64, rescore_factor=4))
    ann.build(corpus, seed=0)
    rng = np.random.default_rng(5)
    queries = _normed(rng.standard_normal((4, corpus.shape[1])))

    # fixed oracle: 10 cases per probe; served: 9/10 of them at nprobe>=2
    # (mean 0.9) but probe 0 stuck at 6/10 forever (worst 0.6 plateau)
    oracle_sets = [list(range(q * 100, q * 100 + 10)) for q in range(4)]
    monkeypatch.setattr(
        tuning, "case_level_oracle",
        # no boundary ties in this fixture: above == tie == oracle, so the
        # tie-aware floor degrades to strict overlap as intended
        lambda vectors, chunk_case, embs, k, return_tie_sets=False,
        return_above_sets=False: (
            oracle_sets,
            [frozenset(o) for o in oracle_sets],
            [frozenset(o) for o in oracle_sets],
        ),
    )

    def fake_served(ann_, chunk_case_, embs_, k_, nprobe):
        out = []
        for q, o in enumerate(oracle_sets):
            keep = 6 if q == 0 else (9 if nprobe >= 2 else 5)
            out.append(o[:keep])
        return out

    monkeypatch.setattr(tuning, "_served_cases", fake_served)
    tuned = tune_nprobe_case_recall(
        ann, case_of, corpus, queries, k=10,
        target_recall=0.8, min_recall=0.95, max_nprobe=16,
    )
    # mean passes from nprobe=2 (0.9+0.9+0.9+0.6)/4 = 0.825 >= 0.8; the
    # 0.6 worst never moves -> settle on 2, not the 16 cap
    assert tuned == 2


def test_oracle_tie_sets_are_exact_equality_only():
    """``return_tie_sets``: a case joins the boundary-tie set only at
    BITWISE-equal f32 score — an epsilon-lower case stays out (the
    round-3 postmortem's rule: never tolerance-based tie matching)."""
    rng = np.random.default_rng(7)
    D = 16
    topic = _normed(rng.standard_normal((1, D)).astype(np.float32))
    # 20 cases x 4 chunks, all exactly the topic vector ...
    corpus = np.repeat(topic, 80, axis=0).astype(np.float32)
    case_of = np.arange(80) // 4
    # ... except case 19, whose chunks are nudged measurably off-topic
    corpus[76:80] = _normed(
        topic + np.float32(1e-2) * rng.standard_normal(D).astype(np.float32)
    )
    top, ties = case_level_oracle(
        corpus, case_of, topic, k=10, return_tie_sets=True
    )
    assert top[0] == list(range(10))  # lower case rows win the tie
    # cases 0..18 tie bitwise; case 19 scores strictly lower and is OUT
    assert ties[0] == frozenset(range(19))


def test_tie_exact_floor_forgives_pure_ties_only(monkeypatch, caplog):
    """round-4 measured floor miss (a pure 14-way exact tie): with
    ``tie_exact_floor`` the tuner accepts a served set that picks a
    DIFFERENT member of an exact tie (zero real recall lost), but never
    a genuinely lower-scoring case."""
    import trie_semantic_search_tpu.index.tuning as tuning

    rng = np.random.default_rng(8)
    D = 16
    topics = _normed(rng.standard_normal((2, D)).astype(np.float32))
    # topic 0: 20 exactly-tied cases (rows 0..19); topic 1: cases 20..39
    corpus = np.repeat(topics, 80, axis=0).astype(np.float32)
    case_of = np.arange(160) // 4
    query = topics[:1]

    ann = PartitionedANN(AnnConfig(num_partitions=8, rescore_factor=4))
    ann.build(corpus, seed=0)

    def serve_swapped(ann_, chunk_case_, embs_, k_, nprobe):
        # the OTHER half of topic 0's 20-way tie: strict overlap with the
        # oracle's {0..9} is zero, yet every pick scores bitwise-equal
        return [list(range(10, 20))]

    import logging

    monkeypatch.setattr(tuning, "_served_cases", serve_swapped)
    with caplog.at_level(logging.WARNING, logger="tss_tpu.index.tuning"):
        tuned = tune_nprobe_case_recall(
            ann, case_of, corpus, query, k=10,
            target_recall=0.0, min_recall=1.0, max_nprobe=4,
        )
    assert tuned == 1  # fully forgiven: accepted at the first nprobe
    tuning_recs = [
        r for r in caplog.records if r.name == "tss_tpu.index.tuning"
    ]
    assert not tuning_recs  # the floor passed for real, no settle

    def serve_off_topic(ann_, chunk_case_, embs_, k_, nprobe):
        # 9 tie members + one case from topic 1 (genuinely lower score)
        return [list(range(11, 20)) + [25]]

    monkeypatch.setattr(tuning, "_served_cases", serve_off_topic)
    with caplog.at_level(logging.WARNING, logger="tss_tpu.index.tuning"):
        tune_nprobe_case_recall(
            ann, case_of, corpus, query, k=10,
            target_recall=0.0, min_recall=1.0, max_nprobe=4,
        )
    # NOT forgiven: the floor never passes (tie-aware worst 0.9 < 1.0)
    # and the tuner lands in the unreachable-floor settle path
    assert any(
        "unreachable" in r.getMessage()
        for r in caplog.records if r.name == "tss_tpu.index.tuning"
    )


def test_tie_floor_requires_every_strictly_above_case(monkeypatch, caplog):
    """round-4 ADVICE: a served set that DROPS a strictly-above-boundary
    case (real recall loss) but fills the slot with an extra boundary-tie
    member must NOT score 1.0 — only substitutions WITHIN the exact
    boundary tie are forgiven."""
    import logging

    import trie_semantic_search_tpu.index.tuning as tuning

    rng = np.random.default_rng(9)
    D = 16
    topic = _normed(rng.standard_normal((1, D)).astype(np.float32))
    # case 0: exactly the query topic (strictly best); cases 1..20: one
    # shared slightly-off vector -> a 20-way bitwise tie at the boundary
    near = _normed(
        topic + np.float32(0.05) * rng.standard_normal(D).astype(np.float32)
    )
    corpus = np.concatenate(
        [np.repeat(topic, 4, axis=0), np.repeat(near, 80, axis=0)]
    ).astype(np.float32)
    case_of = np.arange(84) // 4
    query = topic[:1]

    # sanity: oracle sees case 0 strictly above a 20-way boundary tie
    top, ties, above = tuning.case_level_oracle(
        corpus, case_of, query, k=10,
        return_tie_sets=True, return_above_sets=True,
    )
    assert above[0] == frozenset({0})
    assert ties[0] == frozenset(range(21))

    ann = PartitionedANN(AnnConfig(num_partitions=8, rescore_factor=4))
    ann.build(corpus, seed=0)

    def serve_dropping_the_best(ann_, chunk_case_, embs_, k_, nprobe):
        # 10 boundary-tie members, case 0 (the strict #1) DROPPED: the
        # old >=-kth metric scored this 1.0; real recall lost is 1/10
        return [list(range(11, 21))]

    monkeypatch.setattr(tuning, "_served_cases", serve_dropping_the_best)
    with caplog.at_level(logging.WARNING, logger="tss_tpu.index.tuning"):
        tuning.tune_nprobe_case_recall(
            ann, case_of, corpus, query, k=10,
            target_recall=0.0, min_recall=1.0, max_nprobe=4,
        )
    assert any(  # floor must fail -> unreachable-floor settle path
        "unreachable" in r.getMessage()
        for r in caplog.records if r.name == "tss_tpu.index.tuning"
    )
    # and the helper itself reports exactly 0.9, never 1.0
    assert tuning.tie_aware_recall(
        set(range(11, 21)), set(top[0]), ties[0], above[0]
    ) == pytest.approx(0.9)
