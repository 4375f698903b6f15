"""Retrieval-quality harness (models/quality.py): probe construction,
engine-path evaluation, and the trained-vs-random control."""

import numpy as np
import pytest

from trie_semantic_search_tpu.models.quality import (
    SYNONYMS,
    Probe,
    _paraphrase,
    build_probes,
    evaluate_embedder_direct,
)


def test_paraphrase_swaps_and_never_verbatim():
    rng = np.random.default_rng(0)
    s = "the attorney argued the judgment was unlawful under the statute"
    p = _paraphrase(s, rng)
    assert p is not None and p != s
    assert "lawyer" in p and "ruling" in p and "illegal" in p and "law" in p
    # no swappable word → None (probe would be a verbatim corpus string)
    assert _paraphrase("wholly unrelated plain words here", rng) is None


def test_build_probes_shapes_and_targets():
    docs = [
        (7, ["the attorney moved to suppress the evidence obtained "
             "without a warrant in this case"]),
        (9, ["the court held the contract was unenforceable for lack "
             "of valid consideration between the parties"]),
        (11, ["short one"]),  # below min_tokens → skipped
    ]
    probes = build_probes(docs, max_probes=16, seed=1)
    assert probes
    assert {p.target_case_row for p in probes} <= {7, 9}
    kinds = {p.kind for p in probes}
    assert "half" in kinds and "paraphrase" in kinds
    all_sents = {s for _, ss in docs for s in ss}
    for p in probes:
        assert p.query not in all_sents  # held-out: never verbatim

def test_pair_ranking_accuracy_metric():
    """pair_ranking_accuracy: 1.0 when positives are unambiguous, ~chance
    when pairs are shuffled (validates the metric itself; the trained-vs-
    random evidence at scale comes from `cli eval-retrieval --control` on
    the real corpus — committed as bench_results/retrieval_r03.json)."""
    from trie_semantic_search_tpu.core.config import EmbeddingModelConfig
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.minilm import MiniLMConfig
    from trie_semantic_search_tpu.models.quality import (
        pair_ranking_accuracy,
    )
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )

    subjects = ["warrant seizure", "contract breach", "speech press",
                "takings compensation", "counsel trial", "habeas custody",
                "standing injury", "preemption statute"]
    pairs = [
        (f"the {s} question arose first", f"the {s} question arose again")
        for s in subjects
    ]
    vocab = train_wordpiece_vocab(
        [a + " " + b for a, b in pairs], vocab_size=1024, min_frequency=1
    )
    tiny = MiniLMConfig(vocab_size=1024, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64, max_position=32)
    emb = Embedder(EmbeddingModelConfig(),
                   tokenizer=WordPieceTokenizer(vocab),
                   model_config=tiny, seed=0)
    # distinct-subject pairs: any reasonable encoder (even random mean-
    # pooled) resolves them via token identity
    assert pair_ranking_accuracy(emb, pairs) >= 0.75
    # shuffled positives: ~chance
    shuffled = [(pairs[i][0], pairs[(i + 3) % len(pairs)][1])
                for i in range(len(pairs))]
    assert pair_ranking_accuracy(emb, shuffled) <= 0.5


def test_pretrain_improves_training_objective():
    """pretrain_encoder reduces InfoNCE loss / raises in-batch accuracy on
    its own training distribution (the training-signal smoke test; scale
    retrieval quality is measured by the committed eval JSON)."""
    from trie_semantic_search_tpu.core.config import EmbeddingModelConfig
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.minilm import MiniLMConfig
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )
    from trie_semantic_search_tpu.models.train import (
        TrainConfig,
        pretrain_encoder,
    )

    rng = np.random.default_rng(7)
    POOL = ("court judge motion appeal record evidence witness statute "
            "contract property damages liability negligence warrant "
            "seizure counsel jury verdict sentence plea discovery").split()

    def make_doc():
        theme = rng.choice(len(POOL), 3, replace=False)
        sents = []
        for _ in range(6):
            noise = rng.choice(len(POOL), 6, replace=True)
            words = [POOL[t] for t in theme] + [POOL[n] for n in noise]
            rng.shuffle(words)
            sents.append("the " + " ".join(words) + " was considered")
        return sents

    docs = [make_doc() for _ in range(24)]
    vocab = train_wordpiece_vocab(
        [" ".join(s) for s in docs], vocab_size=2048, min_frequency=1
    )
    tiny = MiniLMConfig(vocab_size=2048, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128, max_position=64)
    emb = Embedder(EmbeddingModelConfig(),
                   tokenizer=WordPieceTokenizer(vocab),
                   model_config=tiny, seed=0)
    rep = pretrain_encoder(
        emb, docs, steps=150, batch_size=32,
        train_config=TrainConfig(total_steps=150, warmup_steps=15),
    )
    # in-batch accuracy far above chance (1/32) and loss below ln(32)
    assert rep["final_accuracy"] > 0.25, rep
    assert rep["final_loss"] < np.log(32), rep


def test_evaluate_stages_exact_vs_ann(tmp_path):
    """evaluate_stages (round-4 VERDICT item 5 instrumentation): the
    exact_full stage ranks by true cosine (MRR 1.0 on self-queries) and
    the ann_only stage reports the tuned-nprobe approximation on the same
    case-level contract."""
    from trie_semantic_search_tpu.index.ann import AnnConfig, PartitionedANN
    from trie_semantic_search_tpu.models.quality import Probe, evaluate_stages

    rng = np.random.default_rng(7)
    D, C, per = 32, 24, 4
    base = rng.standard_normal((C, D)).astype(np.float32)
    vecs = np.repeat(base, per, axis=0) + 0.05 * rng.standard_normal(
        (C * per, D)
    ).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    chunk_case = np.repeat(np.arange(C), per).astype(np.int64)

    ann = PartitionedANN(AnnConfig(num_partitions=4, rescore_factor=4))
    ann.build(vecs, seed=0)
    ann.tuned_nprobe = 4  # all partitions -> ANN == exact here

    class _Emb:
        def embed(self, texts):
            # deterministic: text "case <i>" -> that case's centroid
            idx = [int(t.split()[-1]) for t in texts]
            e = base[idx] / np.linalg.norm(
                base[idx], axis=1, keepdims=True
            )

            class _R:
                embedding = e.astype(np.float32)

            return _R()

    class _Vec:
        embedder = _Emb()
        refs = np.stack(
            [chunk_case, np.zeros_like(chunk_case)], axis=1
        )
        vectors = vecs

    _Vec.ann = ann

    class _Eng:
        vector_index = _Vec()

    probes = [
        Probe(query=f"case {i}", target_case_row=i, kind="half")
        for i in range(C)
    ]
    out = evaluate_stages(_Eng(), None, probes, k=10)
    assert out["exact_full"]["all"]["mrr"] == 1.0
    assert out["tuned_nprobe"] == 4
    assert out["ann_only"]["all"]["mrr"] == 1.0
