"""Contrastive training tests: loss math, single step, sharded dp×tp step
on the virtual mesh, and end-to-end retrieval improvement from pretraining."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from trie_semantic_search_tpu.core.config import EmbeddingModelConfig
from trie_semantic_search_tpu.models import minilm
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.models.train import (
    TrainConfig,
    info_nce_loss,
    make_optimizer,
    make_sharded_train_step,
    mine_pairs,
    pretrain_encoder,
    train_step,
)
from trie_semantic_search_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

TINY = minilm.MiniLMConfig(
    vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position=32,
)


def test_info_nce_perfect_alignment():
    e = jnp.eye(4, 8)
    loss, acc = info_nce_loss(e, e, temperature=0.05)
    assert float(acc) == 1.0
    assert float(loss) < 0.01


def test_info_nce_shuffled_is_worse():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 16)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    aligned, _ = info_nce_loss(jnp.asarray(a), jnp.asarray(a), 0.05)
    shuffled, _ = info_nce_loss(jnp.asarray(a), jnp.asarray(np.roll(a, 1, 0)), 0.05)
    assert float(aligned) < float(shuffled)


def test_info_nce_false_negative_mask():
    """Masked duplicates stop penalising the anchor: a batch where rows 0
    and 1 embed IDENTICALLY is unlearnable unmasked (the softmax splits
    probability between the twins — acc can never reach 1) but perfect
    once each twin is excluded from the other's negatives."""
    e = np.eye(4, 8, dtype=np.float32)
    e[1] = e[0]  # rows 0 and 1 are duplicates
    e = jnp.asarray(e)
    loss_unmasked, _acc_u = info_nce_loss(e, e, temperature=0.05)
    mask = np.ones((4, 4), dtype=bool)
    mask[0, 1] = mask[1, 0] = False
    loss_masked, acc_m = info_nce_loss(
        e, e, temperature=0.05, neg_mask=jnp.asarray(mask)
    )
    assert float(acc_m) == 1.0
    assert float(loss_masked) < 0.01 < float(loss_unmasked)


def test_false_negative_mask_builder():
    from trie_semantic_search_tpu.models.train import _false_negative_mask

    texts = [
        "the court held that due process applies here",
        "the court held that due process applies here",  # verbatim twin
        "an entirely different question of patent law",
    ]
    m = _false_negative_mask(texts, jaccard_threshold=0.8)
    assert not m[0, 1] and not m[1, 0]  # twins excluded for each other
    assert m[0, 2] and m[2, 0] and m[1, 2]  # distinct texts usable
    assert m[0, 0] and m[1, 1] and m[2, 2]  # diagonal untouched (kept by loss)


def test_batches_carry_neg_mask():
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )
    from trie_semantic_search_tpu.models.train import batches_from_pairs

    pairs = [("alpha beta gamma", "delta epsilon zeta")] * 4 + [
        ("one two three", "four five six")
    ] * 4
    tok = WordPieceTokenizer(
        train_wordpiece_vocab(iter([" ".join(sum(map(list, pairs), []))]),
                              vocab_size=128)
    )
    it = batches_from_pairs(pairs, tok, batch_size=8, max_len=8,
                            false_negative_jaccard=0.5)
    batch = next(it)
    m = np.asarray(batch["neg_mask"])
    assert m.shape == (8, 8)
    # duplicates of the same pair must be mutually excluded
    assert (~m).sum() >= 8
    # without the option the key is absent (sharded-step contract)
    it2 = batches_from_pairs(pairs, tok, batch_size=8, max_len=8)
    assert "neg_mask" not in next(it2)


def test_train_step_reduces_loss():
    params = minilm.init_params(jax.random.PRNGKey(0), TINY)
    cfg = TrainConfig(total_steps=30, warmup_steps=2, learning_rate=1e-3)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    batch = {
        "ids_a": jnp.asarray(rng.integers(0, 256, (8, 12)), jnp.int32),
        "mask_a": jnp.ones((8, 12), jnp.int32),
        "ids_b": jnp.asarray(rng.integers(0, 256, (8, 12)), jnp.int32),
        "mask_b": jnp.ones((8, 12), jnp.int32),
    }
    step = jax.jit(
        lambda p, s, b: train_step(p, s, b, TINY, opt, 0.05)
    )
    losses = []
    for _ in range(15):
        params, opt_state, loss, acc = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # memorises the fixed batch
    assert np.isfinite(losses).all()


def test_sharded_train_step_dp_tp(cpu_devices):
    """Full dp=4 × tp=2 training step on the virtual mesh."""
    mesh = Mesh(np.array(cpu_devices[:8]).reshape(4, 2), (DATA_AXIS, MODEL_AXIS))
    params = minilm.init_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(TrainConfig(total_steps=10))
    opt_state = opt.init(params)
    step = make_sharded_train_step(mesh, TINY, opt)
    rng = np.random.default_rng(1)
    sh = NamedSharding(mesh, P(DATA_AXIS, None))
    batch = {
        "ids_a": jax.device_put(jnp.asarray(rng.integers(0, 256, (8, 12)), jnp.int32), sh),
        "mask_a": jax.device_put(jnp.ones((8, 12), jnp.int32), sh),
        "ids_b": jax.device_put(jnp.asarray(rng.integers(0, 256, (8, 12)), jnp.int32), sh),
        "mask_b": jax.device_put(jnp.ones((8, 12), jnp.int32), sh),
    }
    params2, opt_state2, loss, acc = step(params, opt_state, batch)
    assert np.isfinite(float(loss))
    # tp sharding actually applied to the FFN kernel
    wi = params2["layers"]["wi_kernel"]
    assert wi.sharding.spec == P(None, None, "model")


def test_sharded_step_matches_single_device(cpu_devices):
    """dp-sharded loss == single-device loss (same math, just distributed)."""
    params = minilm.init_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(TrainConfig(total_steps=10))
    rng = np.random.default_rng(2)
    batch = {
        "ids_a": jnp.asarray(rng.integers(0, 256, (8, 12)), jnp.int32),
        "mask_a": jnp.ones((8, 12), jnp.int32),
        "ids_b": jnp.asarray(rng.integers(0, 256, (8, 12)), jnp.int32),
        "mask_b": jnp.ones((8, 12), jnp.int32),
    }
    _, _, loss_single, _ = jax.jit(
        lambda p, s, b: train_step(p, s, b, TINY, opt, 0.05)
    )(params, opt.init(params), batch)

    mesh = Mesh(np.array(cpu_devices[:8]).reshape(8, 1), (DATA_AXIS, MODEL_AXIS))
    step = make_sharded_train_step(mesh, TINY, opt)
    sh = NamedSharding(mesh, P(DATA_AXIS, None))
    sharded_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
    _, _, loss_sharded, _ = step(params, opt.init(params), sharded_batch)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), atol=1e-3)


def test_mine_pairs():
    docs = [["s1", "s2", "s3"], ["a1", "a2"]]
    pairs = mine_pairs(docs, seed=0)
    assert ("s1", "s2") in pairs and ("a1", "a2") in pairs
    assert len(pairs) >= 4  # adjacents + long-range


def test_pretrain_improves_retrieval():
    """After pretraining, adjacent-sentence retrieval beats random-init."""
    docs = [
        ["the court denied the motion to dismiss",
         "the motion to dismiss was denied by the court",
         "an appeal followed the denial of the motion"],
        ["the contract was breached by the seller",
         "the seller breached the agreement terms",
         "damages were awarded for the breach"],
        ["the fourth amendment protects against searches",
         "unreasonable searches violate the fourth amendment",
         "the evidence from the search was suppressed"],
        ["the defendant has a right to counsel",
         "counsel must be provided to indigent defendants",
         "the right to a lawyer is fundamental"],
    ] * 2
    texts = [s for d in docs for s in d]
    vocab = train_wordpiece_vocab(texts, vocab_size=2048, min_frequency=1)
    emb = Embedder(
        EmbeddingModelConfig(max_sequence_length=32),
        tokenizer=WordPieceTokenizer(vocab),
        model_config=TINY,
    )

    def mean_pair_sim():
        out = emb.embed(texts).embedding
        sims = []
        i = 0
        for d in docs:
            for j in range(len(d) - 1):
                sims.append(float(out[i + j] @ out[i + j + 1]))
            i += len(d)
        return np.mean(sims)

    before = mean_pair_sim()
    report = pretrain_encoder(
        emb, docs, steps=20, batch_size=8, max_len=32,
        train_config=TrainConfig(total_steps=20, warmup_steps=2,
                                 learning_rate=1e-3),
    )
    assert report["steps"] == 20
    after = mean_pair_sim()
    assert after > before  # same-doc sentences moved closer


def test_pretrain_guardrail_keeps_better_weights():
    """pretrain_encoder_guarded must leave the embedder holding whichever
    weights (trained vs init) score better on the probe harness, and
    record the decision."""
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )
    from trie_semantic_search_tpu.models.train import pretrain_encoder_guarded

    rng = np.random.default_rng(0)
    topics = ["due process", "habeas corpus", "eminent domain", "double jeopardy"]
    docs = []
    for d in range(24):
        t = topics[d % len(topics)]
        docs.append([
            f"case number {d} presents a question of {t} under review "
            f"and the record at trial {int(rng.integers(0, 999))} controls",
            f"the court held that the {t} claim turns on the evidence "
            f"developed below in docket {int(rng.integers(0, 999))}",
            f"the judgment on the {t} question is affirmed and remanded "
            f"for proceedings consistent with this opinion part {d}",
        ] * 3)
    vocab = train_wordpiece_vocab(iter([" ".join(s) for s in docs]),
                                  vocab_size=512)
    from trie_semantic_search_tpu.core.config import Config

    mc = Config().vector.model
    emb = Embedder(mc, tokenizer=WordPieceTokenizer(vocab), seed=0,
                   model_config=TINY)
    init_leaf = np.asarray(
        jax.tree.leaves(emb.params)[0]
    ).copy()
    rep = pretrain_encoder_guarded(
        emb, docs, steps=12, batch_size=8, max_len=24,
        train_config=TrainConfig(total_steps=12, warmup_steps=2),
        eval_docs=24, eval_probes=24,
    )
    g = rep["guardrail"]
    assert g["kept"] in ("trained", "init")
    now_leaf = np.asarray(jax.tree.leaves(emb.params)[0])
    if g["kept"] == "init":
        np.testing.assert_array_equal(now_leaf, init_leaf)
        assert g["init_mrr"] > g["trained_mrr"]
    else:
        assert g["trained_mrr"] >= g["init_mrr"]


def test_pretrain_skips_tiny_corpus():
    emb = Embedder(
        EmbeddingModelConfig(max_sequence_length=32),
        tokenizer=WordPieceTokenizer(
            train_wordpiece_vocab(["a b"], vocab_size=64, min_frequency=1)
        ),
        model_config=TINY,
    )
    report = pretrain_encoder(emb, [["one", "two"]], steps=5, batch_size=32)
    assert report["steps"] == 0


def _pool_docs(n_docs=24):
    docs = []
    for i in range(n_docs):
        t = ["due process", "equal protection", "habeas corpus",
             "double jeopardy"][i % 4]
        docs.append([
            f"The court held that the {t} claim number {i} controls the "
            f"outcome of this matter entirely.",
            f"In its analysis the court concluded the {t} question turns "
            f"on the record developed at trial number {i * 13}.",
            f"The judgment in case {i} about {t} is affirmed and remanded "
            f"for proceedings consistent with this opinion.",
        ])
    return docs


def test_select_pooling_guarded_sets_winner():
    from trie_semantic_search_tpu.models.train import select_pooling_guarded

    docs = _pool_docs()
    texts = [s for d in docs for s in d]
    vocab = train_wordpiece_vocab(texts, vocab_size=2048, min_frequency=1)
    emb = Embedder(tokenizer=WordPieceTokenizer(vocab),
                   model_config=TINY)
    rec = select_pooling_guarded(emb, docs, eval_docs=24, eval_probes=32)
    assert rec["pooling"] in ("mean", "sif")
    if rec["pooling"] == "sif":
        assert emb.token_weights is not None
        assert rec["sif_mrr"] > rec["mean_mrr"]
    else:
        assert emb.token_weights is None
    # forcing skips the comparison and pins the mode
    rec2 = select_pooling_guarded(emb, docs, force="sif")
    assert rec2["pooling"] == "sif" and emb.token_weights is not None
    rec3 = select_pooling_guarded(emb, docs, force="mean")
    assert rec3["pooling"] == "mean" and emb.token_weights is None


def test_select_pooling_tiny_corpus_falls_back_to_mean():
    from trie_semantic_search_tpu.models.train import select_pooling_guarded

    docs = [["short one."], ["short two."]]
    vocab = train_wordpiece_vocab(
        [s for d in docs for s in d], vocab_size=512, min_frequency=1
    )
    emb = Embedder(tokenizer=WordPieceTokenizer(vocab),
                   model_config=TINY)
    rec = select_pooling_guarded(emb, docs)
    assert rec["pooling"] == "mean" and emb.token_weights is None
