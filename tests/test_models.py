"""MiniLM encoder + WordPiece tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trie_semantic_search_tpu.models import (
    MiniLMConfig,
    WordPieceTokenizer,
    basic_tokenize,
    count_params,
    encode,
    init_params,
    load_tokenizer,
    param_partition_specs,
    train_wordpiece_vocab,
)

TINY = MiniLMConfig(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position=64)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(jax.random.PRNGKey(0), TINY)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

CORPUS = [
    "the supreme court held that due process requires notice",
    "the defendant filed a motion to suppress the evidence",
    "equal protection under the fourteenth amendment",
    "the court of appeals reversed the district court",
] * 3


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("U.S. v. Nixon") == ["u", ".", "s", ".", "v", ".", "nixon"]
    assert basic_tokenize("café", lowercase=True) == ["cafe"]  # accent strip


def test_train_vocab_and_tokenize():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=512, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    pieces = tok.tokenize("the supreme court")
    assert pieces == ["the", "supreme", "court"]  # frequent words are whole
    # unseen word still tokenizes (char fallback), never crashes
    pieces = tok.tokenize("xylophone")
    assert pieces and "[UNK]" not in pieces or pieces == ["[UNK]"]


def test_encode_shapes_and_specials():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=512, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    ids, mask = tok.encode("the court held", max_length=16)
    assert len(ids) == 16 and len(mask) == 16
    assert ids[0] == tok.cls_id
    assert ids[sum(mask) - 1] == tok.sep_id
    assert all(i == tok.pad_id for i in ids[sum(mask):])
    batch = tok.encode_batch(["a court", "the motion was denied"], max_length=16)
    assert batch.input_ids.shape == (2, 16)
    assert batch.input_ids.dtype == np.int32


def test_encode_truncation():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=512, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    long_text = "court " * 100
    ids, mask = tok.encode(long_text, max_length=16)
    assert len(ids) == 16 and sum(mask) == 16


def test_tokenizer_save_load(tmp_path):
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=256, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    p = tmp_path / "tok.json"
    tok.save(p)
    tok2 = WordPieceTokenizer.load(p)
    assert tok2.vocab == tok.vocab
    assert tok2.tokenize("supreme court") == tok.tokenize("supreme court")


def test_load_tokenizer_fallbacks(tmp_path):
    t = load_tokenizer(tmp_path / "missing.json", fallback_corpus=CORPUS)
    assert len(t) > 10
    t2 = load_tokenizer(tmp_path / "missing.json")  # char-level fallback
    ids, mask = t2.encode("abc", max_length=8)
    assert sum(mask) >= 3


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def test_encode_output_normalized(tiny_params):
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (3, 20)), jnp.int32)
    mask = jnp.ones((3, 20), jnp.int32)
    emb = encode(tiny_params, ids, mask, TINY)
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


def test_encode_deterministic(tiny_params):
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    e1 = encode(tiny_params, ids, mask, TINY)
    e2 = encode(tiny_params, ids, mask, TINY)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_padding_does_not_change_embedding(tiny_params):
    rng = np.random.default_rng(1)
    ids8 = jnp.asarray(rng.integers(1, 512, (2, 8)), jnp.int32)
    # same content padded to 16
    ids16 = jnp.concatenate([ids8, jnp.zeros((2, 8), jnp.int32)], axis=1)
    mask16 = jnp.concatenate([jnp.ones((2, 8), jnp.int32), jnp.zeros((2, 8), jnp.int32)], axis=1)
    e_short = encode(tiny_params, ids8, jnp.ones((2, 8), jnp.int32), TINY)
    e_padded = encode(tiny_params, ids16, mask16, TINY)
    np.testing.assert_allclose(np.asarray(e_short), np.asarray(e_padded), atol=5e-2)


def test_similar_inputs_more_similar(tiny_params):
    """Even random weights: overlapping token sequences embed closer than
    disjoint ones (sanity of pooling; embedding smoothness)."""
    a = jnp.asarray([[10, 11, 12, 13, 14, 15, 16, 17]], jnp.int32)
    b = jnp.asarray([[10, 11, 12, 13, 14, 15, 16, 200]], jnp.int32)  # 1 diff
    c = jnp.asarray([[300, 301, 302, 303, 304, 305, 306, 307]], jnp.int32)
    m = jnp.ones((1, 8), jnp.int32)
    ea, eb, ec = (np.asarray(encode(tiny_params, x, m, TINY))[0] for x in (a, b, c))
    assert ea @ eb > ea @ ec


def test_param_count_and_specs_match(tiny_params):
    assert count_params(tiny_params) > 0
    specs = param_partition_specs(TINY)
    # same tree structure
    jax.tree.map(lambda a, b: None, tiny_params, specs)


def test_jit_and_grad(tiny_params):
    """The encoder must be differentiable (training path) and jittable."""
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)

    def loss_fn(p):
        e = encode(p, ids, mask, TINY, compute_dtype=jnp.float32)
        return jnp.sum(e**2)

    g = jax.jit(jax.grad(loss_fn))(tiny_params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_model_family_dispatch():
    from trie_semantic_search_tpu.core.config import EmbeddingModelConfig
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.minilm import config_for_model_type
    from trie_semantic_search_tpu.models.tokenizer import WordPieceTokenizer

    lb = config_for_model_type("legal-bert", vocab_size=1000, max_position=64)
    assert lb.hidden_size == 768 and lb.num_layers == 12
    ml = config_for_model_type("minilm-l6", vocab_size=1000, max_position=64)
    assert ml.hidden_size == 384 and ml.num_layers == 6
    unknown = config_for_model_type("mystery", vocab_size=1000, max_position=64)
    assert unknown.hidden_size == 384  # MiniLM fallback

    vocab = train_wordpiece_vocab(CORPUS, vocab_size=256, min_frequency=1)
    emb = Embedder(
        EmbeddingModelConfig(model_type="legal-bert", max_sequence_length=32),
        tokenizer=WordPieceTokenizer(vocab),
    )
    assert emb.dimension == 768


def test_sif_weights_from_counts():
    from trie_semantic_search_tpu.models.minilm import sif_weights_from_counts

    counts = np.array([0, 100, 900, 0], np.int64)
    w = sif_weights_from_counts(counts, a=0.1)
    assert w.dtype == np.float32
    assert w[0] == w[3] == 1.0  # unseen: maximum weight
    assert w[1] > w[2]  # rarer token weighs more
    np.testing.assert_allclose(w[1], 0.1 / (0.1 + 0.1), rtol=1e-6)
    # degenerate: empty corpus -> all ones
    assert (sif_weights_from_counts(np.zeros(4, np.int64)) == 1.0).all()


def test_weighted_pooling_matches_numpy_reference(tiny_params):
    """token_weights pooling == mask*w weighted mean of the hidden states;
    None must reproduce the plain masked mean exactly."""
    from trie_semantic_search_tpu.models.minilm import forward

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 512, (2, 8)), jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0], [1] * 8], jnp.int32)
    tw = jnp.asarray(rng.random(512).astype(np.float32) + 0.1)

    plain = np.asarray(encode(tiny_params, ids, mask, TINY))
    weighted = np.asarray(
        encode(tiny_params, ids, mask, TINY, token_weights=tw)
    )
    assert not np.allclose(plain, weighted)

    hidden = np.asarray(forward(tiny_params, ids, mask, TINY))
    w = np.asarray(mask, np.float32) * np.asarray(tw)[np.asarray(ids)]
    ref = (hidden * w[:, :, None]).sum(1) / w.sum(1, keepdims=True)
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(weighted, ref, rtol=2e-5, atol=2e-5)


def test_embedder_token_weights_roundtrip():
    """set_token_weights switches the jit program (weighted != plain) and
    None restores the original embeddings bit-for-bit."""
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )

    texts = ["the court held that the claim fails",
             "a contract dispute about shipping terms"]
    vocab = train_wordpiece_vocab(texts, vocab_size=512, min_frequency=1)
    emb = Embedder(tokenizer=WordPieceTokenizer(vocab), model_config=TINY)
    plain = emb.embed(texts).embedding
    tw = np.linspace(0.1, 1.0, max(len(emb.tokenizer), 128)).astype(np.float32)
    emb.set_token_weights(tw)
    weighted = emb.embed(texts).embedding
    assert not np.allclose(plain, weighted)
    emb.set_token_weights(None)
    np.testing.assert_array_equal(plain, emb.embed(texts).embedding)


def test_mine_view_pairs_unambiguous_positives():
    from trie_semantic_search_tpu.models.train import (
        augment_view,
        mine_view_pairs,
    )

    docs = [[f"The attorney argued that claim {i} turns on the statute "
             f"enacted in 199{i}." for i in range(3)]]
    pairs = mine_view_pairs(docs, seed=1)
    assert len(pairs) == 3
    rng = np.random.default_rng(0)
    for a, b in pairs:
        assert a and b
        assert "1990" not in a and "1991" not in a  # digits scrubbed
    # two draws over the same sentence differ (stochastic views)
    s = docs[0][0]
    views = {augment_view(s, rng) for _ in range(8)}
    assert len(views) > 1
