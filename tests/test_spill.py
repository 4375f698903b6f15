"""External-sort content-index build (index/spill.py): bit-parity with the
pooled builders, resume semantics, and TrieIndex integration."""

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import TrieConfig
from trie_semantic_search_tpu.index.spill import (
    SpillContentBuilder,
    csr_from_sorted_windows_py,
)
from trie_semantic_search_tpu.index.trie import FrozenTrie, TrieIndex

SENTS = [
    ("the defendant was convicted of fraud in the district court", 0, 0),
    ("the district court denied the motion to suppress evidence", 0, 1),
    ("evidence obtained by unlawful search is inadmissible", 1, 0),
    ("the defendant was convicted of fraud in the district court", 2, 0),
    ("a police officer may stop and frisk upon reasonable suspicion", 2, 1),
    ("the motion to suppress was denied by the district court", 3, 0),
]


def _pooled_content(cfg) -> FrozenTrie:
    idx = TrieIndex(cfg)
    for text, row, para in SENTS:
        idx.insert_content(text.split(), row, para)
    idx.freeze()
    return idx.content_trie


def _spilled_content(cfg, tmp_path, flush_every=2) -> FrozenTrie:
    sp = SpillContentBuilder(tmp_path / "spill", cfg, resume=False)
    names = []
    for i, (text, row, para) in enumerate(SENTS):
        sp.insert_content(text.split(), row, para)
        if (i + 1) % flush_every == 0:
            name = f"s{len(names):03d}"
            sp.flush(name)
            names.append(name)
    if sp._buf:
        name = f"s{len(names):03d}"
        sp.flush(name)
        names.append(name)
    return sp.finalize(names)


@pytest.mark.parametrize("mode", ["all", "phrase_start"])
def test_spill_bit_parity_with_pooled_builder(tmp_path, mode):
    """The spill build produces BIT-IDENTICAL frozen arrays to the pooled
    builders over the same stream (the repo freeze-layout invariant)."""
    cfg = TrieConfig()
    cfg.content_windowing = mode
    a = _pooled_content(cfg)
    b = _spilled_content(cfg, tmp_path / mode)
    assert a.vocab == b.vocab
    for f in FrozenTrie._ARRAY_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


def test_spill_python_fallback_matches_native(tmp_path):
    """csr_from_sorted_windows_py == the native pass (same sorted input)."""
    from trie_semantic_search_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    n, L = 500, 8
    W = rng.integers(0, 12, (n, L)).astype(np.int32)
    # random suffix padding
    for i in range(n):
        d = rng.integers(1, L + 1)
        W[i, d:] = -1
    order = np.lexsort(tuple(W[:, c] for c in range(L - 1, -1, -1)))
    W = np.ascontiguousarray(W[order])
    rows = rng.integers(0, 50, n).astype(np.int32)
    paras = rng.integers(0, 5, n).astype(np.int32)
    a = native.csr_from_sorted_windows(W, rows, paras)
    b = csr_from_sorted_windows_py(W, rows, paras)
    for f in a:
        np.testing.assert_array_equal(a[f], np.asarray(b[f]), err_msg=f)


def test_spill_resume_keeps_vocab_and_shards(tmp_path):
    """Vocab persists across a simulated crash; unflushed records drop and
    the re-streamed windows produce the same final trie."""
    cfg = TrieConfig()
    cfg.content_windowing = "phrase_start"
    d = tmp_path / "spill"
    sp = SpillContentBuilder(d, cfg, resume=False)
    sp.insert_content(SENTS[0][0].split(), 0, 0)
    sp.insert_content(SENTS[1][0].split(), 0, 1)
    sp.flush("s000")
    vocab_at_ckpt = dict(sp.vocab)
    sp.insert_content(SENTS[2][0].split(), 1, 0)  # never flushed → "crash"

    sp2 = SpillContentBuilder(d, cfg, resume=True)
    assert sp2.vocab == vocab_at_ckpt  # vocab checkpointed at flush
    # re-stream from the watermark (rows 1+)
    sp2.insert_content(SENTS[2][0].split(), 1, 0)
    for text, row, para in SENTS[3:]:
        sp2.insert_content(text.split(), row, para)
    sp2.flush("s001")
    resumed = sp2.finalize(["s000", "s001"])

    oracle = _spilled_content(cfg, tmp_path / "oracle", flush_every=3)
    for f in FrozenTrie._ARRAY_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(resumed, f)),
            np.asarray(getattr(oracle, f)), err_msg=f,
        )


def test_set_content_frozen_survives_freeze(tmp_path):
    """TrieIndex.freeze() must keep an externally installed content trie
    (names/citations still compile from their builders)."""
    cfg = TrieConfig()
    content = _spilled_content(cfg, tmp_path)
    idx = TrieIndex(cfg)
    idx.insert_case_name("Mapp v. Ohio", 0)
    idx.set_content_frozen(content)
    idx.freeze()
    assert idx.content_trie is content
    assert idx.name_trie.num_postings == 1
    # search works through the installed content trie
    rows, valid = idx.search_batch_rows(["district court"])
    hit_rows = set(rows[0][valid[0]].tolist())
    assert {0, 2, 3} <= hit_rows
    # incremental insert rehydrates instead of wiping
    idx.insert_content("entirely new content sentence".split(), 9, 0)
    idx.freeze()
    rows, valid = idx.search_batch_rows(["district court"])
    assert {0, 2, 3} <= set(rows[0][valid[0]].tolist())
    rows, valid = idx.search_batch_rows(["entirely new content"])
    assert 9 in rows[0][valid[0]].tolist()


def test_external_merge_multi_round_parity(tmp_path):
    """The streaming k-way merge (tiny merge_block_rows forces MANY pivot
    rounds + galloping) stays bit-identical to the pooled builder, with
    heavy cross-run duplicate windows exercising the stability invariant
    (equal windows keep stream order in the postings)."""
    cfg = TrieConfig()
    cfg.content_windowing = "all"
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    sents = []
    for row in range(40):
        # 30% exact duplicate sentences -> identical windows across runs
        if row and rng.random() < 0.3:
            text = sents[rng.integers(0, len(sents))][0]
        else:
            text = " ".join(rng.choice(vocab, size=rng.integers(4, 12)))
        sents.append((text, row, int(rng.integers(0, 3))))

    idx = TrieIndex(cfg)
    for text, row, para in sents:
        idx.insert_content(text.split(), row, para)
    idx.freeze()
    pooled = idx.content_trie

    sp = SpillContentBuilder(tmp_path / "spill", cfg, resume=False)
    names = []
    for i, (text, row, para) in enumerate(sents):
        sp.insert_content(text.split(), row, para)
        if (i + 1) % 5 == 0:
            names.append(f"s{len(names):03d}")
            sp.flush(names[-1])
    if sp._buf:
        names.append(f"s{len(names):03d}")
        sp.flush(names[-1])
    assert len(names) >= 8  # a real k-way merge, not a trivial one
    spilled = sp.finalize(names, merge_block_rows=4)

    assert pooled.vocab == spilled.vocab
    for f in FrozenTrie._ARRAY_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(pooled, f)),
            np.asarray(getattr(spilled, f)),
            err_msg=f,
        )


def test_external_merge_sorted_runs_cache_resume(tmp_path):
    """A second finalize over the same shards reuses the cached sorted
    runs (mtime-validated) and reproduces identical arrays."""
    cfg = TrieConfig()
    sp = SpillContentBuilder(tmp_path / "spill", cfg, resume=False)
    names = []
    for i, (text, row, para) in enumerate(SENTS):
        sp.insert_content(text.split(), row, para)
        names.append(f"s{i:03d}")
        sp.flush(names[-1])
    a = sp.finalize(names, merge_block_rows=2)
    mtimes = {
        p.name: p.stat().st_mtime_ns
        for p in (tmp_path / "spill").glob("sorted_s*.npy")
    }
    assert mtimes
    b = sp.finalize(names, merge_block_rows=2)
    assert mtimes == {
        p.name: p.stat().st_mtime_ns
        for p in (tmp_path / "spill").glob("sorted_s*.npy")
    }
    for f in FrozenTrie._ARRAY_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
