"""Array-trie tests: builder → freeze → device walk vs a Python-dict oracle,
plus reference-parity semantics (routing, is_end, completions cap)."""

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import TrieConfig
from trie_semantic_search_tpu.index.trie import (
    PAD_TOKEN,
    UNKNOWN_TOKEN,
    FrozenTrie,
    TrieBuilder,
    TrieIndex,
)


@pytest.fixture()
def small_trie():
    b = TrieBuilder()
    b.insert(["brown", "v", "board"], 0)
    b.insert(["brown", "v", "board", "of", "education"], 1)
    b.insert(["miranda", "v", "arizona"], 2)
    b.insert(["brown", "act"], 3)
    b.insert(["miranda", "v", "arizona"], 4)  # second posting, same path
    return b.freeze()


def test_freeze_structure(small_trie):
    t = small_trie
    assert t.num_nodes >= 9
    assert t.edge_offsets[0] == 0
    assert t.edge_offsets[-1] == t.num_edges
    # edges sorted by token within each node span
    for n in range(t.num_nodes):
        span = t.edge_tokens[t.edge_offsets[n] : t.edge_offsets[n + 1]]
        assert (np.diff(span) > 0).all() if len(span) > 1 else True
    assert t.num_postings == 5


def test_walk_exact_hits(small_trie):
    t = small_trie
    ids = t.encode_queries(
        [
            ["brown", "v", "board"],
            ["miranda", "v", "arizona"],
            ["brown", "act"],
            ["brown", "v"],  # internal node: walk ok, not end
            ["nope"],  # unknown token
            ["brown", "v", "wrong"],
        ],
        max_len=8,
    )
    nodes, rows, valid = t.search_batch(ids)
    # exact matches
    assert valid[0].sum() == 1 and rows[0][valid[0]].tolist() == [0]
    assert valid[1].sum() == 2 and sorted(rows[1][valid[1]].tolist()) == [2, 4]
    assert valid[2].sum() == 1 and rows[2][valid[2]].tolist() == [3]
    # internal node: walk succeeded but no postings (is_end false)
    assert nodes[3] >= 0 and valid[3].sum() == 0
    # misses
    assert nodes[4] == -1 and valid[4].sum() == 0
    assert nodes[5] == -1


def test_walk_padding_semantics(small_trie):
    t = small_trie
    ids = t.encode_queries([["brown", "act"]], max_len=8)
    assert (ids[0, 2:] == PAD_TOKEN).all()
    nodes, rows, valid = t.search_batch(ids)
    assert valid[0].sum() == 1  # padding doesn't kill the walk


def test_unknown_token_id():
    b = TrieBuilder()
    b.insert(["a"], 0)
    t = b.freeze()
    ids = t.encode_queries([["zzz"]], 4)
    assert ids[0, 0] == UNKNOWN_TOKEN


def test_device_walk_matches_python_oracle():
    """Randomized: device walk == dict-trie walk on 200 random queries."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    b = TrieBuilder()
    inserted = []
    for row in range(100):
        path = [vocab[i] for i in rng.integers(0, 30, rng.integers(1, 6))]
        b.insert(path, row)
        inserted.append(path)
    t = b.freeze()

    # python oracle
    oracle: dict = {}
    for row, path in enumerate(inserted):
        d = oracle
        for tok in path:
            d = d.setdefault(tok, {})
        d.setdefault("__end__", []).append(row)

    queries = []
    for _ in range(200):
        if rng.random() < 0.5:
            queries.append(list(inserted[rng.integers(0, len(inserted))]))
        else:
            queries.append([vocab[i] for i in rng.integers(0, 30, rng.integers(1, 6))])

    ids = t.encode_queries(queries, 8)
    nodes, rows, valid = t.search_batch(ids, max_postings=128)
    for qi, q in enumerate(queries):
        d = oracle
        ok = True
        for tok in q:
            if tok in d:
                d = d[tok]
            else:
                ok = False
                break
        expected = sorted(d.get("__end__", [])) if ok else []
        got = sorted(rows[qi][valid[qi]].tolist())
        assert got == expected, f"query {q}: {got} != {expected}"


def test_completions(small_trie):
    t = small_trie
    comps = t.completions(["brown"], limit=10)
    assert "brown v board" in comps
    assert "brown v board of education" in comps
    assert "brown act" in comps
    # deterministic ordering across calls
    assert comps == t.completions(["brown"], limit=10)
    # completions exclude the prefix itself
    comps2 = t.completions(["brown", "v", "board"], limit=10)
    assert comps2 == ["brown v board of education"]
    # cap respected
    assert len(t.completions([], limit=3)) == 3
    # unknown prefix
    assert t.completions(["zzz"]) == []


def test_save_load_roundtrip(small_trie, tmp_path):
    p = tmp_path / "trie.npz"
    small_trie.save(p)
    loaded = FrozenTrie.load(p)
    assert loaded.num_nodes == small_trie.num_nodes
    ids = loaded.encode_queries([["miranda", "v", "arizona"]], 8)
    _, rows, valid = loaded.search_batch(ids)
    assert sorted(rows[0][valid[0]].tolist()) == [2, 4]
    assert loaded.completions(["brown"]) == small_trie.completions(["brown"])


def test_empty_trie_safe():
    t = TrieBuilder().freeze()
    ids = t.encode_queries([["anything"]], 4)
    nodes, rows, valid = t.search_batch(ids)
    assert nodes[0] == -1 and valid.sum() == 0
    assert t.completions(["x"]) == []


# ---------------------------------------------------------------------------
# TrieIndex facade
# ---------------------------------------------------------------------------


@pytest.fixture()
def index():
    idx = TrieIndex(TrieConfig())
    idx.insert_case_name("Brown v. Board of Education", 0)
    idx.insert_case_name("Miranda v. Arizona", 1)
    idx.insert_citation("347 U.S. 483 (1954)", 0)
    idx.insert_content("separate educational facilities are inherently unequal".split(), 0, 2)
    idx.insert_content("you have the right to remain silent".split(), 1, 5)
    idx.freeze()
    return idx


def test_index_routes_name_first(index):
    res = index.search("brown v. board of education")
    assert res.exact_matches == [(0, 0)]


def test_index_routes_citation(index):
    res = index.search("347 U.S. 483 (1954)")
    assert res.exact_matches == [(0, 0)]


def test_index_content_phrase_anywhere(index):
    # window insertion → phrase match mid-paragraph
    res = index.search("inherently unequal")
    assert (0, 2) in res.exact_matches
    res = index.search("right to remain silent")
    assert (1, 5) in res.exact_matches


def test_index_miss(index):
    res = index.search("habeas corpus petition")
    assert res.exact_matches == []


def test_index_completions(index):
    comps = index.get_completions("miranda")
    assert any("arizona" in c for c in comps)


def test_index_batch_rows(index):
    rows, valid = index.search_batch_rows(
        ["brown v. board of education", "right to remain silent", "no match here"]
    )
    assert rows.shape[0] == 3
    assert 0 in rows[0][valid[0]]
    assert 1 in rows[1][valid[1]]
    assert valid[2].sum() == 0


def test_index_save_load(index, tmp_path):
    index.save_to_disk(tmp_path / "tries")
    loaded = TrieIndex.load_from_disk(tmp_path / "tries")
    res = loaded.search("miranda v. arizona")
    assert res.exact_matches == [(1, 0)]
    stats = loaded.get_stats()
    assert stats["name"]["nodes"] > 1


def test_index_stats(index):
    st = index.get_stats()
    assert st["content"]["postings"] > 0
    assert st["name"]["bytes"] > 0


# ---------------------------------------------------------------------------
# subtree (prefix) postings — DFS-order range gather
# ---------------------------------------------------------------------------


def test_subtree_postings_prefix_gather(small_trie):
    t = small_trie
    # "brown" is an internal node: exact gather finds nothing, prefix gather
    # finds every path below it (rows 0, 1, 3)
    ids = t.encode_queries([["brown"]], 8)
    _, rows, valid = t.search_batch(ids, prefix=False)
    assert valid.sum() == 0
    _, rows, valid = t.search_batch(ids, prefix=True)
    assert sorted(rows[0][valid[0]].tolist()) == [0, 1, 3]
    # exact node: prefix gather includes its own + deeper postings
    ids = t.encode_queries([["brown", "v", "board"]], 8)
    _, rows, valid = t.search_batch(ids, prefix=True)
    assert sorted(rows[0][valid[0]].tolist()) == [0, 1]


def test_content_phrase_mid_sentence():
    """Regression: phrases that do NOT end at a window/sentence boundary
    must still match (found via the ingestion demo)."""
    idx = TrieIndex(TrieConfig())
    idx.insert_content(
        "the person has the right to remain silent and anything said".split(),
        7, 3,
    )
    idx.freeze()
    res = idx.search("right to remain")
    assert (7, 3) in res.exact_matches
    rows, valid = idx.search_batch_rows(["right to remain"])
    assert 7 in rows[0][valid[0]]


def test_subtree_postings_survive_save_load(small_trie, tmp_path):
    p = tmp_path / "t.npz"
    small_trie.save(p)
    loaded = FrozenTrie.load(p)
    ids = loaded.encode_queries([["brown"]], 8)
    _, rows, valid = loaded.search_batch(ids, prefix=True)
    assert sorted(rows[0][valid[0]].tolist()) == [0, 1, 3]


# ---------------------------------------------------------------------------
# native builder parity
# ---------------------------------------------------------------------------


def test_native_builder_matches_python():
    from trie_semantic_search_tpu import native
    from trie_semantic_search_tpu.index.trie import FastTrieBuilder

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    paths = [
        [f"tok{t}" for t in rng.integers(0, 40, rng.integers(1, 7))]
        for _ in range(300)
    ]
    fast = FastTrieBuilder()
    assert fast.is_native
    py = TrieBuilder()
    for row, p in enumerate(paths):
        fast.insert(p, row, row % 4)
        py.insert(p, row, row % 4)
    a, b = fast.freeze(), py.freeze()
    assert a.vocab == b.vocab
    np.testing.assert_array_equal(a.edge_offsets, b.edge_offsets)
    np.testing.assert_array_equal(a.edge_tokens, b.edge_tokens)
    np.testing.assert_array_equal(a.edge_targets, b.edge_targets)
    np.testing.assert_array_equal(a.post_offsets, b.post_offsets)
    np.testing.assert_array_equal(a.post_case, b.post_case)
    np.testing.assert_array_equal(a.post_para, b.post_para)
    np.testing.assert_array_equal(a.subtree_post_end, b.subtree_post_end)
    np.testing.assert_array_equal(a.is_end, b.is_end)
    np.testing.assert_array_equal(a.frequency, b.frequency)


def test_native_insert_windows_matches_loop():
    from trie_semantic_search_tpu import native
    from trie_semantic_search_tpu.index.trie import FastTrieBuilder

    if not native.available():
        pytest.skip("native library unavailable")
    toks = "the quick brown fox jumps over the lazy dog again and again".split()
    fast = FastTrieBuilder()
    fast.insert_windows(toks, window=4, max_windows=100, case_row=9, para_idx=2)
    py = TrieBuilder()
    for s in range(len(toks)):
        py.insert(toks[s : s + 4], 9, 2)
    a, b = fast.freeze(), py.freeze()
    np.testing.assert_array_equal(a.edge_tokens, b.edge_tokens)
    np.testing.assert_array_equal(a.post_case, b.post_case)
    np.testing.assert_array_equal(a.subtree_post_end, b.subtree_post_end)


def test_content_phrase_adjacent_to_punctuation():
    """Regression (found running the ingestion demo): phrases whose last
    word abuts punctuation in the source text must still match."""
    idx = TrieIndex(TrieConfig())
    idx.insert_content(
        "he has the right to remain silent, and that anything he says".split(),
        4, 1,
    )
    idx.freeze()
    res = idx.search("right to remain silent")
    assert (4, 1) in res.exact_matches
    # names match punctuation-insensitively too
    idx2 = TrieIndex(TrieConfig())
    idx2.insert_case_name("Brown v. Board of Education", 7)
    idx2.freeze()
    assert idx2.search("brown v board of education").exact_matches == [(7, 0)]


def test_punctuation_only_query_matches_nothing():
    """Review regression: zero-word-token queries must not prefix-gather
    the whole content corpus from the root node."""
    idx = TrieIndex(TrieConfig())
    idx.insert_content("some indexed sentence here".split(), 0, 0)
    idx.freeze()
    assert idx.search("??").exact_matches == []
    assert idx.search("...").exact_matches == []
    rows, valid = idx.search_batch_rows(["?!", "--"])
    assert valid.sum() == 0


def test_overlong_query_is_a_miss_not_a_prefix_match():
    """Review regression: >MAX_QUERY_TOKENS queries must not report false
    exact matches on their truncated prefix."""
    idx = TrieIndex(TrieConfig())
    name = " ".join(f"w{i}" for i in range(16))
    idx.insert_case_name(name, 3)
    idx.freeze()
    assert idx.search(name).exact_matches == [(3, 0)]  # exactly 16 ok
    overlong = name + " extra"
    assert idx.search(overlong).exact_matches == []


def test_mmap_format_roundtrip(small_trie, tmp_path):
    p = tmp_path / "trie.npz"
    small_trie.save(p, mmap_format=True)
    assert (tmp_path / "trie.mmap" / "edge_offsets.npy").exists()
    loaded = FrozenTrie.load(p)  # auto-detects the .mmap dir
    # arrays are memory-mapped
    assert isinstance(loaded.edge_offsets, np.memmap)
    ids = loaded.encode_queries([["miranda", "v", "arizona"]], 8)
    _, rows, valid = loaded.search_batch(ids)
    assert sorted(rows[0][valid[0]].tolist()) == [2, 4]
    assert loaded.completions(["brown"]) == small_trie.completions(["brown"])


def test_trieindex_mmap_config(tmp_path):
    cfg = TrieConfig(enable_memory_mapping=True)
    idx = TrieIndex(cfg)
    idx.insert_case_name("Mapp v. Ohio", 0)
    idx.freeze()
    idx.save_to_disk(tmp_path / "t")
    loaded = TrieIndex.load_from_disk(tmp_path / "t", cfg)
    assert loaded.search("mapp v. ohio").exact_matches == [(0, 0)]


def test_npz_save_clears_stale_mmap(small_trie, tmp_path):
    """Review regression: a stale .mmap dir must not shadow a newer npz."""
    p = tmp_path / "t.npz"
    small_trie.save(p, mmap_format=True)
    # build a DIFFERENT trie and save as npz to the same path
    b = TrieBuilder()
    b.insert(["fresh", "case"], 42)
    fresh = b.freeze()
    fresh.save(p, mmap_format=False)
    loaded = FrozenTrie.load(p)
    ids = loaded.encode_queries([["fresh", "case"]], 4)
    _, rows, valid = loaded.search_batch(ids)
    assert rows[0][valid[0]].tolist() == [42]  # new index, not the stale one


def test_completions_frequency_ranked():
    b = TrieBuilder()
    for _ in range(5):
        b.insert(["miranda", "v", "arizona"], 0)
    b.insert(["miranda", "warnings"], 1)
    t = b.freeze()
    comps = t.completions(["miranda"], limit=2)
    assert comps[0] == "miranda v arizona"  # freq 5 beats freq 1
    assert comps[1] == "miranda warnings"


# ---------------------------------------------------------------------------
# frequency-ranked candidate selection (VERDICT r2 item 7)
# ---------------------------------------------------------------------------


def test_postings_frequency_ranked_before_cap():
    """A common phrase surfaces the highest-frequency cases first — NOT an
    arbitrary DFS-order prefix — and the cap keeps the top-weight subset."""
    idx = TrieIndex(TrieConfig())
    phrase = "due process of law".split()
    # case 100 mentions the phrase once; case 200 five times; case 300 three
    # times — inserted in ascending case order so DFS order != freq order
    for case_row, count in ((100, 1), (200, 5), (300, 3)):
        for para in range(count):
            idx.insert_content(phrase, case_row, para)
    idx.freeze()
    rows, valid = idx.search_batch_rows(["due process of law"], max_postings=2)
    content = rows[0][valid[0]]
    # cap of 2 per trie: the two highest-frequency cases lead, in order
    assert content.tolist()[:2] == [200, 200] or content.tolist()[:2] == [
        200, 300,
    ]
    # first-ranked case is the most frequent one, not DFS-first (100)
    assert content.tolist()[0] == 200


def test_ranked_gather_ties_keep_dfs_order():
    """Equal-weight postings keep DFS (insertion) order — determinism."""
    idx = TrieIndex(TrieConfig())
    for case_row in (5, 3, 9):  # one posting each → all weight 1
        idx.insert_content("equal protection clause".split(), case_row, 0)
    idx.freeze()
    rows, valid = idx.search_batch_rows(["equal protection clause"])
    got = rows[0][valid[0]].tolist()
    assert got == [5, 3, 9]  # insertion (DFS postings) order preserved


def test_frozen_post_weights_derivation(small_trie):
    """post_weights: count of same-(node, case) postings, aligned to the
    postings arrays."""
    w = small_trie.post_weights()
    assert w.shape[0] == max(1, small_trie.num_postings)
    assert (w >= 1).all()
