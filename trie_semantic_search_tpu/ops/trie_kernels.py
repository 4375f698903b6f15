"""Batched trie traversal over CSR arrays — the device-side trie.

The reference's trie is a pointer-chasing ``HashMap<String, TrieNode>``
walked one query at a time (``/root/reference/src/trie.rs:223-255``). The
TPU-native form (BASELINE.json north star, SURVEY.md §7 step 5) freezes the
trie into flat int32 arrays:

  * ``edge_offsets[N+1]`` — CSR row pointers: node ``n``'s out-edges live at
    ``[edge_offsets[n], edge_offsets[n+1])``.
  * ``edge_tokens[E]`` — edge labels (token ids), **sorted within each
    node's span** so lookup is a binary search.
  * ``edge_targets[E]`` — destination node ids.

A batch of queries (token-id matrix ``[B, L]``, -1 padded) walks the
automaton **level-synchronously**: one ``lax.scan`` step per query level,
inside which every lane does a fixed-iteration vectorised binary search in
its node's edge span (pure gathers — no pointer chasing, no dynamic
shapes). O(L · log(max_fanout)) gathers for the whole batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: state value for "walk failed" lanes
DEAD = jnp.int32(-1)


def _edge_lookup(
    edge_offsets: jax.Array,  # [N+1] int32
    edge_tokens: jax.Array,  # [E] int32 sorted per span
    edge_targets: jax.Array,  # [E] int32
    state: jax.Array,  # [B] int32 current node (-1 dead)
    tok: jax.Array,  # [B] int32 token id (-2 = unknown)
) -> jax.Array:
    """Per-lane edge lookup: next node id or DEAD."""
    safe_state = jnp.maximum(state, 0)
    lo = jnp.take(edge_offsets, safe_state)
    hi = jnp.take(edge_offsets, safe_state + 1)

    # Vectorised lower-bound binary search of `tok` in edge_tokens[lo:hi).
    def body(_, carry):
        lo_, hi_ = carry
        mid = (lo_ + hi_) >> 1
        mid_tok = jnp.take(edge_tokens, jnp.minimum(mid, edge_tokens.shape[0] - 1))
        go_right = (mid_tok < tok) & (lo_ < hi_)
        new_lo = jnp.where(go_right, mid + 1, lo_)
        new_hi = jnp.where(go_right | (lo_ >= hi_), hi_, mid)
        return new_lo, new_hi

    # Iteration count is static (edge count known at trace time): enough
    # bisection steps to cover the worst-case span = the whole edge array.
    iters = max(1, int(edge_tokens.shape[0]).bit_length())
    lo2, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    in_span = lo2 < hi
    found_tok = jnp.take(
        edge_tokens, jnp.minimum(lo2, edge_tokens.shape[0] - 1)
    )
    hit = in_span & (found_tok == tok) & (state >= 0)
    nxt = jnp.take(edge_targets, jnp.minimum(lo2, edge_targets.shape[0] - 1))
    return jnp.where(hit, nxt, DEAD)


@functools.partial(jax.jit, static_argnames=())
def batched_walk(
    edge_offsets: jax.Array,  # [N+1] int32
    edge_tokens: jax.Array,  # [E] int32
    edge_targets: jax.Array,  # [E] int32
    token_ids: jax.Array,  # [B, L] int32, -1 = padding, -2 = unknown token
) -> jax.Array:
    """Walk every query through the automaton. Returns final node id per
    lane (``[B] int32``), or -1 where the walk failed.

    Padding (-1) tokens are no-ops: the lane keeps its node. Unknown tokens
    (-2) kill the lane (no edge label is negative).
    """
    B, L = token_ids.shape

    def step(state: jax.Array, tok: jax.Array) -> tuple[jax.Array, None]:
        nxt = _edge_lookup(edge_offsets, edge_tokens, edge_targets, state, tok)
        new_state = jnp.where(tok == -1, state, nxt)
        return new_state, None

    init = jnp.zeros((B,), jnp.int32)  # root = 0
    final, _ = jax.lax.scan(step, init, jnp.swapaxes(token_ids, 0, 1))
    return final


@functools.partial(jax.jit, static_argnames=("max_postings",))
def gather_postings(
    post_offsets: jax.Array,  # [N+1] int32
    post_rows: jax.Array,  # [P] int32 case-row ids
    is_end: jax.Array,  # [N] bool
    nodes: jax.Array,  # [B] int32 final node per query (-1 = miss)
    max_postings: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Fixed-width postings gather for matched lanes.

    Returns ``(rows [B, max_postings] int32, valid [B, max_postings] bool)``
    where invalid slots are -1 — mirrors the reference's "exact matches only
    when is_end_of_word" rule (trie.rs:241-245).
    """
    B = nodes.shape[0]
    safe = jnp.maximum(nodes, 0)
    matched = (nodes >= 0) & jnp.take(is_end, safe)
    start = jnp.take(post_offsets, safe)
    end = jnp.take(post_offsets, safe + 1)
    offs = jnp.arange(max_postings, dtype=jnp.int32)[None, :]  # [1, M]
    idx = start[:, None] + offs
    valid = matched[:, None] & (idx < end[:, None])
    rows = jnp.take(post_rows, jnp.minimum(idx, post_rows.shape[0] - 1))
    return jnp.where(valid, rows, -1), valid


@functools.partial(jax.jit, static_argnames=("max_postings",))
def gather_range_postings(
    post_offsets: jax.Array,  # [N+1] int32 (DFS-order postings)
    subtree_end: jax.Array,  # [N] int32: end of node's subtree range
    post_rows: jax.Array,  # [P] int32 case-row ids
    nodes: jax.Array,  # [B] int32 final node per query (-1 = miss)
    max_postings: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Subtree (prefix-match) postings gather.

    With postings in DFS pre-order, every posting whose inserted path starts
    with the query lives in ``[post_offsets[n], subtree_end[n])`` — so
    phrase-anywhere matching over the windowed content trie is one bounded
    range gather, no ``is_end`` requirement.
    """
    safe = jnp.maximum(nodes, 0)
    matched = nodes >= 0
    start = jnp.take(post_offsets, safe)
    end = jnp.take(subtree_end, safe)
    offs = jnp.arange(max_postings, dtype=jnp.int32)[None, :]
    idx = start[:, None] + offs
    valid = matched[:, None] & (idx < end[:, None])
    rows = jnp.take(post_rows, jnp.minimum(idx, post_rows.shape[0] - 1))
    return jnp.where(valid, rows, -1), valid


def _rank_cap(
    rows: jax.Array,  # [B, R2] int32 gathered case rows (-1 invalid)
    weight: jax.Array,  # [B, R2] int32 per-posting weights (-1 invalid)
    max_postings: int,
) -> tuple[jax.Array, jax.Array]:
    """Rank gathered postings by weight desc (ties → lower gather offset,
    i.e. DFS order — deterministic) and cap to ``max_postings``.

    The frequency ranking BEFORE the cap (VERDICT r2 item 7): a common
    phrase's candidate subset is its highest-weight cases, not an arbitrary
    DFS prefix. Real weights are ≥ 1, so invalid slots (weight -1 → sort
    key +1) always sort last.
    """
    offs = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    neg_w, _, ranked_rows = jax.lax.sort(
        (-weight, offs, rows), num_keys=2, dimension=-1
    )
    top_rows = ranked_rows[:, :max_postings]
    top_valid = neg_w[:, :max_postings] <= -1
    return jnp.where(top_valid, top_rows, -1), top_valid


@functools.partial(
    jax.jit, static_argnames=("max_postings", "overcollect")
)
def gather_postings_ranked(
    post_offsets: jax.Array,  # [N+1] int32
    post_rows: jax.Array,  # [P] int32 case-row ids
    post_weight: jax.Array,  # [P] int32 per-posting rank weight
    is_end: jax.Array,  # [N] bool
    nodes: jax.Array,  # [B] int32 final node per query (-1 = miss)
    max_postings: int = 64,
    overcollect: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """:func:`gather_postings` with weight-ranked candidate selection:
    over-collects ``max_postings * overcollect`` postings, ranks them by
    ``post_weight`` (desc, ties to DFS order) and returns the top
    ``max_postings``. Spans deeper than the over-collection window are
    still truncated (at 8x the final cap), ranked within the window."""
    R2 = max_postings * max(1, overcollect)
    safe = jnp.maximum(nodes, 0)
    matched = (nodes >= 0) & jnp.take(is_end, safe)
    start = jnp.take(post_offsets, safe)
    end = jnp.take(post_offsets, safe + 1)
    offs = jnp.arange(R2, dtype=jnp.int32)[None, :]
    idx = start[:, None] + offs
    valid = matched[:, None] & (idx < end[:, None])
    cl = jnp.minimum(idx, post_rows.shape[0] - 1)
    rows = jnp.where(valid, jnp.take(post_rows, cl), -1)
    w = jnp.where(valid, jnp.take(post_weight, cl), -1)
    return _rank_cap(rows, w, max_postings)


@functools.partial(
    jax.jit, static_argnames=("max_postings", "overcollect")
)
def gather_range_postings_ranked(
    post_offsets: jax.Array,  # [N+1] int32 (DFS-order postings)
    subtree_end: jax.Array,  # [N] int32
    post_rows: jax.Array,  # [P] int32
    post_weight: jax.Array,  # [P] int32
    nodes: jax.Array,  # [B] int32 (-1 = miss)
    max_postings: int = 64,
    overcollect: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """:func:`gather_range_postings` with weight-ranked selection (see
    :func:`gather_postings_ranked`)."""
    R2 = max_postings * max(1, overcollect)
    safe = jnp.maximum(nodes, 0)
    matched = nodes >= 0
    start = jnp.take(post_offsets, safe)
    end = jnp.take(subtree_end, safe)
    offs = jnp.arange(R2, dtype=jnp.int32)[None, :]
    idx = start[:, None] + offs
    valid = matched[:, None] & (idx < end[:, None])
    cl = jnp.minimum(idx, post_rows.shape[0] - 1)
    rows = jnp.where(valid, jnp.take(post_rows, cl), -1)
    w = jnp.where(valid, jnp.take(post_weight, cl), -1)
    return _rank_cap(rows, w, max_postings)


def walk_and_gather(
    edge_offsets: jax.Array,
    edge_tokens: jax.Array,
    edge_targets: jax.Array,
    post_offsets: jax.Array,
    post_rows: jax.Array,
    is_end: jax.Array,
    token_ids: jax.Array,
    max_postings: int = 64,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused walk + postings gather: ``(nodes, rows, valid)``."""
    nodes = batched_walk(edge_offsets, edge_tokens, edge_targets, token_ids)
    rows, valid = gather_postings(
        post_offsets, post_rows, is_end, nodes, max_postings
    )
    return nodes, rows, valid
