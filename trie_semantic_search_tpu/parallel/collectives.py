"""Multi-chip search collectives.

SURVEY.md §2.1 / §5: the reference has no distributed backend; the TPU-native
equivalent is shard-local top-k + an ICI ``all_gather`` merge, expressed with
``shard_map`` so XLA schedules the collectives.

Pattern (BASELINE.json north star): each chip holds a corpus shard
``[N/S, D]``; a replicated query batch scores its shard (one MXU matmul);
each chip reduces to local top-k; ``all_gather`` moves only ``S·k`` floats+
ints per query over ICI; a final exact merge yields the global top-k.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.scoring import cosine_scores, cosine_scores_int8
from ..ops.topk import exact_topk, fast_topk, merge_topk
from .mesh import DATA_AXIS


def sharded_fused_topk(
    mesh: Mesh,
    query_emb: jax.Array,  # [B, D] replicated f32
    corpus_q: jax.Array,  # [N, D] int8, sharded over data
    corpus_scale: jax.Array,  # [N, 1] f32, sharded
    chunk_case: jax.Array,  # [N] int32, sharded
    chunk_court: jax.Array,  # [N] int32, sharded
    chunk_date: jax.Array,  # [N] int32, sharded
    court_table: jax.Array,  # [B, V] bool, replicated
    date_lo: jax.Array,  # [B] int32, replicated
    date_hi: jax.Array,  # [B] int32, replicated
    lex_cases: jax.Array,  # [B, R] int32 lexical-hit case rows (-1 pad), replicated
    min_similarity: jax.Array,  # [B] f32, replicated
    exact_weight: jax.Array,  # [B] f32, replicated
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Multi-chip SURVEY §7 step-7: each chip runs the filtered semantic
    scan over its corpus shard, shard-local top-k lists merge with one
    ``all_gather`` over ICI, and the (tiny, replicated) lexical boost list
    merges globally at the end. Returns replicated
    ``(scores [B,k], case_rows [B,k])`` (-inf/-1 padded)."""
    shard_rows = corpus_q.shape[0] // mesh.shape[DATA_AXIS]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS),
            P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(q, shard_q, shard_s, sh_case, sh_court, sh_date,
                ctable, dlo, dhi, lex, msim, ew):
        # shard-local filtered scan
        q_abs = jnp.max(jnp.abs(q), axis=1, keepdims=True)
        q_scale = jnp.maximum(q_abs, 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("bd,nd->bn", q8, shard_q,
                         preferred_element_type=jnp.int32)
        scores = acc.astype(jnp.float32) * q_scale * shard_s.reshape(1, -1)
        court_ok = jnp.take(ctable, sh_court, axis=1)
        date_ok = (sh_date[None, :] >= dlo[:, None]) & (
            sh_date[None, :] <= dhi[:, None]
        )
        keep = court_ok & date_ok & (scores >= msim[:, None])
        scores = jnp.where(keep, scores, -jnp.inf)
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        # local chunk idx → local case row (gather before leaving the shard)
        cases = jnp.take(sh_case, i)
        cases = jnp.where(jnp.isneginf(v), -1, cases)
        # ICI merge of shard-local top-k (O(S·k), never the corpus)
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_c = jax.lax.all_gather(cases, DATA_AXIS)
        mv, mc = merge_topk(
            jnp.moveaxis(all_v, 0, 1), jnp.moveaxis(all_c, 0, 1), k
        )
        # global lexical boost merge (replicated side list; filter-checked
        # host-side by the caller via the case-level columns)
        lex_v = jnp.where(lex >= 0, ew[:, None], -jnp.inf)
        merged_v = jnp.concatenate([mv, lex_v], axis=1)  # [B, k+R]
        merged_c = jnp.concatenate([mc, lex], axis=1)
        fv, pos = exact_topk(merged_v, k)
        fc = jnp.take_along_axis(merged_c, pos, axis=1)
        fc = jnp.where(jnp.isneginf(fv), -1, fc)
        return fv, fc

    return _search(
        query_emb, corpus_q, corpus_scale, chunk_case, chunk_court,
        chunk_date, court_table, date_lo, date_hi, lex_cases,
        min_similarity, exact_weight,
    )


def sharded_brute_topk(
    mesh: Mesh,
    queries: jax.Array,  # [B, D] replicated
    corpus: jax.Array,  # [N, D] sharded over data axis (N divisible by S)
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus. Returns replicated
    ``(values [B,k], global_indices [B,k])``."""

    shard_rows = corpus.shape[0] // mesh.shape[DATA_AXIS]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(q: jax.Array, shard: jax.Array) -> tuple[jax.Array, jax.Array]:
        scores = cosine_scores(q, shard)  # [B, n_local]
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        my = jax.lax.axis_index(DATA_AXIS)
        gi = i.astype(jnp.int32) + my * shard_rows
        # [S, B, k] on every chip after gather over ICI
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_i = jax.lax.all_gather(gi, DATA_AXIS)
        # merge: [B, S, k] → [B, k]
        mv, mi = merge_topk(
            jnp.moveaxis(all_v, 0, 1), jnp.moveaxis(all_i, 0, 1), k
        )
        return mv, mi

    return _search(queries, corpus)


def sharded_int8_topk(
    mesh: Mesh,
    queries: jax.Array,  # [B, D] replicated f32
    corpus_q: jax.Array,  # [N, D] int8, sharded
    corpus_scale: jax.Array,  # [N, 1] f32, sharded
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Same as :func:`sharded_brute_topk` over an int8-quantised corpus."""

    shard_rows = corpus_q.shape[0] // mesh.shape[DATA_AXIS]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(
        q: jax.Array, shard_q: jax.Array, shard_s: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        scores = cosine_scores_int8(q, shard_q, shard_s)
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        my = jax.lax.axis_index(DATA_AXIS)
        gi = i.astype(jnp.int32) + my * shard_rows
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_i = jax.lax.all_gather(gi, DATA_AXIS)
        return merge_topk(jnp.moveaxis(all_v, 0, 1), jnp.moveaxis(all_i, 0, 1), k)

    return _search(queries, corpus_q, corpus_scale)
