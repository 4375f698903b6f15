"""Multi-chip search collectives.

SURVEY.md §2.1 / §5: the reference has no distributed backend; the TPU-native
equivalent is shard-local top-k + an ICI ``all_gather`` merge, expressed with
``shard_map`` so XLA schedules the collectives.

Pattern (BASELINE.json north star): each chip holds a corpus shard
``[N/S, D]``; a replicated query batch scores its shard (one MXU matmul);
each chip reduces to local top-k; ``all_gather`` moves only ``S·k`` floats+
ints per query over ICI; a final exact merge yields the global top-k.

Semantics parity with the single-chip fused step (:mod:`..ops.hybrid`):
identical filters (including on lexical hits), identical dedup-by-case, and
pad rows (from :func:`..parallel.mesh.pad_corpus`) masked to ``-inf`` by
row count — they can never surface as phantom hits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.hybrid import SRC_SEMANTIC, quantize_queries
from ..ops.scoring import cosine_scores, cosine_scores_int8
from ..ops.topk import exact_topk, fast_topk, merge_topk
from .mesh import DATA_AXIS


def _dedup_by_case_sorted(
    values: jax.Array, cases: jax.Array
) -> jax.Array:
    """Mask later duplicates of an already-seen case in a score-sorted
    candidate list. ``values/cases: [B, M]`` sorted desc → values with
    duplicate-case entries at ``-inf``. O(M²) boolean, never a [B, N]
    scatter."""
    M = values.shape[1]
    eq = (cases[:, :, None] == cases[:, None, :]) & (cases[:, None, :] >= 0)
    earlier = jnp.tril(jnp.ones((M, M), bool), k=-1)[None]
    dup = jnp.any(eq & earlier, axis=-1)
    return jnp.where(dup, -jnp.inf, values)


def sharded_fused_topk(
    mesh: Mesh,
    query_emb: jax.Array,  # [B, D] replicated f32
    corpus_q: jax.Array,  # [Npad, D] int8, sharded over data
    corpus_scale: jax.Array,  # [Npad, 1] f32, sharded
    chunk_case: jax.Array,  # [Npad] int32, sharded
    chunk_court: jax.Array,  # [Npad] int32, sharded
    chunk_date: jax.Array,  # [Npad] int32, sharded
    court_table: jax.Array,  # [B, V] bool, replicated
    date_lo: jax.Array,  # [B] int32, replicated
    date_hi: jax.Array,  # [B] int32, replicated
    lex_cases: jax.Array,  # [B, R] int32 lexical-hit case rows (-1 pad), replicated
    lex_src: jax.Array,  # [B, R] int32 SRC_* code per lexical hit, replicated
    lex_chunk: jax.Array,  # [B, R] int32 representative chunk row per hit, replicated
    case_court: jax.Array,  # [C] int32 case-level court column, replicated
    case_date: jax.Array,  # [C] int32 case-level date column, replicated
    min_similarity: jax.Array,  # [B] f32, replicated
    exact_weight: jax.Array,  # [B] f32, replicated
    k: int,
    n_valid: Optional[int] = None,
    overfetch: int = 4,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip SURVEY §7 step-7: each chip runs the filtered semantic
    scan over its corpus shard, dedups by case locally, shard-local top-k
    lists merge with one ``all_gather`` over ICI, and the (tiny,
    replicated) lexical boost list — filter-checked against the case-level
    columns, parity with ops/hybrid — merges globally with a final
    dedup-by-case. Returns replicated ``(scores [B,k], chunk_rows [B,k],
    case_rows [B,k], src [B,k])`` (-inf/-1 padded) — k distinct cases per
    query, same output contract as :func:`..ops.hybrid.fused_hybrid_topk`.

    ``n_valid`` is the real (pre-padding) row count; rows at or beyond it
    (``pad_corpus`` pads) are masked to ``-inf`` and can never surface.

    Shard-local dedup-before-merge is exact for "top-k distinct cases":
    a case's best-scoring chunk lives on some shard, and on that shard at
    most k-1 distinct cases can outrank it if the case belongs in the
    global top-k.
    """
    S = mesh.shape[DATA_AXIS]
    shard_rows = corpus_q.shape[0] // S
    n_real = corpus_q.shape[0] if n_valid is None else int(n_valid)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS),
            P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(), P(), P(),
            P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def _search(q, shard_q, shard_s, sh_case, sh_court, sh_date,
                ctable, dlo, dhi, lex, lsrc, lchunk, c_court, c_date,
                msim, ew):
        # shard-local filtered scan
        q8, q_scale = quantize_queries(q)
        acc = jnp.einsum("bd,nd->bn", q8, shard_q,
                         preferred_element_type=jnp.int32)
        scores = acc.astype(jnp.float32) * q_scale * shard_s.reshape(1, -1)
        my = jax.lax.axis_index(DATA_AXIS)
        # pad-row mask: global row id >= real corpus size → -inf
        global_rows = my * shard_rows + jnp.arange(shard_rows, dtype=jnp.int32)
        row_ok = (global_rows < n_real)[None, :]
        court_ok = jnp.take(ctable, sh_court, axis=1)
        date_ok = (sh_date[None, :] >= dlo[:, None]) & (
            sh_date[None, :] <= dhi[:, None]
        )
        keep = row_ok & court_ok & date_ok & (scores >= msim[:, None])
        scores = jnp.where(keep, scores, -jnp.inf)

        # over-fetch, then shard-local dedup by case → k distinct cases
        kf = min(max(k * max(1, overfetch), k), shard_rows)
        if recall_target >= 1.0:
            v, i = exact_topk(scores, kf)
        else:
            v, i = fast_topk(scores, kf, recall_target)
        dead = jnp.isneginf(v)
        cases = jnp.where(dead, -1, jnp.take(sh_case, i))
        rows = jnp.where(dead, -1, i.astype(jnp.int32) + my * shard_rows)
        v = _dedup_by_case_sorted(v, cases)
        v, pos = exact_topk(v, min(k, kf))
        cases = jnp.take_along_axis(cases, pos, axis=1)
        rows = jnp.take_along_axis(rows, pos, axis=1)
        dead = jnp.isneginf(v)
        cases = jnp.where(dead, -1, cases)
        rows = jnp.where(dead, -1, rows)

        # ICI merge of shard-local top-k (O(S·k), never the corpus)
        B = v.shape[0]
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_c = jax.lax.all_gather(cases, DATA_AXIS)
        all_r = jax.lax.all_gather(rows, DATA_AXIS)
        mv = jnp.moveaxis(all_v, 0, 1).reshape(B, -1)  # [B, S*k]
        mc = jnp.moveaxis(all_c, 0, 1).reshape(B, -1)
        mr = jnp.moveaxis(all_r, 0, 1).reshape(B, -1)

        # lexical boost: filter-checked against the case-level columns
        # (round-1 VERDICT item 3 — parity with ops/hybrid.lexical_side_list)
        safe_lex = jnp.maximum(lex, 0)
        lex_court_ok = jnp.take_along_axis(
            ctable, jnp.take(c_court, safe_lex), axis=1
        )
        lex_dates = jnp.take(c_date, safe_lex)
        lex_date_ok = (lex_dates >= dlo[:, None]) & (lex_dates <= dhi[:, None])
        lex_ok = (lex >= 0) & lex_court_ok & lex_date_ok
        lex_v = jnp.where(lex_ok, ew[:, None], -jnp.inf)

        merged_v = jnp.concatenate([mv, lex_v], axis=1)  # [B, S*k+R]
        merged_c = jnp.concatenate([mc, lex], axis=1)
        merged_r = jnp.concatenate([mr, lchunk], axis=1)
        merged_src = jnp.concatenate(
            [jnp.full_like(mc, SRC_SEMANTIC), lsrc], axis=1
        )
        # full sort + global dedup by case + final top-k
        M = merged_v.shape[1]
        v_all, pos = exact_topk(merged_v, M)
        c_all = jnp.take_along_axis(merged_c, pos, axis=1)
        r_all = jnp.take_along_axis(merged_r, pos, axis=1)
        s_all = jnp.take_along_axis(merged_src, pos, axis=1)
        c_all = jnp.where(jnp.isfinite(v_all), c_all, -1)
        v_all = _dedup_by_case_sorted(v_all, c_all)
        fv, fpos = exact_topk(v_all, min(k, M))
        fc = jnp.take_along_axis(c_all, fpos, axis=1)
        fr = jnp.take_along_axis(r_all, fpos, axis=1)
        fs = jnp.take_along_axis(s_all, fpos, axis=1)
        dead = jnp.isneginf(fv)
        return (
            fv,
            jnp.where(dead, -1, fr),
            jnp.where(dead, -1, fc),
            jnp.where(dead, SRC_SEMANTIC, fs),
        )

    return _search(
        query_emb, corpus_q, corpus_scale, chunk_case, chunk_court,
        chunk_date, court_table, date_lo, date_hi, lex_cases, lex_src,
        lex_chunk, case_court, case_date, min_similarity, exact_weight,
    )


def sharded_brute_topk(
    mesh: Mesh,
    queries: jax.Array,  # [B, D] replicated
    corpus: jax.Array,  # [N, D] sharded over data axis (N divisible by S)
    k: int,
    n_valid: Optional[int] = None,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus. Returns replicated
    ``(values [B,k], global_indices [B,k])``. Rows at or beyond
    ``n_valid`` (padding) score ``-inf``."""

    shard_rows = corpus.shape[0] // mesh.shape[DATA_AXIS]
    n_real = corpus.shape[0] if n_valid is None else int(n_valid)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(q: jax.Array, shard: jax.Array) -> tuple[jax.Array, jax.Array]:
        scores = cosine_scores(q, shard)  # [B, n_local]
        my = jax.lax.axis_index(DATA_AXIS)
        global_rows = my * shard_rows + jnp.arange(shard_rows, dtype=jnp.int32)
        scores = jnp.where((global_rows < n_real)[None, :], scores, -jnp.inf)
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        gi = i.astype(jnp.int32) + my * shard_rows
        gi = jnp.where(jnp.isneginf(v), -1, gi)
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
    n_valid: Optional[int] = None,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Same as :func:`sharded_brute_topk` over an int8-quantised corpus."""

    shard_rows = corpus_q.shape[0] // mesh.shape[DATA_AXIS]
    n_real = corpus_q.shape[0] if n_valid is None else int(n_valid)

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
        my = jax.lax.axis_index(DATA_AXIS)
        global_rows = my * shard_rows + jnp.arange(shard_rows, dtype=jnp.int32)
        scores = jnp.where((global_rows < n_real)[None, :], scores, -jnp.inf)
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        gi = i.astype(jnp.int32) + my * shard_rows
        gi = jnp.where(jnp.isneginf(v), -1, gi)
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_i = jax.lax.all_gather(gi, DATA_AXIS)
        return merge_topk(jnp.moveaxis(all_v, 0, 1), jnp.moveaxis(all_i, 0, 1), k)

    return _search(queries, corpus_q, corpus_scale)
