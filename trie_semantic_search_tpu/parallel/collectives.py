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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.hybrid import (
    SRC_SEMANTIC,
    layout_brute_semantic_topk,
    partitioned_semantic_topk,
    quantize_queries,
)
from ..ops.scoring import cosine_scores, cosine_scores_int8
from ..ops.topk import exact_topk, fast_topk, merge_topk
from .mesh import DATA_AXIS


def resolve_scan_kernel(
    recall_target: float, shard_rows: int
) -> tuple[str, bool]:
    """Host-side resolution of the per-shard brute-scan program for
    :func:`sharded_fused_topk` — returns ``(scan_mode, scan_interpret)``.
    ``"pallas"`` runs the SAME fused filtered-scan kernel as single-chip
    serving on every shard (VERDICT r2 item 1 — the sharded path was
    plain-XLA at 1.7k QPS vs the 11.6k QPS kernel); ``"xla"`` is the
    materialised-score fallback (exact mode / non-tile-divisible shards).
    ``TSS_SCAN_INTERPRET=1`` forces the kernel in Pallas interpret mode on
    any backend so the CPU test mesh exercises the kernel glue."""
    from ..ops.pallas_scan import TILE_N

    interp = os.environ.get("TSS_SCAN_INTERPRET") == "1"
    use = (
        recall_target < 1.0
        and shard_rows % TILE_N == 0
        and (jax.default_backend() == "tpu" or interp)
    )
    return ("pallas" if use else "xla"), interp


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


def _local_dedup_topk(
    v: jax.Array,  # [B, kf] shard-local candidate scores, sorted desc
    local_rows: jax.Array,  # [B, kf] shard-local row ids (valid where finite)
    sh_case: jax.Array,  # [n_local] shard-local chunk→case column
    shard_rows: int,
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Shard-local dedup-by-case → top-k distinct cases with GLOBAL row
    ids. Returns ``(values, cases, global_rows)`` each ``[B, k]``.

    Exact for "top-k distinct cases": a case's best-scoring chunk lives on
    some shard, and on that shard at most k-1 distinct cases can outrank
    it if the case belongs in the global top-k."""
    my = jax.lax.axis_index(DATA_AXIS)
    dead = jnp.isneginf(v)
    safe = jnp.clip(local_rows, 0, sh_case.shape[0] - 1)
    cases = jnp.where(dead, -1, jnp.take(sh_case, safe))
    rows = jnp.where(
        dead, -1, local_rows.astype(jnp.int32) + my * shard_rows
    )
    v = _dedup_by_case_sorted(v, cases)
    kk = min(k, v.shape[1])
    v, pos = exact_topk(v, kk)
    cases = jnp.take_along_axis(cases, pos, axis=1)
    rows = jnp.take_along_axis(rows, pos, axis=1)
    dead = jnp.isneginf(v)
    return v, jnp.where(dead, -1, cases), jnp.where(dead, -1, rows)


def _gather_merge_lexical(
    v: jax.Array,  # [B, k] shard-local top-k (distinct cases)
    cases: jax.Array,  # [B, k] case rows (-1 dead)
    rows: jax.Array,  # [B, k] global chunk rows (-1 dead)
    lex: jax.Array,  # [B, R] lexical-hit case rows (-1 pad), replicated
    lsrc: jax.Array,  # [B, R] SRC_* codes
    lchunk: jax.Array,  # [B, R] representative chunk row per hit
    c_court: jax.Array,  # [C] case-level court column
    c_date: jax.Array,  # [C] case-level date column
    ctable: jax.Array,  # [B, V] allowed-court table
    dlo: jax.Array,  # [B]
    dhi: jax.Array,  # [B]
    ew: jax.Array,  # [B] exact weight
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """ICI merge of shard-local top-k lists (O(S·k) — never the corpus) +
    the (tiny, replicated) filter-checked lexical boost list, global
    dedup-by-case, final top-k. The shared tail of every sharded serving
    program; semantics parity with ops/hybrid's merge_dedup_topk."""
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "n_valid", "overfetch", "recall_target", "scan_mode",
        "scan_interpret", "use_court", "use_date",
    ),
)
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
    scan_mode: str = "xla",  # "xla" | "pallas" (resolve_scan_kernel)
    scan_interpret: bool = False,
    use_court: bool = True,
    use_date: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip SURVEY §7 step-7: each chip runs the filtered semantic
    scan over its corpus shard, dedups by case locally, shard-local top-k
    lists merge with one ``all_gather`` over ICI, and the (tiny,
    replicated) lexical boost list — filter-checked against the case-level
    columns, parity with ops/hybrid — merges globally with a final
    dedup-by-case. Returns replicated ``(scores [B,k], chunk_rows [B,k],
    case_rows [B,k], src [B,k])`` (-inf/-1 padded) — k distinct cases per
    query, same output contract as :func:`..ops.hybrid.fused_hybrid_topk`.

    ``scan_mode="pallas"`` (VERDICT r2 item 1) runs the SAME fused
    filtered-scan kernel as single-chip serving on each shard — the [B,
    n_local] score matrix never touches HBM; the XLA mode materialises it
    (exact-mode / fallback). Resolve with :func:`resolve_scan_kernel`.

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
    kf = min(max(k * max(1, overfetch), k), shard_rows)

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
        my = jax.lax.axis_index(DATA_AXIS)
        q8, q_scale = quantize_queries(q)
        if scan_mode == "pallas":
            # the single-chip serving kernel, per shard: scan + filters +
            # threshold fused, [B, n_local] scores never materialised
            from ..ops.pallas_scan import pallas_fused_topk

            v, i = pallas_fused_topk(
                q8, q_scale, shard_q, shard_s.reshape(-1, 1), sh_court,
                sh_date, ctable, dlo, dhi, msim, k=kf,
                use_court=use_court, use_date=use_date,
                interpret=scan_interpret,
            )
            # pad-row mask: the kernel can't know the real row count;
            # global row id >= n_real → dead (pad rows score exactly 0
            # via zero scales, this is the belt to the suspenders)
            glob = i + my * shard_rows
            v = jnp.where((i >= 0) & (glob < n_real), v, -jnp.inf)
            local_rows = jnp.maximum(i, 0)
        else:
            acc = jnp.einsum("bd,nd->bn", q8, shard_q,
                             preferred_element_type=jnp.int32)
            scores = (
                acc.astype(jnp.float32) * q_scale * shard_s.reshape(1, -1)
            )
            global_rows = my * shard_rows + jnp.arange(
                shard_rows, dtype=jnp.int32
            )
            keep = (global_rows < n_real)[None, :] & (
                scores >= msim[:, None]
            )
            if use_court:
                keep = keep & jnp.take(ctable, sh_court, axis=1)
            if use_date:
                keep = keep & (
                    (sh_date[None, :] >= dlo[:, None])
                    & (sh_date[None, :] <= dhi[:, None])
                )
            scores = jnp.where(keep, scores, -jnp.inf)
            if recall_target >= 1.0:
                v, local_rows = exact_topk(scores, kf)
            else:
                v, local_rows = fast_topk(scores, kf, recall_target)

        v, cases, rows = _local_dedup_topk(
            v, local_rows, sh_case, shard_rows, k
        )
        return _gather_merge_lexical(
            v, cases, rows, lex, lsrc, lchunk, c_court, c_date, ctable,
            dlo, dhi, ew, k,
        )

    return _search(
        query_emb, corpus_q, corpus_scale, chunk_case, chunk_court,
        chunk_date, court_table, date_lo, date_hi, lex_cases, lex_src,
        lex_chunk, case_court, case_date, min_similarity, exact_weight,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "nprobe", "overfetch", "rescore_factor",
        "use_probe_kernel", "probe_interpret",
    ),
)
def sharded_partitioned_topk(
    mesh: Mesh,
    query_emb: jax.Array,  # [B, D] replicated f32 (L2-normalised)
    centroids: jax.Array,  # [P, D] f32, replicated (global k-means)
    part_rows: jax.Array,  # [S, P, m] int32 SHARD-LOCAL row per slot (-1 pad)
    part_int8: jax.Array,  # [S, P, m, D] int8, sharded over axis 0
    part_scale: jax.Array,  # [S, P, m] f32, sharded
    part_cword: jax.Array,  # [S, P, m] int32 court word per slot, sharded
    part_cbit: jax.Array,  # [S, P, m] uint32 court bit per slot, sharded
    part_date: jax.Array,  # [S, P, m] int32 date per slot, sharded
    corpus_bf16: jax.Array,  # [Npad, D] bf16 rescore copy, row-sharded
    chunk_case: jax.Array,  # [Npad] int32, row-sharded
    court_table: jax.Array,  # [B, V] bool, replicated
    date_lo: jax.Array,  # [B] int32, replicated
    date_hi: jax.Array,  # [B] int32, replicated
    lex_cases: jax.Array,  # [B, R] int32, replicated
    lex_src: jax.Array,  # [B, R] int32, replicated
    lex_chunk: jax.Array,  # [B, R] int32, replicated
    case_court: jax.Array,  # [C] int32, replicated
    case_date: jax.Array,  # [C] int32, replicated
    min_similarity: jax.Array,  # [B] f32, replicated
    exact_weight: jax.Array,  # [B] f32, replicated
    k: int,
    nprobe: int,
    overfetch: int = 4,
    rescore_factor: int = 4,
    use_probe_kernel: bool = False,
    probe_interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sharded partitioned-ANN serving step (VERDICT r2 item 1): the
    corpus is partitioned PER SHARD against shared global centroids; each
    chip probes the same ``nprobe`` centroids and scans its own shard's
    probed blocks with the SAME scalar-prefetch probe kernel (or XLA scan)
    as single-chip serving, rescores locally in bf16, dedups by case, and
    shard-local top-k lists merge over ICI with the replicated lexical
    boost list — work per chip is ``nprobe·m_local·D`` with
    ``m_local ≈ m_global/S``, so per-query latency FALLS with S while the
    probed coverage (same partitions, all shards) can only improve recall
    vs single-chip probing.

    Partition arrays come from
    :func:`..index.sharded.build_sharded_partitions`; ``part_rows`` hold
    shard-LOCAL row ids (the body offsets by ``shard * shard_rows``).
    Output contract identical to :func:`sharded_fused_topk`.
    """
    S = mesh.shape[DATA_AXIS]
    shard_rows = corpus_bf16.shape[0] // S
    m = part_rows.shape[2]
    np_eff = min(nprobe, centroids.shape[0])
    ksem = min(max(k * max(1, overfetch), k), np_eff * m)
    W = min(ksem * max(1, rescore_factor), np_eff * m)
    # the [B, nprobe] probed-id scalar prefetch lives in SMEM (1 MB on
    # v5e); oversized (batch × breadth) shapes demote to the XLA gather
    # scan instead of failing to compile — same host-side guard as
    # PartitionedANN._make_search_fn and fused_partitioned_topk (a big
    # tuned nprobe, e.g. the 488 measured in round 3, times a bucketed
    # batch overflows otherwise). B is static here, so the demotion is
    # part of the trace cache key.
    if use_probe_kernel and int(query_emb.shape[0]) * np_eff * 4 > 768 * 1024:
        use_probe_kernel = False

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # q
            P(),  # centroids (replicated)
            P(DATA_AXIS, None, None),  # part_rows
            P(DATA_AXIS, None, None, None),  # part_int8
            P(DATA_AXIS, None, None),  # part_scale
            P(DATA_AXIS, None, None),  # part_cword
            P(DATA_AXIS, None, None),  # part_cbit
            P(DATA_AXIS, None, None),  # part_date
            P(DATA_AXIS, None),  # corpus_bf16
            P(DATA_AXIS),  # chunk_case
            P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def _search(q, cent, prows, pint8, pscale, pcw, pcb, pdt, sh_bf16,
                sh_case, ctable, dlo, dhi, lex, lsrc, lchunk, c_court,
                c_date, msim, ew):
        qn = q.astype(jnp.float32)
        # the SAME candidate stage as the single-chip fused program, on
        # this shard's partition blocks (rows are shard-local; filters
        # come from the precomputed partition-major slot columns)
        sem_v, local_rows = partitioned_semantic_topk(
            qn, cent, prows[0], pint8[0], pscale[0], sh_bf16,
            None, None, ctable, dlo, dhi, msim,
            ksem=ksem, W=W, np_eff=np_eff,
            use_probe_kernel=use_probe_kernel,
            probe_interpret=probe_interpret,
            part_cword=pcw[0], part_cbit=pcb[0], part_date=pdt[0],
        )
        v, cases, rows = _local_dedup_topk(
            sem_v, local_rows, sh_case, shard_rows, k
        )
        return _gather_merge_lexical(
            v, cases, rows, lex, lsrc, lchunk, c_court, c_date, ctable,
            dlo, dhi, ew, k,
        )

    return _search(
        query_emb, centroids, part_rows, part_int8, part_scale,
        part_cword, part_cbit, part_date, corpus_bf16, chunk_case,
        court_table, date_lo, date_hi, lex_cases, lex_src, lex_chunk,
        case_court, case_date, min_similarity, exact_weight,
    )


def sharded_layout_brute_topk(
    mesh: Mesh,
    query_emb: jax.Array,  # [B, D] replicated f32 (L2-normalised)
    part_rows: jax.Array,  # [S, P, m] int32 SHARD-LOCAL row per slot (-1 pad)
    part_int8: jax.Array,  # [S, P, m, D] int8, sharded over axis 0
    part_scale: jax.Array,  # [S, P, m] f32, sharded
    slot_court: jax.Array,  # [S, P, m] int32 court id per slot (-1 pad), sharded
    slot_date: jax.Array,  # [S, P, m] int32 date per slot (min pad), sharded
    corpus_bf16: jax.Array,  # [Npad, D] bf16 rescore copy, row-sharded
    chunk_case: jax.Array,  # [Npad] int32, row-sharded
    court_table: jax.Array,  # [B, V] bool, replicated
    date_lo: jax.Array,  # [B] int32, replicated
    date_hi: jax.Array,  # [B] int32, replicated
    lex_cases: jax.Array,  # [B, R] int32, replicated
    lex_src: jax.Array,  # [B, R] int32, replicated
    lex_chunk: jax.Array,  # [B, R] int32, replicated
    case_court: jax.Array,  # [C] int32, replicated
    case_date: jax.Array,  # [C] int32, replicated
    min_similarity: jax.Array,  # [B] f32, replicated
    exact_weight: jax.Array,  # [B] f32, replicated
    k: int,
    overfetch: int = 4,
    recall_target: float = 1.0,
    use_court: bool = True,
    use_date: bool = True,
    use_gather_kernel: bool = False,
    gather_interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sharded large-batch serving mode: each chip streams its OWN shard's
    partition layout once per ≤TILE_B-query tile (the same
    :func:`..ops.hybrid.layout_brute_semantic_topk` stage as single-chip
    serving), rescores locally in bf16, dedups by case, and shard-local
    top-k lists merge over ICI with the replicated lexical boost — the
    multi-chip twin of the engine's batch-aware mode pick (probe-path HBM
    traffic is ``B·nprobe·m_local`` per chip vs one ``P·m_local`` stream;
    the same ``B·nprobe >= P·ceil(B/TILE_B)`` break-even applies per chip
    because both sides divide by S). Output contract identical to
    :func:`sharded_partitioned_topk`."""
    S = mesh.shape[DATA_AXIS]
    shard_rows = corpus_bf16.shape[0] // S
    m = part_rows.shape[2]
    ksem = min(max(k * max(1, overfetch), k),
               int(part_rows.shape[1]) * int(m))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # q
            P(DATA_AXIS, None, None),  # part_rows
            P(DATA_AXIS, None, None, None),  # part_int8
            P(DATA_AXIS, None, None),  # part_scale
            P(DATA_AXIS, None, None),  # slot_court
            P(DATA_AXIS, None, None),  # slot_date
            P(DATA_AXIS, None),  # corpus_bf16
            P(DATA_AXIS),  # chunk_case
            P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def _search(q, prows, pint8, pscale, scourt, sdate, sh_bf16,
                sh_case, ctable, dlo, dhi, lex, lsrc, lchunk, c_court,
                c_date, msim, ew):
        qn = q.astype(jnp.float32)
        sem_v, local_rows = layout_brute_semantic_topk(
            qn, prows[0], pint8[0], pscale[0], sh_bf16,
            scourt[0], sdate[0], ctable, dlo, dhi, msim,
            ksem=ksem, recall_target=recall_target,
            use_court=use_court, use_date=use_date,
            use_gather_kernel=use_gather_kernel,
            gather_interpret=gather_interpret,
        )
        v, cases, rows = _local_dedup_topk(
            sem_v, local_rows, sh_case, shard_rows, k
        )
        return _gather_merge_lexical(
            v, cases, rows, lex, lsrc, lchunk, c_court, c_date, ctable,
            dlo, dhi, ew, k,
        )

    return _search(
        query_emb, part_rows, part_int8, part_scale, slot_court,
        slot_date, corpus_bf16, chunk_case, court_table, date_lo,
        date_hi, lex_cases, lex_src, lex_chunk, case_court, case_date,
        min_similarity, exact_weight,
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
