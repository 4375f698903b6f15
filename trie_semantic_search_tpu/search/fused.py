"""Fully-fused device hybrid search path.

Binds the frozen artifacts (chunk embeddings, metadata columns, chunk→case
map, trie hit rows) to the single-program hybrid steps in
:mod:`..ops.hybrid` — semantic scan + device metadata filters + lexical
boost + dedup-by-case + top-k in ONE jit program per query batch
(SURVEY.md §7 step 7). Two device modes:

  * ``brute`` — int8 scan over the full corpus; exact, best at small N or
    huge batches (one MXU matmul).
  * ``partitioned`` — centroid probe + scan of the probed partitions +
    bf16 rescore (the PartitionedANN layout, fused with the filters);
    work per query is independent of N, so >10k QPS/chip holds at
    CAP-scale corpora (round-1 VERDICT item 2).

When constructed with a multi-chip ``mesh`` (data axis > 1), the step runs
as :func:`..parallel.collectives.sharded_fused_topk` instead: the corpus
and chunk columns shard row-wise over ``data``, each chip scans its shard,
and shard-local top-k lists merge over ICI — identical semantics
(filters on lexical hits included) and the same output contract.

Results carry source provenance (semantic / case-name / citation /
content) so the engine reconstructs the reference's MatchType surface
identically to the staged path (ref search.rs:70-82).
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..index.ann import PartitionedANN
from ..index.trie import TrieIndex
from ..index.vector import VectorIndex
from ..ops.hybrid import (
    SRC_CASE_NAME,
    SRC_CITATION,
    SRC_CONTENT,
    fused_hybrid_topk,
    fused_hybrid_topk_chunked,
    fused_layout_brute_topk,
    fused_partitioned_topk,
    pick_num_chunks,
)
from ..ops.scoring import quantize_int8
from ..storage.columns import MetadataColumns
from ..utils import BATCH_BUCKETS as _BATCH_BUCKETS
from ..utils import batch_bucket as _batch_bucket

#: Corpus size above which the partitioned scan beats the brute scan
#: (below it, one full-corpus matmul is cheaper than probe+gather).
PARTITIONED_MIN_VECTORS = 50_000

#: Fixed batch size for flat-boundary escalation re-dispatches. Flagged
#: queries re-run through the exact layout stream in groups of this size
#: (padded with inert rows), so escalation adds exactly TWO extra jit
#: programs (filtered/unfiltered) per serving k — warmup can pre-compile
#: both — instead of one per batch bucket. The stream reads the corpus
#: once per ≤TILE_B(=256) query tile, so any group ≤ 256 costs one pass.
ESCALATE_BUCKET = 8

class FusedHybridSearch:
    """Device-resident state for the fused hybrid query step."""

    def __init__(
        self,
        trie_index: TrieIndex,
        vector_index: VectorIndex,
        columns: MetadataColumns,
        ann_mode: str = "auto",  # "auto" | "brute" | "partitioned"
        mesh=None,  # jax.sharding.Mesh; data axis > 1 → sharded serving
        flat_escalate_eps: float = 0.0,  # 0 disables flat-boundary escalation
    ):
        if vector_index.vectors is None or not len(vector_index.vectors):
            raise ValueError("vector index has no frozen vectors")
        self.trie_index = trie_index
        self.vector_index = vector_index
        self.columns = columns
        self.mesh = None
        #: flat-boundary escalation (tie-audit take 2, docs/ROUND5.md): on
        #: duplicate-heavy corpora the probe path can return a top-k whose
        #: score boundary is FLAT — the measured signature of the audited
        #: recall losses (generic queries whose oracle top-k is a wide
        #: exact-score tie scattered across partitions the centroid ranking
        #: never probes). When the served spread ``top1 - topk`` is within
        #: ``eps·|top1| + 1e-6`` the query re-runs through the exact layout
        #: stream, which reads every partition and cannot miss tie members.
        self.flat_escalate_eps = float(flat_escalate_eps)
        #: total queries escalated (observability; engine /stats)
        self.escalated = 0

        self.num_vectors = len(vector_index.vectors)

        def _norm_corpus() -> np.ndarray:
            # materialise + L2-normalise only where a path needs the raw
            # corpus (brute / sharded); the partitioned mode serves from
            # the ANN's frozen device blocks and must NOT pay an O(corpus)
            # host copy at init (7.7 GB f32 at 5M chunks)
            v = np.asarray(vector_index.vectors, np.float32)
            return v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )

        refs = np.asarray(vector_index.refs, np.int32)  # [N, 2]
        chunk_case = refs[:, 0]
        self.chunk_para = refs[:, 1]  # host-side: snippet anchoring

        # representative chunk per case: FIRST chunk in ref order (the
        # boost only needs one slot per case — dedup keeps the max anyway)
        C = len(columns)
        rep = np.full(C, -1, np.int32)
        # reversed unique: last write per case wins → first chunk
        rev = chunk_case[::-1]
        rep[rev] = np.arange(len(chunk_case) - 1, -1, -1, dtype=np.int32)
        self._rep_np = rep
        self.trie_chunk_of_case = jnp.asarray(rep)
        self.num_courts = max(len(columns.court_vocab), 1)

        from ..parallel.mesh import DATA_AXIS

        if mesh is not None and int(mesh.shape.get(DATA_AXIS, 1)) > 1:
            self._init_sharded(mesh, _norm_corpus(), chunk_case, ann_mode)
            return

        ann = vector_index.ann
        if ann_mode == "auto":
            ann_mode = (
                "partitioned"
                if isinstance(ann, PartitionedANN)
                and ann.num_vectors >= PARTITIONED_MIN_VECTORS
                else "brute"
            )
        if ann_mode == "partitioned" and not isinstance(ann, PartitionedANN):
            raise ValueError(
                f"partitioned fused mode needs a PartitionedANN, got {type(ann)}"
            )
        self.ann_mode = ann_mode
        if ann_mode == "partitioned":
            ann._require_built()
            self.ann = ann
            self.corpus_q = self.corpus_scale = None
            # partition-major filter columns for the scalar-prefetch probe
            # kernel (one-time layout; see ops/pallas_scan)
            from ..ops.pallas_scan import partition_filter_columns

            rows_np = np.asarray(ann.part_rows)
            self._part_cols = partition_filter_columns(
                rows_np,
                columns.court_ids[chunk_case],
                columns.dates[chunk_case],
            )
            # raw slot-level court ids for the large-batch layout-brute
            # program (the probe kernel's word/bit encoding can't feed the
            # slab scan's court_table lookup; pad slots get -1 → never pass,
            # and the row<0 mask kills them regardless)
            safe_slot = np.maximum(rows_np, 0)
            self._slot_court = jnp.asarray(np.where(
                rows_np >= 0,
                columns.court_ids[chunk_case[safe_slot]].astype(np.int32),
                -1,
            ))
        else:
            # brute mode materialises its own int8 corpus copy; the
            # partitioned mode reuses the ANN's device blocks instead.
            # Rows pad to a TILE_N multiple so the Pallas fused scan (and
            # the chunked slab program) apply at ANY corpus size — pad rows
            # carry zero scale (score exactly 0) and case -1, and the
            # engine drops case_row < 0 results (VERDICT r2 item 5).
            self.ann = None
            from ..ops.pallas_scan import pad_align_for

            v = _norm_corpus()
            n = v.shape[0]
            # align to the fused scan's preferred tile (TILE_N_BIG above
            # ~4M rows — the big tile is 7% faster at CAP scale and a
            # TILE_N_BIG multiple satisfies every TILE_N divisibility gate)
            align = pad_align_for(n)
            npad = -(-n // align) * align
            if npad != n:
                v = np.concatenate(
                    [v, np.zeros((npad - n, v.shape[1]), v.dtype)]
                )
                chunk_case = np.concatenate(
                    [chunk_case, np.full(npad - n, -1, np.int32)]
                )
            self.corpus_q, self.corpus_scale = quantize_int8(v)
            if npad != n:
                self.corpus_scale = self.corpus_scale.at[n:].set(0.0)
        safe_case = np.maximum(np.asarray(chunk_case), 0)
        pad_row = np.asarray(chunk_case) < 0
        court_col = columns.court_ids[safe_case].copy()
        date_col = columns.dates[safe_case].copy()
        if pad_row.any():
            court_col[pad_row] = 0
            date_col[pad_row] = np.iinfo(np.int32).min
        self.chunk_case = jnp.asarray(chunk_case)
        self.chunk_court = jnp.asarray(court_col)
        self.chunk_date = jnp.asarray(date_col)

    def _init_sharded(
        self, mesh, v: np.ndarray, chunk_case: np.ndarray,
        ann_mode: str = "auto",
    ) -> None:
        """Lay out the corpus + chunk columns row-sharded over the mesh's
        data axis (SURVEY §7 step 7 multi-chip; round-1 VERDICT item 4).

        Respects ``ann_mode`` (VERDICT r2 item 1 — round 2 forced brute):
        ``auto`` picks the sharded-partitioned mode (per-shard partition
        blocks against global centroids + the probe kernel + ICI merge)
        above ``PARTITIONED_MIN_VECTORS``, the sharded brute scan below;
        both run the same kernels as single-chip serving on each shard.
        Rows pad to a per-shard TILE_N multiple so the Pallas fused scan
        applies on every shard."""
        import jax

        from ..ops.pallas_scan import TILE_N
        from ..parallel.mesh import corpus_sharding, pad_corpus, row_sharding

        self.mesh = mesh
        self.ann = None
        if ann_mode == "auto":
            ann_mode = (
                "partitioned"
                if self.num_vectors >= PARTITIONED_MIN_VECTORS
                else "brute"
            )
        self.ann_mode = (
            "sharded-partitioned" if ann_mode == "partitioned" else "sharded"
        )
        padded, n = pad_corpus(v, mesh, TILE_N)
        csh, rsh = corpus_sharding(mesh), row_sharding(mesh)

        def _pad_col(col: np.ndarray, fill: int) -> np.ndarray:
            out = np.full(padded.shape[0], fill, np.int32)
            out[:n] = col
            return out

        case_col = _pad_col(chunk_case, -1)
        court_col = _pad_col(self.columns.court_ids[chunk_case], 0)
        date_col = _pad_col(
            self.columns.dates[chunk_case], np.iinfo(np.int32).min
        )
        self.chunk_case = jax.device_put(jnp.asarray(case_col), rsh)
        self.chunk_court = jax.device_put(jnp.asarray(court_col), rsh)
        self.chunk_date = jax.device_put(jnp.asarray(date_col), rsh)
        # case-level columns (small) replicate for the lexical filter check
        self.case_court = jnp.asarray(self.columns.court_ids)
        self.case_date = jnp.asarray(self.columns.dates)

        if self.ann_mode == "sharded":
            q, scale = quantize_int8(padded)
            if padded.shape[0] > n:
                scale = scale.at[n:].set(0.0)  # belt: n_valid masks by row
            self.corpus_q = jax.device_put(q, csh)
            self.corpus_scale = jax.device_put(scale, csh)
            return

        # sharded-partitioned: per-shard partition blocks against global
        # centroids (reused from a built PartitionedANN when available)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS

        from ..index.kmeans import train_kmeans
        from ..index.sharded import build_sharded_partitions
        from ..parallel.mesh import DATA_AXIS

        self.corpus_q = self.corpus_scale = None
        acfg = self.vector_index.config.hnsw
        ann = self.vector_index.ann
        if isinstance(ann, PartitionedANN) and ann.centroids is not None:
            centroids = np.asarray(ann.centroids, np.float32)
        else:
            from ..index.ann import _auto_partitions

            P = acfg.num_partitions or _auto_partitions(n)
            P = min(P, max(8, n))
            centroids = train_kmeans(
                v, P, iters=acfg.kmeans_iters, sample=acfg.kmeans_sample,
                seed=0,
            )
        S = int(mesh.shape[DATA_AXIS])
        parts = build_sharded_partitions(
            padded, n, S, centroids, court_col, date_col,
            overalloc=acfg.partition_overalloc,
        )
        p3 = NamedSharding(mesh, PS(DATA_AXIS, None, None))
        p4 = NamedSharding(mesh, PS(DATA_AXIS, None, None, None))
        self.sp_centroids = jnp.asarray(centroids, jnp.float32)
        self.sp_rows = jax.device_put(jnp.asarray(parts["part_rows"]), p3)
        self.sp_int8 = jax.device_put(jnp.asarray(parts["part_int8"]), p4)
        self.sp_scale = jax.device_put(jnp.asarray(parts["part_scale"]), p3)
        self.sp_cword = jax.device_put(jnp.asarray(parts["part_cword"]), p3)
        self.sp_cbit = jax.device_put(jnp.asarray(parts["part_cbit"]), p3)
        self.sp_date = jax.device_put(jnp.asarray(parts["part_date"]), p3)
        # raw slot court ids for the large-batch layout-brute stream
        # (word/bit decode: cbit is a power of two, so log2 is exact)
        cw = np.asarray(parts["part_cword"], np.int64)
        cb = np.asarray(parts["part_cbit"], np.uint32)
        raw = cw * 32 + np.log2(np.maximum(cb, 1).astype(np.float64)).astype(
            np.int64
        )
        self.sp_court = jax.device_put(jnp.asarray(np.where(
            np.asarray(parts["part_rows"]) >= 0, raw, -1
        ).astype(np.int32)), p3)
        self.sp_bf16 = jax.device_put(
            jnp.asarray(padded, jnp.bfloat16), csh
        )
        self.sp_m = int(parts["m"])
        P = centroids.shape[0]
        # the artifact's tuned nprobe (instance field, persisted in the
        # npz meta) wins, then the user config — same precedence as
        # PartitionedANN.default_nprobe; without this the sharded path
        # regressed to the ~P/10 heuristic even on a tuned index
        nprobe_cfg = getattr(ann, "tuned_nprobe", 0) or acfg.num_probes
        if nprobe_cfg:
            self.sp_nprobe = min(nprobe_cfg, P)
        else:
            self.sp_nprobe = min(max(8, P // 10, acfg.ef_search // 4), P)
        self.sp_rescore = max(1, acfg.rescore_factor)

    def _layout_brute_batch(self, batch: int) -> bool:
        """Batch-aware mode pick inside the partitioned modes (measured
        break-even; see :func:`..ops.hybrid.fused_layout_brute_topk`):
        serve the batch through ONE fused stream of the partition layout
        when the probe path would read at least as many corpus rows —
        ``B·nprobe·m`` probe-DMA'd vs ``P·m`` streamed per TILE_B query
        tile (and the probe path's per-step grid overhead makes the stream
        strictly better at byte parity; per chip the same rule holds in
        the sharded mode — both sides divide by S). Deterministic in the
        padded batch size, so warmup compiles exactly the programs serving
        will run."""
        from ..ops.pallas_scan import TILE_B

        if self.ann is not None:
            P = int(self.ann.centroids.shape[0])
            nprobe = int(self.ann.default_nprobe)
        elif getattr(self, "ann_mode", "") == "sharded-partitioned":
            P = int(self.sp_centroids.shape[0])
            nprobe = int(self.sp_nprobe)
        else:
            return False
        num_tiles = -(-batch // TILE_B)
        return batch * nprobe >= P * num_tiles

    def _dispatch_stream(
        self,
        q_np: np.ndarray,  # [B, D] f32, B already a fixed bucket
        court_table: np.ndarray,  # [B, V] bool
        lo: np.ndarray,  # [B] int32
        hi: np.ndarray,  # [B] int32
        trie_rows: np.ndarray,  # [B, W] int32 (-1 = no hit)
        trie_src: np.ndarray,  # [B, W] int32 SRC_* codes
        min_sim: np.ndarray,  # [B] f32
        exact_w: np.ndarray,  # [B] f32
        use_filters: bool,
        k: int,
        overfetch: int,
        recall_target: float,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """One exact stream of the partition layout (single-chip
        ``fused_layout_brute_topk`` or its multi-chip ICI-merge twin) over
        an already-padded host batch. Shared by the large-batch break-even
        pick and flat-boundary escalation so both compile the SAME program
        per (batch, filtered, k) shape."""
        from ..ops.hybrid import resolve_probe_kernel

        q = jnp.asarray(q_np, jnp.float32)
        if self.ann_mode == "sharded-partitioned":
            from ..parallel.collectives import sharded_layout_brute_topk

            lex_chunk = self._rep_np[np.maximum(trie_rows, 0)]
            trie_rows = np.where(lex_chunk >= 0, trie_rows, -1)
            shared = (
                jnp.asarray(court_table),
                jnp.asarray(lo),
                jnp.asarray(hi),
                jnp.asarray(trie_rows),
                jnp.asarray(np.ascontiguousarray(trie_src)),
                jnp.asarray(np.maximum(lex_chunk, 0)),
                self.case_court,
                self.case_date,
                jnp.asarray(min_sim),
                jnp.asarray(exact_w),
            )
            upk, pinterp = resolve_probe_kernel(
                recall_target, self.sp_m, int(self.sp_int8.shape[-1])
            )
            of = overfetch * 2  # replica/overalloc slot headroom
            out = sharded_layout_brute_topk(
                self.mesh, q, self.sp_rows, self.sp_int8,
                self.sp_scale, self.sp_court, self.sp_date,
                self.sp_bf16, self.chunk_case, *shared,
                k=k, overfetch=of, recall_target=recall_target,
                use_court=use_filters, use_date=use_filters,
                use_gather_kernel=upk, gather_interpret=pinterp,
            )
            return jax.device_get(out)

        upk, pinterp = resolve_probe_kernel(
            recall_target, int(self.ann.part_rows.shape[1]),
            int(self.ann.part_int8.shape[-1]),
        )
        _, _, pdt = self._part_cols
        of = overfetch * (2 if self.ann._replicated else 1)
        P, m = self.ann.part_rows.shape
        out = fused_layout_brute_topk(
            q,
            self.ann.part_rows,
            self.ann.part_int8,
            self.ann.part_scale,
            self.ann.corpus_bf16,
            self._slot_court,
            pdt,
            self.chunk_case,
            self.chunk_court,
            self.chunk_date,
            num_chunks=pick_num_chunks(
                int(P) * int(m), int(q_np.shape[0]), k * max(1, of)
            ),
            recall_target=recall_target,
            use_court=use_filters,
            use_date=use_filters,
            use_gather_kernel=upk,
            gather_interpret=pinterp,
            court_table=jnp.asarray(court_table),
            date_lo=jnp.asarray(lo),
            date_hi=jnp.asarray(hi),
            trie_rows=jnp.asarray(trie_rows),
            trie_src=jnp.asarray(np.ascontiguousarray(trie_src)),
            trie_chunk_of_case=self.trie_chunk_of_case,
            min_similarity=jnp.asarray(min_sim),
            exact_weight=jnp.asarray(exact_w),
            k=k,
            overfetch=of,
        )
        return jax.device_get(out)

    def _stream_subset(
        self,
        hostq: dict,
        sel: np.ndarray,  # indices into the padded batch
        use_filters: bool,
        k: int,
        overfetch: int,
        recall_target: float,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Stream-dispatch the ``sel`` rows of a padded host batch, padded
        to ``ESCALATE_BUCKET`` with inert rows (+inf similarity threshold,
        no lexical hits — same convention as query_batch's batch pad)."""
        n, Bp = int(sel.size), ESCALATE_BUCKET

        def pad(a: np.ndarray, fill) -> np.ndarray:
            out = np.full((Bp,) + a.shape[1:], fill, a.dtype)
            out[:n] = a[sel]
            return out

        return self._dispatch_stream(
            pad(hostq["q"], 0),
            pad(hostq["court_table"], True),
            pad(hostq["lo"], np.iinfo(np.int32).min),
            pad(hostq["hi"], np.iinfo(np.int32).max),
            pad(hostq["trie_rows"], -1),
            pad(hostq["trie_src"], SRC_CASE_NAME),
            pad(hostq["min_sim"], np.float32(np.inf)),
            pad(hostq["exact_w"], np.float32(0.0)),
            use_filters, k, overfetch, recall_target,
        )

    def _escalate_flat(
        self,
        hostq: dict,
        use_filters: bool,
        k: int,
        overfetch: int,
        recall_target: float,
        v: np.ndarray,
        i: np.ndarray,
        cases: np.ndarray,
        src: np.ndarray,
        B0: int,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Score-aware fallback for the probe path (tie-audit take 2's
        open item): re-dispatch queries whose served top-k boundary is
        flat through the exact layout stream and splice the results back.
        Only full-k flat boundaries escalate — an underfilled result is a
        filter/corpus property, not the audited scattered-tie miss — and
        non-flagged rows pass through bit-identical. Worst case (every
        query of a 128-batch flat) is ceil(128/8) sequential stream
        dispatches; batches past the break-even already stream outright."""
        eps = self.flat_escalate_eps
        if eps <= 0.0 or k < 2:
            return v, i, cases, src
        vv, cc = v[:B0], cases[:B0]
        finite = np.isfinite(vv) & (cc >= 0)
        full = finite.all(axis=1)
        with np.errstate(invalid="ignore"):  # -inf - -inf on underfilled
            spread = vv[:, 0] - vv[:, -1]  # rows → nan; `full` gates them
            flagged = np.nonzero(
                full & (spread <= eps * np.abs(vv[:, 0]) + 1e-6)
            )[0]
        if flagged.size == 0:
            return v, i, cases, src
        self.escalated += int(flagged.size)
        out = tuple(np.array(a) for a in (v, i, cases, src))
        for g0 in range(0, int(flagged.size), ESCALATE_BUCKET):
            sel = flagged[g0 : g0 + ESCALATE_BUCKET]
            sub = self._stream_subset(
                hostq, sel, use_filters, k, overfetch, recall_target
            )
            for dst, s in zip(out, sub):
                dst[sel] = s[: sel.size]
        return out

    def warm_escalation(
        self, k: int, overfetch: int, recall_target: float
    ) -> None:
        """Pre-compile the TWO escalation stream programs (filtered /
        unfiltered at ``ESCALATE_BUCKET``) so a serve-time flat boundary
        never pays jit latency (the round-4 TPU loadtest lesson: any
        un-warmed shape under load is a 504 storm). No-op when escalation
        is disabled or the mode has no stream twin."""
        if self.flat_escalate_eps <= 0.0 or self.ann_mode not in (
            "partitioned", "sharded-partitioned",
        ):
            return
        if self.ann_mode == "partitioned":
            D = int(self.ann.part_int8.shape[-1])
        else:
            D = int(self.sp_int8.shape[-1])
        rows, _ = self.trie_index.search_batch_rows(["__warmup__"])
        W = rows.shape[1]
        hostq = dict(
            q=np.zeros((1, D), np.float32),
            court_table=np.ones((1, self.num_courts), bool),
            lo=np.full(1, np.iinfo(np.int32).min, np.int32),
            hi=np.full(1, np.iinfo(np.int32).max, np.int32),
            trie_rows=np.full((1, W), -1, np.int32),
            trie_src=np.ascontiguousarray(self._trie_src(W)[None, :]),
            min_sim=np.full(1, np.inf, np.float32),
            exact_w=np.zeros(1, np.float32),
        )
        for filtered in (False, True):
            self._stream_subset(
                hostq, np.array([0]), filtered, k, overfetch, recall_target
            )

    @staticmethod
    def _trie_src(width: int) -> np.ndarray:
        """Column → SRC_* span code for ``search_batch_rows`` output
        (three equal spans: name | citation | content)."""
        span = max(width // 3, 1)
        src = np.empty(width, np.int32)
        codes = (SRC_CASE_NAME, SRC_CITATION, SRC_CONTENT)
        for col in range(width):
            src[col] = codes[min(col // span, 2)]
        return src

    def query_batch(
        self,
        query_embs: np.ndarray,  # [B, D]
        queries_text: Sequence[str],
        court_filters: Sequence[Optional[Sequence[str]]],
        date_ranges: Sequence[
            Optional[tuple[Optional[_dt.date], Optional[_dt.date]]]
        ],
        min_similarity: Sequence[float],
        exact_weight: Sequence[float],
        k: int = 40,
        overfetch: int = 4,
        recall_target: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Run the fused step. Returns ``(scores, chunk_idx, case_rows,
        src)`` each ``[B, k]`` (-inf/-1 padded) — k *distinct* cases per
        query, already filtered + boosted, with MatchType provenance.

        The batch axis is padded to a fixed bucket (1, 8, 32, 64, then
        powers of two) before the device call (pad queries carry an
        unsatisfiable +inf similarity threshold and no lexical hits, then
        are sliced away) — without this every distinct micro-batch size
        from the API batcher jits a fresh fused program (measured 15–90 s
        per shape over the remote-compile tunnel; the embedder and trie
        walk already bucket internally, CLAUDE.md invariant). The coarse
        buckets keep the serve-time shape count small enough for warmup
        to pre-compile ALL of them (round-4 TPU loadtest lesson: any
        un-warmed shape at serve time is a 504 storm)."""
        B0 = B = len(queries_text)
        Bp = _batch_bucket(B)
        # lexical hits (batched device walk across the three tries)
        trie_rows, trie_valid = self.trie_index.search_batch_rows(
            list(queries_text)
        )
        trie_rows = np.where(trie_valid, trie_rows, -1).astype(np.int32)
        if Bp != B:
            pad = Bp - B
            query_embs = np.concatenate(
                [query_embs,
                 np.zeros((pad, query_embs.shape[1]), query_embs.dtype)]
            )
            trie_rows = np.concatenate(
                [trie_rows,
                 np.full((pad, trie_rows.shape[1]), -1, np.int32)]
            )
            court_filters = list(court_filters) + [None] * pad
            date_ranges = list(date_ranges) + [None] * pad
            min_similarity = list(min_similarity) + [np.float32(np.inf)] * pad
            exact_weight = list(exact_weight) + [0.0] * pad
            B = Bp
        trie_src = np.broadcast_to(
            self._trie_src(trie_rows.shape[1]), trie_rows.shape
        )

        # per-query court lookup table over the vocabulary
        V = self.num_courts
        court_table = np.ones((B, V), bool)
        for b, courts in enumerate(court_filters):
            if courts:
                allowed = {
                    self.columns.court_vocab.get(c.strip(), -1) for c in courts
                }
                court_table[b] = False
                for cid in allowed:
                    if 0 <= cid < V:
                        court_table[b, cid] = True

        lo = np.empty(B, np.int32)
        hi = np.empty(B, np.int32)
        for b, dr in enumerate(date_ranges):
            lo[b], hi[b] = self.columns.encode_date_range(dr)

        use_filters = any(bool(c) for c in court_filters) or any(
            bool(dr) for dr in date_ranges
        )
        min_sim_np = np.asarray(min_similarity, np.float32)
        exact_w_np = np.asarray(exact_weight, np.float32)
        # padded per-query host arrays, kept for the stream twin: the
        # large-batch break-even dispatch and flat-boundary escalation
        hostq = dict(
            q=np.asarray(query_embs, np.float32),
            court_table=court_table, lo=lo, hi=hi,
            trie_rows=trie_rows,
            trie_src=np.ascontiguousarray(trie_src),
            min_sim=min_sim_np, exact_w=exact_w_np,
        )
        q = jnp.asarray(query_embs, jnp.float32)
        if self.ann_mode in ("sharded", "sharded-partitioned"):
            from ..parallel.collectives import (
                resolve_scan_kernel,
                sharded_fused_topk,
                sharded_partitioned_topk,
            )

            # mask lexical hits whose case has no chunk (no representative)
            lex_chunk = self._rep_np[np.maximum(trie_rows, 0)]
            trie_rows = np.where(lex_chunk >= 0, trie_rows, -1)
            shared = (
                jnp.asarray(court_table),
                jnp.asarray(lo),
                jnp.asarray(hi),
                jnp.asarray(trie_rows),
                jnp.asarray(np.ascontiguousarray(trie_src)),
                jnp.asarray(np.maximum(lex_chunk, 0)),
                self.case_court,
                self.case_date,
                jnp.asarray(np.asarray(min_similarity, np.float32)),
                jnp.asarray(np.asarray(exact_weight, np.float32)),
            )
            if self.ann_mode == "sharded-partitioned":
                from ..ops.hybrid import resolve_probe_kernel

                upk, pinterp = resolve_probe_kernel(
                    recall_target, self.sp_m, int(self.sp_int8.shape[-1]))
                if self._layout_brute_batch(B):
                    # large-batch break-even, multi-chip twin: every chip
                    # streams its own shard's layout once per query tile
                    # and shard-local top-k lists merge over ICI
                    v, i, cases, src = self._dispatch_stream(
                        hostq["q"], court_table, lo, hi, trie_rows,
                        trie_src, min_sim_np, exact_w_np,
                        use_filters, k, overfetch, recall_target,
                    )
                    return v[:B0], i[:B0], cases[:B0], src[:B0]
                v, i, cases, src = sharded_partitioned_topk(
                    self.mesh, q, self.sp_centroids, self.sp_rows,
                    self.sp_int8, self.sp_scale, self.sp_cword,
                    self.sp_cbit, self.sp_date, self.sp_bf16,
                    self.chunk_case, *shared,
                    k=k, nprobe=self.sp_nprobe, overfetch=overfetch,
                    rescore_factor=self.sp_rescore,
                    use_probe_kernel=upk, probe_interpret=pinterp,
                )
                v, i, cases, src = jax.device_get((v, i, cases, src))
                v, i, cases, src = self._escalate_flat(
                    hostq, use_filters, k, overfetch, recall_target,
                    v, i, cases, src, B0,
                )
                return v[:B0], i[:B0], cases[:B0], src[:B0]
            else:
                S = int(self.mesh.shape["data"])
                scan_mode, scan_interp = resolve_scan_kernel(
                    recall_target, int(self.corpus_q.shape[0]) // S
                )
                v, i, cases, src = sharded_fused_topk(
                    self.mesh, q, self.corpus_q, self.corpus_scale,
                    self.chunk_case, self.chunk_court, self.chunk_date,
                    *shared,
                    k=k, n_valid=self.num_vectors, overfetch=overfetch,
                    recall_target=recall_target, scan_mode=scan_mode,
                    scan_interpret=scan_interp,
                    use_court=use_filters,
                    use_date=use_filters,
                )
            v, i, cases, src = jax.device_get((v, i, cases, src))
            return v[:B0], i[:B0], cases[:B0], src[:B0]

        common = dict(
            court_table=jnp.asarray(court_table),
            date_lo=jnp.asarray(lo),
            date_hi=jnp.asarray(hi),
            trie_rows=jnp.asarray(trie_rows),
            trie_src=jnp.asarray(np.ascontiguousarray(trie_src)),
            trie_chunk_of_case=self.trie_chunk_of_case,
            min_similarity=jnp.asarray(np.asarray(min_similarity, np.float32)),
            exact_weight=jnp.asarray(np.asarray(exact_weight, np.float32)),
            k=k,
            overfetch=overfetch,
        )
        if self.ann_mode == "partitioned":
            pcw, pcb, pdt = self._part_cols
            # resolve the kernel choice host-side so it is part of the jit
            # cache key (ADVICE r2: env/backend reads at trace time were
            # silently stale on later calls)
            from ..ops.hybrid import resolve_probe_kernel

            upk, pinterp = resolve_probe_kernel(
                recall_target, int(self.ann.part_rows.shape[1]),
                int(self.ann.part_int8.shape[-1]),
            )
            if self._layout_brute_batch(B):
                # large-batch break-even (measured, see
                # ops.hybrid.fused_layout_brute_topk): the probe path would
                # read B·nprobe·m rows; one fused stream of the partition
                # layout reads P·m per ≤TILE_B query tile and is exact-er.
                v, i, cases, src = self._dispatch_stream(
                    hostq["q"], court_table, lo, hi, trie_rows,
                    hostq["trie_src"], min_sim_np, exact_w_np,
                    use_filters, k, overfetch, recall_target,
                )
                return v[:B0], i[:B0], cases[:B0], src[:B0]
            v, i, cases, src = fused_partitioned_topk(
                q,
                self.ann.centroids,
                self.ann.part_rows,
                self.ann.part_int8,
                self.ann.part_scale,
                self.ann.corpus_bf16,
                self.chunk_case,
                self.chunk_court,
                self.chunk_date,
                nprobe=self.ann.default_nprobe,
                rescore_factor=max(1, self.ann.config.rescore_factor),
                recall_target=recall_target,
                part_cword=pcw,
                part_cbit=pcb,
                part_date=pdt,
                use_probe_kernel=upk,
                probe_interpret=pinterp,
                **common,
            )
            v, i, cases, src = jax.device_get((v, i, cases, src))
            v, i, cases, src = self._escalate_flat(
                hostq, use_filters, k, overfetch, recall_target,
                v, i, cases, src, B0,
            )
            return v[:B0], i[:B0], cases[:B0], src[:B0]
        else:
            # Program choice (VERDICT r2 item 5): the one-shot program's
            # XLA fallback materialises a [B, N] f32 score matrix whenever
            # the Pallas kernel can't run (exact mode, non-TPU backend) —
            # 8.6 GB at B=256 / N=8.4M, past HBM. Above a working-set
            # threshold, serve through the chunked slab program instead
            # (lax.scan over corpus slabs, O(B·N/num_chunks) working set,
            # exact when recall_target >= 1).
            N = int(self.corpus_q.shape[0])
            num_chunks = pick_num_chunks(N, B, k * max(1, overfetch))
            fn_kwargs = dict(
                recall_target=recall_target,
                # static host-side promise: when NO query in the batch
                # carries a court/date filter the scan's mask work compiles
                # away. One COUPLED flag for both filter kinds (not two) so
                # there are exactly 2 jit variants per batch bucket and
                # warmup can cover them all (round-4 TPU loadtest lesson) —
                # a court-only batch pays the date mask too, which is a
                # cheap elementwise op vs a 15-90 s serve-time recompile.
                use_court=use_filters,
                use_date=use_filters,
                **common,
            )
            args = (
                q,
                self.corpus_q,
                self.corpus_scale,
                self.chunk_case,
                self.chunk_court,
                self.chunk_date,
            )
            if num_chunks > 1:
                v, i, cases, src = fused_hybrid_topk_chunked(
                    *args, num_chunks=num_chunks, **fn_kwargs
                )
            else:
                v, i, cases, src = fused_hybrid_topk(*args, **fn_kwargs)
        # ONE device→host transfer for all four result arrays (separate
        # np.asarray fetches each pay a device-link round trip)
        v, i, cases, src = jax.device_get((v, i, cases, src))
        return v[:B0], i[:B0], cases[:B0], src[:B0]
