"""Partitioned ANN index — the TPU-native replacement for HNSW.

The reference's HNSW was a stub (``/root/reference/src/vector.rs:184-208``;
``hnsw_rs`` commented out of Cargo.toml:40). Graph-walk ANN is hostile to
TPUs (pointer chasing, dynamic shapes); the TPU-native design (BASELINE.json
north star, SURVEY.md §7 step 6, TPU-KNN/ScaNN per PAPERS.md) is a
**partitioned scan**:

  1. **Partition** (offline): spherical k-means over the corpus → P
     centroids; every vector lands in its nearest partition. Partitions are
     stored as a dense padded block ``[P, m, D]`` (int8 + per-row scales) so
     probing is pure gathers + matmuls with static shapes.
  2. **Probe** (query): score centroids (one small matmul), take the top
     ``nprobe`` partitions per query.
  3. **Scan**: int8 dot products over the probed blocks on the MXU (int32
     accumulation), mask padding, partial top-(k·rescore_factor).
  4. **Rescore**: gather survivors from the bf16 corpus and re-rank in
     full precision → final exact-ordered top-k.

Memory accounting vs HNSW at "equal memory": HNSW spends 4·D bytes/vector
(f32) + ~M·8 bytes/vector of graph links; this index spends D bytes (int8)
+ 2·D (bf16 rescore copy) + 4 bytes (row map) ≈ 3·D+4 < 4·D+128 for D=384,
M=16 — strictly less memory, no graph.

Brute-force mode (``search_brute``) services large batches: at CAP scale a
single bf16/int8 matmul over the full corpus saturates the MXU and beats
partition probing on throughput; the engine picks per batch size.

Both paths are deterministic (ties break to the lower row id).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..core.config import AnnConfig
from ..core.errors import IndexCorrupted, VectorIndexConstructionFailed
from ..ops.scoring import gather_rescore, l2_normalize
from ..ops.topk import exact_topk

_log = logging.getLogger("tss_tpu.ann")
from .kmeans import assign_clusters, train_kmeans


def _rescore_store(v: "np.ndarray") -> tuple[jnp.ndarray, ...]:
    """Device bf16 rescore corpus as a tuple of row segments, each under
    the Mosaic gather-kernel's ~4 GiB per-input addressing cap (see
    ops.pallas_scan.split_rescore_corpus). Always a tuple — consumers
    (the probe/rescore programs) treat the store uniformly.

    Conversion to bf16 happens per segment INSIDE ``to_device`` — the
    input (f32/f16/bf16 numpy, possibly a memmap) is never copied whole
    on the host, regardless of its dtype."""
    from ..ops.pallas_scan import split_rescore_corpus

    return split_rescore_corpus(
        v, to_device=lambda seg: jnp.asarray(seg, jnp.bfloat16)
    )


def _rescore_rows(store) -> int:
    return sum(int(s.shape[0]) for s in store)


def _aligned_capacity(fill_max: int, quantize: bool) -> int:
    """Partition slot capacity: 128-lane aligned (the probe kernel's block
    requirement) whenever the extra padding is ≤15%% over the tight 8-row
    alignment; tiny partitions keep 8 (they serve through the XLA path and
    the equal-memory-vs-HNSW property must hold)."""
    m8 = max(8, -(-fill_max // 8) * 8)
    m128 = max(128, -(-fill_max // 128) * 128)
    if quantize and m128 <= 1.15 * m8:
        return m128
    return m8


def _capacity_cap(n: int, P: int, overalloc: float) -> int:
    """Per-partition slot cap bounding the dense [P, m, D] layout's host
    AND device memory regardless of k-means imbalance — without a cap,
    one giant cluster (e.g. a large duplicate-text group: every case in
    the CAP-scale corpus ends in one of a handful of boilerplate outcome
    sentences) sizes EVERY partition's capacity, which OOM'd the 5M-chunk
    build at a 77 GB nominal int8 block array.

    ``overalloc * mean`` plus an ``8 * sqrt(mean)`` slack term: natural
    k-means imbalance on small/coarse partitionings routinely exceeds
    2x the mean in RELATIVE terms while staying tiny in absolute slots,
    so the slack keeps ordinary corpora untouched; at scale it vanishes
    relative to N (total slots ≤ (overalloc + 8/sqrt(mean)) * N)."""
    mean = -(-n // max(P, 1))
    return max(8, int(overalloc * mean) + 8 * int(np.sqrt(mean)))


def _rebalance_overflow(
    assign: np.ndarray,  # [N] int32 partition per row (mutated copy returned)
    cap: int,
    centroids: np.ndarray,  # [P, D] f32
    norm_rows,  # (rows: np.ndarray) -> [len(rows), D] f32 L2-normalised
    choices: int = 16,
    slab: int = 16_384,
) -> np.ndarray:
    """Balanced-IVF overflow reassignment: each overfull partition keeps
    its ``cap`` CLOSEST members (ties: lower row id) and spills the rest
    to their best-scoring centroid with free space, walking up to
    ``choices`` candidates in score order (ties: lower partition id),
    else the least-filled partition. Spilling the farthest members (not
    arbitrary ones) minimises the recall cost: they are exactly the rows
    most likely to sit near another centroid. Same code drives build()
    and build_streaming(), so their layouts stay bit-identical."""
    n = len(assign)
    P = centroids.shape[0]
    counts = np.bincount(assign, minlength=P)
    if not len(counts) or int(counts.max()) <= cap:
        return assign
    order = np.argsort(assign, kind="stable")  # partition-major, row asc
    offs = np.zeros(P + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    spilled: list[np.ndarray] = []
    for p in np.nonzero(counts > cap)[0]:
        rows_p = order[offs[p] : offs[p] + counts[p]]  # ascending row id
        s = np.empty(len(rows_p), np.float32)
        for lo in range(0, len(rows_p), slab):
            s[lo : lo + slab] = norm_rows(rows_p[lo : lo + slab]) @ centroids[p]
        keep = np.argsort(-s, kind="stable")[:cap]  # stable → lower row id
        mask = np.ones(len(rows_p), bool)
        mask[keep] = False
        spilled.append(rows_p[mask])
    overflow_rows = np.sort(np.concatenate(spilled))
    new_counts = np.minimum(counts, cap)
    assign = assign.copy()
    _log.info(
        "partition overflow: %d/%d rows beyond cap %d (max fill %d); "
        "reassigning to next-best centroids",
        len(overflow_rows), n, cap, int(counts.max()),
    )
    for lo in range(0, len(overflow_rows), slab):
        rows = overflow_rows[lo : lo + slab]
        s = norm_rows(rows) @ centroids.T  # [r, P]
        k = min(choices, P)
        idx = np.argpartition(-s, k - 1, axis=1)[:, :k]
        idx.sort(axis=1)  # ascending partition id → stable tie-break
        sv = np.take_along_axis(s, idx, 1)
        ord2 = np.argsort(-sv, axis=1, kind="stable")
        cand = np.take_along_axis(idx, ord2, 1)
        for i, row in enumerate(rows):
            placed = False
            for c in cand[i]:
                if new_counts[c] < cap:
                    assign[row] = c
                    new_counts[c] += 1
                    placed = True
                    break
            if not placed:  # all `choices` candidates full: least-filled
                c = int(np.argmin(new_counts))
                assign[row] = c
                new_counts[c] += 1
    return assign


def _plan_pad_replicas(
    assign: np.ndarray,  # [N] final primary partition per row
    counts: np.ndarray,  # [P] primary fill per partition
    m: int,  # slot capacity (aligned)
    choices: np.ndarray,  # [N, C] top-C centroid ids per row (col 0 nearest)
) -> tuple[np.ndarray, np.ndarray]:
    """Plan replicas into the dense layout's DEAD padding slots.

    The [P, m, D] block array is sized by the largest partition, so every
    other partition carries ``m - fill`` zero slots that cost HBM whether
    or not they hold data. This fills them with duplicate entries of rows
    whose reachability benefits most, at zero extra device memory:

    1. **scattered rows first** — rows the overflow rebalancer moved out
       of their nearest partition (``choices[:, 0] != assign``). These are
       the measured round-5 floor failure: a probe's entire oracle top-10
       lived in partitions its centroid ranking never reached. Each gets
       a replica in its best-scoring centroid with a free slot.
    2. **border rows** — everyone else, replica in their second-choice
       partition when it has space (ScaNN/SOAR-style multi-assignment).

    Deterministic: fixed pass order, candidates taken in ascending row id
    per partition, one replica per row, never in the row's own partition.
    Returns ``(rows, parts)`` sorted by ``(part, row)`` — the fill order
    both builders append after the primary entries, keeping
    ``build``/``build_streaming`` bit-identical."""
    n, C = choices.shape
    P = len(counts)
    free = (m - counts).astype(np.int64)
    placed = np.zeros(n, bool)
    out_r: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    scattered = choices[:, 0] != assign
    for prio_mask in (scattered, ~scattered):
        for col in range(C):
            cand = np.flatnonzero(prio_mask & ~placed)
            if not len(cand):
                break
            tgt = choices[cand, col]
            ok = tgt != assign[cand]
            cand, tgt = cand[ok], tgt[ok]
            if not len(cand):
                continue
            order = np.lexsort((cand, tgt))  # part-major, row asc
            cand, tgt = cand[order], tgt[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(tgt)) + 1])
            reps = np.diff(np.concatenate([starts, [len(tgt)]]))
            rank = np.arange(len(tgt)) - np.repeat(starts, reps)
            take = rank < free[tgt]
            if not take.any():
                continue
            tr, tp = cand[take], tgt[take]
            free = free - np.bincount(tp, minlength=P)
            placed[tr] = True
            out_r.append(tr)
            out_p.append(tp)
    if not out_r:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    rows = np.concatenate(out_r)
    parts = np.concatenate(out_p).astype(np.int32)
    order = np.lexsort((rows, parts))
    return rows[order], parts[order]


def _auto_partitions(n: int) -> int:
    """Partition count targeting ~sqrt(N) rows per partition for small
    corpora and a fixed ~1k-row partition at scale, rounded up to a
    multiple of 8, min 8.

    ``P = max(sqrt(N), N/1024)``: past N = 1M the probe path wants FINE
    partitions — the per-query cost is ``nprobe·m·D`` DMA bytes, and the
    round-3 sweep at 8.4M rows measured m=1024 (P=8192) reaching the same
    recall as m=4096 (P=2048) while probing 8x less data
    (bench_results/capscale_r03: np16@m1024 recall 0.999 vs np32@m4096
    0.9995 at 4x the bytes)."""
    p = max(8, int(np.sqrt(max(n, 1))), n // 1024)
    return -(-p // 8) * 8


@dataclass
class AnnStats:
    num_vectors: int = 0
    num_partitions: int = 0
    partition_capacity: int = 0
    nbytes_int8: int = 0
    nbytes_rescore: int = 0
    nbytes_total: int = 0


class PartitionedANN:
    """ScaNN-style partitioned cosine ANN over a frozen corpus."""

    def __init__(self, config: Optional[AnnConfig] = None):
        self.config = config or AnnConfig()
        #: tuned search breadth (set by the tuners / adopted from a loaded
        #: artifact's meta). Kept OFF the config object: the config is the
        #: caller's shared AnnConfig (VectorIndex passes config.hnsw), and
        #: writing a per-artifact value into it would leak a stale tuned
        #: nprobe into later rebuilds in the same process (server reindex)
        self.tuned_nprobe: int = 0
        # frozen artifacts (set by build/load)
        self.centroids: Optional[jnp.ndarray] = None  # [P, D] f32
        self.part_rows: Optional[jnp.ndarray] = None  # [P, m] int32, -1 pad
        self.part_int8: Optional[jnp.ndarray] = None  # [P, m, D] int8
        self.part_scale: Optional[jnp.ndarray] = None  # [P, m] f32
        #: bf16 rescore corpus as a tuple of row segments, each under the
        #: Mosaic gather kernel's per-input addressing cap (_rescore_store)
        self.corpus_bf16: Optional[tuple[jnp.ndarray, ...]] = None
        self.num_vectors = 0
        #: True when the frozen layout carries pad replicas (some rows
        #: appear in two partitions). Serving doubles the rescore
        #: candidate fetch so duplicate copies can't crowd distinct rows
        #: out of the fixed-size candidate list; persisted in save meta.
        self._replicated = False
        self._search_fn = None
        self._brute_fn = None
        #: memmap-emit bookkeeping (build_streaming(emit_dir=...)):
        #: save_dir adopts the emit directory instead of rewriting
        self._emit_dir: Optional[Path] = None
        self._emit_arrays: list = []
        #: True while the frozen arrays are host numpy/memmap views
        #: (build_streaming(device_resident=False)): a build-only process
        #: (no-tune corpus build that saves and exits) never pays the
        #: ~14 GB HBM footprint + transfer; the first search promotes
        #: lazily via _ensure_device()
        self._host_deferred = False

    # -- build --------------------------------------------------------------

    def build(
        self,
        vectors: np.ndarray,
        seed: int = 0,
        reuse_centroids: Optional[np.ndarray] = None,
    ) -> None:
        """Freeze the index from ``[N, D]`` float vectors (normalised
        internally). ``reuse_centroids`` skips k-means training (incremental
        refresh: new vectors assign to the existing partitioning — the IVF
        equivalent of appending to the index)."""
        if vectors.ndim != 2 or vectors.shape[0] == 0:
            raise VectorIndexConstructionFailed(
                f"need [N, D] vectors, got {vectors.shape}"
            )
        n, d = vectors.shape
        self._replicated = False
        self._host_deferred = False
        v = np.asarray(vectors, np.float32)
        if not np.isfinite(v).all():
            bad = int((~np.isfinite(v)).any(axis=1).sum())
            logging.getLogger("tss_tpu.ann").warning(
                "%d/%d vectors contain non-finite values; zeroing them", bad, n
            )
            v = np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)

        if reuse_centroids is not None:
            centroids = np.asarray(reuse_centroids, np.float32)
            P = centroids.shape[0]
        else:
            P = self.config.num_partitions or _auto_partitions(n)
            P = min(P, max(8, n))  # never more partitions than points (min 8)
            centroids = train_kmeans(
                v, P, iters=self.config.kmeans_iters,
                sample=self.config.kmeans_sample, seed=seed,
                dedup=self.config.kmeans_dedup,
            )
        n_choices = (
            max(2, self.config.replica_choices)
            if self.config.pad_replicas and P > 1 else 1
        )
        if n_choices > 1:
            from .kmeans import assign_topc

            choices = assign_topc(v, centroids, n_choices)
            assign = choices[:, 0].copy()
        else:
            choices = None
            assign = np.asarray(assign_clusters(v, centroids))
        cap = _capacity_cap(n, P, self.config.partition_overalloc)
        assign = _rebalance_overflow(
            assign, cap, centroids, lambda rows: v[rows]
        )

        # Dense padded partition layout. int8 capacity aligns to 128
        # lanes — the probe kernel's block requirement — once partitions
        # are big enough that the padding overhead is marginal; tiny
        # corpora keep the tight 8-row alignment (they serve through the
        # XLA path anyway, and the equal-memory-vs-HNSW property holds).
        counts = np.bincount(assign, minlength=P)
        fill_max = int(counts.max()) if counts.size else 1
        m = _aligned_capacity(fill_max, self.config.quantize_int8)
        part_rows = np.full((P, m), -1, np.int32)
        fill = np.zeros(P, np.int32)
        for row, p in enumerate(assign):
            part_rows[p, fill[p]] = row
            fill[p] += 1
        if choices is not None:
            rep_rows, rep_parts = _plan_pad_replicas(
                assign, counts, m, choices
            )
            for row, p in zip(rep_rows, rep_parts):
                part_rows[p, fill[p]] = row
                fill[p] += 1
            if len(rep_rows):
                _log.info(
                    "pad replicas: %d rows duplicated into free slots "
                    "(%.1f%% of %d slots were padding)",
                    len(rep_rows), 100.0 * (P * m - n) / max(P * m, 1), P * m,
                )
            self._replicated = bool(len(rep_rows))

        safe_rows = np.maximum(part_rows, 0)
        pad_mask = part_rows < 0
        if self.config.quantize_int8:
            # int8 quantise per vector
            absmax = np.max(np.abs(v), axis=1)
            scale = np.maximum(absmax, 1e-12) / 127.0
            q = np.clip(np.round(v / scale[:, None]), -127, 127).astype(np.int8)
            part_int8 = q[safe_rows]  # [P, m, D]
            part_scale = scale[safe_rows].astype(np.float32)
        else:
            # bf16 block store: scale 1, "int8" blocks carry bf16 values
            # (double the HBM of int8; skips the quantisation error)
            part_int8 = v[safe_rows].astype(np.float32)
            part_scale = np.ones((P, m), np.float32)
        part_int8[pad_mask] = 0
        part_scale[pad_mask] = 0.0

        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.part_rows = jnp.asarray(part_rows)
        self.part_int8 = jnp.asarray(
            part_int8,
            jnp.int8 if self.config.quantize_int8 else jnp.bfloat16,
        )
        self.part_scale = jnp.asarray(part_scale)
        self.corpus_bf16 = _rescore_store(v)
        self.num_vectors = n
        self._search_fn = None
        self._brute_fn = None

    def build_streaming(
        self,
        vectors: np.ndarray,  # [N, D] f32, possibly np.memmap — never copied whole
        seed: int = 0,
        slab_rows: int = 262_144,
        reuse_centroids: Optional[np.ndarray] = None,
        emit_dir: Optional[str | Path] = None,
        device_resident: bool = True,
    ) -> None:
        """Corpus-scale :meth:`build`: identical frozen layout, O(slab)
        incremental host RAM on top of the output arrays (round-3 VERDICT
        item 2 — ``build`` materialises a normalised f32 copy of the whole
        corpus, ~10 GB at 6.5M chunks, before quantising).

        k-means trains on a bounded row sample; assignment, int8
        quantisation, partition fill and the bf16 rescore copy all run
        slab-wise over the (memmapped) input. Fill order is ascending row
        id per partition — the same as :meth:`build`.

        ``emit_dir``: fill the output arrays directly into disk-backed
        ``.npy`` memmaps in that directory (the :meth:`save_dir` file
        layout, so a later ``save_dir`` ADOPTS the directory with a rename
        instead of rewriting ~16 GB). Anon host RSS then stays O(slab) —
        at 10M chunks the in-RAM emit holds ~8.5 GB of int8 blocks plus a
        ~7.7 GB bf16 rescore copy that the memmap emit moves to evictable
        page cache (round-4 VERDICT item 4). Device residency is
        unchanged: the frozen arrays still land in HBM for serving."""
        n, d = vectors.shape
        self._replicated = False
        self._host_deferred = False
        if n == 0:
            raise VectorIndexConstructionFailed("empty corpus")
        if not self.config.quantize_int8:
            # bf16-block mode is a small-corpus configuration; stream-build
            # targets CAP scale where int8 blocks are the design point
            self.build(np.asarray(vectors), seed=seed,
                       reuse_centroids=reuse_centroids)
            return
        bf16_dt = np.dtype(jnp.bfloat16)

        from ..utils import madvise_dontneed

        def _advise_input() -> None:
            # drop consumed input pages from OUR page tables (they stay in
            # page cache — re-reads minor-fault, no IO): a 10M-chunk pass
            # over a 15 GB vector store must not accumulate 15 GB of RSS
            madvise_dontneed(vectors)

        def _norm_slab(lo: int, hi: int) -> np.ndarray:
            v = np.asarray(vectors[lo:hi], np.float32)
            if not np.isfinite(v).all():
                v = np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
            return v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )

        if reuse_centroids is not None:
            centroids = np.asarray(reuse_centroids, np.float32)
            P = centroids.shape[0]
        else:
            P = self.config.num_partitions or _auto_partitions(n)
            P = min(P, max(8, n))
            sample_n = min(n, max(self.config.kmeans_sample, 64 * P))
            rng = np.random.default_rng(seed)
            take = np.sort(rng.choice(n, sample_n, replace=False))
            sample = np.asarray(vectors[take], np.float32)
            centroids = train_kmeans(
                sample, P, iters=self.config.kmeans_iters,
                sample=sample_n, seed=seed,
                dedup=self.config.kmeans_dedup,
            )
            del sample

        # pass 1: slab-wise assignment (top-C choices when the pad-replica
        # planner is on; column 0 == assign_clusters either way)
        n_choices = (
            max(2, self.config.replica_choices)
            if self.config.pad_replicas and P > 1 else 1
        )
        assign = np.empty(n, np.int32)
        choices = (
            np.empty((n, min(n_choices, P)), np.int32)
            if n_choices > 1 else None
        )
        for lo in range(0, n, slab_rows):
            hi = min(lo + slab_rows, n)
            if choices is not None:
                from .kmeans import assign_topc

                choices[lo:hi] = assign_topc(
                    _norm_slab(lo, hi), centroids, n_choices
                )
                assign[lo:hi] = choices[lo:hi, 0]
            else:
                assign[lo:hi] = np.asarray(
                    assign_clusters(_norm_slab(lo, hi), centroids)
                )
            _advise_input()

        def _norm_rows(rows: np.ndarray) -> np.ndarray:
            v = np.array(vectors[rows], np.float32)
            if not np.isfinite(v).all():
                v = np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
            return v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )

        cap = _capacity_cap(n, P, self.config.partition_overalloc)
        assign = _rebalance_overflow(assign, cap, centroids, _norm_rows)
        counts = np.bincount(assign, minlength=P)
        fill_max = int(counts.max()) if counts.size else 1
        m = _aligned_capacity(fill_max, True)

        # pass 2: slab-wise quantise + partition fill (ascending row order
        # per partition — parity with build())
        if emit_dir is not None:
            from numpy.lib.format import open_memmap

            from ..ops.pallas_scan import (
                GATHER_ROW_ALIGN_LCM,
                GATHER_SEG_BYTES,
            )

            emit = Path(emit_dir)
            if emit.exists():  # stale emit from a prior run: segment
                import shutil  # counts may differ — start clean

                shutil.rmtree(emit)
            emit.mkdir(parents=True)
            part_rows = open_memmap(
                emit / "part_rows.npy", mode="w+",
                dtype=np.int32, shape=(P, m),
            )
            part_rows[:] = -1
            # w+ memmaps are zero-filled (sparse) — matches the np.zeros
            # init of the in-RAM emit for int8 blocks and scales
            part_int8 = open_memmap(
                emit / "part_int8.npy", mode="w+",
                dtype=np.int8, shape=(P, m, d),
            )
            part_scale = open_memmap(
                emit / "part_scale.npy", mode="w+",
                dtype=np.float32, shape=(P, m),
            )
            # bf16 rescore copy as per-segment uint16 files — the EXACT
            # split_rescore_corpus geometry (row count per segment, tail
            # zero-padded to the 32-row lcm) and the save_dir bit-view
            # format, so load_dir reads these files unchanged
            L = GATHER_ROW_ALIGN_LCM
            seg_rows = max(L, (GATHER_SEG_BYTES // max(d * 2, 1)) // L * L)
            n_segs = 1 if n <= seg_rows else -(-n // seg_rows)
            bf16_segs = []
            for i in range(n_segs):
                lo_s = i * seg_rows
                real = min(seg_rows, n - lo_s)
                padded = -(-real // L) * L
                bf16_segs.append(open_memmap(
                    emit / f"rescore_{i}.npy", mode="w+",
                    dtype=np.uint16, shape=(padded, d),
                ))
            self._emit_dir = emit
            self._emit_arrays = [
                part_rows, part_int8, part_scale, *bf16_segs
            ]
        else:
            part_rows = np.full((P, m), -1, np.int32)
            part_int8 = np.zeros((P, m, d), np.int8)
            part_scale = np.zeros((P, m), np.float32)
            bf16 = np.zeros((n, d), bf16_dt)
            self._emit_dir = None
            self._emit_arrays = []
        cursor = np.zeros(P, np.int64)
        for lo in range(0, n, slab_rows):
            hi = min(lo + slab_rows, n)
            v = _norm_slab(lo, hi)
            if emit_dir is not None:
                v16 = v.astype(bf16_dt).view(np.uint16)
                w = lo
                while w < hi:
                    si, off = divmod(w, seg_rows)
                    take = min(hi - w, seg_rows - off)
                    bf16_segs[si][off : off + take] = v16[w - lo : w - lo + take]
                    w += take
            else:
                bf16[lo:hi] = v.astype(bf16_dt)
            a = assign[lo:hi]
            order = np.argsort(a, kind="stable")
            a_sorted = a[order]
            c_slab = np.bincount(a, minlength=P).astype(np.int64)
            offs = np.zeros(P + 1, np.int64)
            np.cumsum(c_slab, out=offs[1:])
            pos = (
                np.arange(len(order)) - np.repeat(offs[:-1], c_slab)
                + cursor[a_sorted]
            ).astype(np.int64)
            rows_sorted = (lo + order).astype(np.int32)
            absmax = np.max(np.abs(v), axis=1)
            scale = np.maximum(absmax, 1e-12) / 127.0
            q8 = np.clip(
                np.round(v / scale[:, None]), -127, 127
            ).astype(np.int8)
            part_rows[a_sorted, pos] = rows_sorted
            part_int8[a_sorted, pos] = q8[order]
            part_scale[a_sorted, pos] = scale[order].astype(np.float32)
            cursor += c_slab
            _advise_input()
            if emit_dir is not None:
                # the scattered partition writes dirty pages across the
                # whole emit files — zap OUR PTEs each slab (dirty pages
                # move to page cache and reach disk via normal writeback)
                for a in self._emit_arrays:
                    madvise_dontneed(a)

        # pass 3: pad-replica fill — appended after the primary entries in
        # (part, row) order, exactly like build()'s fill loop, so the two
        # builders stay bit-identical. Replica values re-quantise from the
        # f32 slab read (NOT the bf16 copy) for the same reason.
        if choices is not None:
            rep_rows, rep_parts = _plan_pad_replicas(
                assign, counts, m, choices
            )
            cursor2 = counts.astype(np.int64)
            for lo in range(0, len(rep_rows), slab_rows):
                rr = rep_rows[lo : lo + slab_rows]
                pp = rep_parts[lo : lo + slab_rows]
                v = _norm_rows(rr)
                absmax = np.max(np.abs(v), axis=1)
                scale = np.maximum(absmax, 1e-12) / 127.0
                q8 = np.clip(
                    np.round(v / scale[:, None]), -127, 127
                ).astype(np.int8)
                c_slab = np.bincount(pp, minlength=P).astype(np.int64)
                offs = np.zeros(P + 1, np.int64)
                np.cumsum(c_slab, out=offs[1:])
                pos = (
                    np.arange(len(pp)) - np.repeat(offs[:-1], c_slab)
                    + cursor2[pp]
                ).astype(np.int64)
                part_rows[pp, pos] = rr.astype(np.int32)
                part_int8[pp, pos] = q8
                part_scale[pp, pos] = scale.astype(np.float32)
                cursor2 += c_slab
                _advise_input()
                if emit_dir is not None:
                    for a in self._emit_arrays:
                        madvise_dontneed(a)
            if len(rep_rows):
                _log.info(
                    "pad replicas (streaming): %d rows duplicated into "
                    "free slots", len(rep_rows),
                )
            self._replicated = bool(len(rep_rows))

        if emit_dir is not None and not device_resident:
            # host-deferred: the frozen attrs stay memmap views over the
            # emit files. A build-only flow (no-tune corpus build → save
            # adopts the directory → process exits) then never transfers
            # ~14 GB into HBM it won't use — at 10M chunks that transfer
            # is also within ~2 GB of a v5e chip's whole HBM, so paying
            # it only to save would make build success hinge on fitting
            # TWO copies once the reload check loads the artifact back.
            self.centroids = np.asarray(centroids, np.float32)
            self.part_rows = part_rows
            self.part_int8 = part_int8
            self.part_scale = part_scale
            self.corpus_bf16 = tuple(
                s.view(ml_dtypes.bfloat16) for s in bf16_segs
            )
            self._host_deferred = True
            self.num_vectors = n
            self._search_fn = None
            self._brute_fn = None
            return
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.part_rows = jnp.asarray(part_rows)
        if emit_dir is not None:
            # device residency from the emit files (page cache → HBM; the
            # host never holds an anon copy); save_dir later adopts the
            # directory itself. Each transfer faults one file resident —
            # drop it right after so peak file RSS is ONE component, not
            # the sum (~9 GB int8 + ~8 GB bf16 at 10M chunks)
            self.part_int8 = jnp.asarray(part_int8)
            madvise_dontneed(part_int8)
            self.part_scale = jnp.asarray(part_scale)
            segs = []
            for s in bf16_segs:
                segs.append(jnp.asarray(s.view(ml_dtypes.bfloat16)))
                madvise_dontneed(s)
            self.corpus_bf16 = tuple(segs)
            madvise_dontneed(part_rows)
            madvise_dontneed(part_scale)
        else:
            self.part_int8 = jnp.asarray(part_int8)
            self.part_scale = jnp.asarray(part_scale)
            self.corpus_bf16 = _rescore_store(bf16)
        self.num_vectors = n
        self._search_fn = None
        self._brute_fn = None

    # -- search -------------------------------------------------------------

    def _ensure_device(self) -> None:
        """Promote host-deferred frozen arrays (build_streaming with
        ``device_resident=False``) to device residency on first search."""
        if not self._host_deferred:
            return
        from ..utils import madvise_dontneed

        self.centroids = jnp.asarray(self.centroids, jnp.float32)
        rows, int8, scale = self.part_rows, self.part_int8, self.part_scale
        self.part_rows = jnp.asarray(rows)
        self.part_int8 = jnp.asarray(int8)
        self.part_scale = jnp.asarray(scale)
        segs = []
        for s in self.corpus_bf16:
            segs.append(jnp.asarray(s))
            madvise_dontneed(s)
        self.corpus_bf16 = tuple(segs)
        for a in (rows, int8, scale):
            madvise_dontneed(a)
        self._host_deferred = False

    @property
    def default_nprobe(self) -> int:
        P = int(self.centroids.shape[0]) if self.centroids is not None else 8
        # the instance's tuned value wins (set by an explicit tune call on
        # THIS index, or adopted from the artifact meta by load() when the
        # caller's config leaves num_probes unset); then the config; then
        # the ef_search-scaled heuristic (the reference's breadth knob)
        if self.tuned_nprobe:
            return min(self.tuned_nprobe, P)
        if self.config.num_probes:
            return min(self.config.num_probes, P)
        return min(max(8, P // 10, self.config.ef_search // 4), P)

    def _make_search_fn(self, k: int, nprobe: int):
        import os

        cfg = self.config
        # replicated layouts fetch 2x candidates: each row probed through
        # both its partitions consumes two candidate slots before dedup
        rescore_k = min(
            k * max(1, cfg.rescore_factor) * (2 if self._replicated else 1),
            self.num_vectors,
        )
        quantize = bool(cfg.quantize_int8)
        m = int(self.part_rows.shape[1])
        # serving program choice (resolved here, part of the cache key):
        # the scalar-prefetch probe kernel DMAs exactly the probed blocks;
        # the XLA gather materialises them through a copy (measured ~100x
        # at CAP scale). TSS_PROBE_INTERPRET=1 runs the kernel in interpret
        # mode on any backend (tests).
        probe_interpret = os.environ.get("TSS_PROBE_INTERPRET") == "1"
        use_kernel = (
            quantize
            and m % 128 == 0
            # feature axis must be 128-lane aligned for COMPILED Mosaic
            # DMA slices (D=384 serves); interpret mode is unconstrained
            and (int(self.part_int8.shape[-1]) % 128 == 0 or probe_interpret)
            and (jax.default_backend() == "tpu" or probe_interpret)
        )

        # NOTE: index arrays are explicit jit arguments, never closure
        # captures — a captured device array becomes an HLO *constant*,
        # which a remote-compile tunnel must serialise with the program
        # (multi-GB request bodies at CAP scale → HTTP 413).
        @jax.jit
        def _search(
            q, centroids, part_rows, part_int8, part_scale, corpus_bf16
        ) -> tuple[jax.Array, jax.Array]:
            qn = l2_normalize(q.astype(jnp.float32))
            B = qn.shape[0]
            # 1) probe partitions
            cs = jnp.einsum("bd,pd->bp", qn, centroids,
                            preferred_element_type=jnp.float32)
            _, top_p = jax.lax.top_k(cs, nprobe)  # [B, nprobe]
            # the [B, nprobe] probed-id scalar prefetch lives in SMEM
            # (1 MB); oversized shapes (big tuning sweeps) take the XLA
            # gather path instead of failing to compile
            if use_kernel and B * nprobe * 4 <= 768 * 1024:
                # 2+3) the serving kernel with open filters (the recall
                # harness must measure the program that serves — round-2
                # verdict weak item 8)
                from ..ops.pallas_scan import pallas_probe_candidates

                q_abs = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
                q_scale = jnp.maximum(q_abs, 1e-12) / 127.0
                q8 = jnp.clip(
                    jnp.round(qn / q_scale), -127, 127
                ).astype(jnp.int8)
                pcw = jnp.where(part_rows >= 0, 0, -1)
                pcb = jnp.ones(part_rows.shape, jnp.uint32)
                pdt = jnp.zeros(part_rows.shape, jnp.int32)
                kc_v, kc_s = pallas_probe_candidates(
                    q8, q_scale, top_p, part_int8, part_scale, part_rows,
                    pcw, pcb, pdt,
                    jnp.ones((B, 1), jnp.uint32),
                    jnp.full(B, -(2**31), jnp.int32),
                    jnp.full(B, 2**31 - 1, jnp.int32),
                    jnp.full(B, -jnp.inf, jnp.float32),
                    interpret=probe_interpret,
                )
                lanes_n = kc_v.shape[1] // nprobe
                rows3 = part_rows[
                    top_p[:, :, None], kc_s.reshape(B, nprobe, lanes_n)
                ]
                flat_scores = kc_v
                flat_rows = rows3.reshape(B, -1)
            else:
                # 2) gather probed blocks
                rows = jnp.take(part_rows, top_p, axis=0)  # [B, np, m]
                blocks = jnp.take(part_int8, top_p, axis=0)  # [B, np, m, D]
                scales = jnp.take(part_scale, top_p, axis=0)  # [B, np, m]
                if quantize:
                    # 3) int8 scan (int32 MXU accumulation)
                    q_abs = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
                    q_scale = jnp.maximum(q_abs, 1e-12) / 127.0
                    q8 = jnp.clip(
                        jnp.round(qn / q_scale), -127, 127
                    ).astype(jnp.int8)
                    acc = jnp.einsum("bd,bpmd->bpm", q8, blocks,
                                     preferred_element_type=jnp.int32)
                    scores = (
                        acc.astype(jnp.float32) * scales * q_scale[:, :, None]
                    )
                else:
                    # 3) bf16 scan (f32 accumulation)
                    scores = jnp.einsum(
                        "bd,bpmd->bpm", qn.astype(jnp.bfloat16), blocks,
                        preferred_element_type=jnp.float32,
                    ) * scales
                flat_scores = scores.reshape(B, -1)
                flat_rows = rows.reshape(B, -1)
            flat_scores = jnp.where(flat_rows >= 0, flat_scores, -jnp.inf)
            # 4) partial top, then full-precision rescore (composite-key:
            # ties break to the lower row id — determinism invariant)
            from ..ops.topk import topk_by_score_then_row

            cand_n = min(rescore_k, flat_scores.shape[-1])
            cand_v, cand_rows = topk_by_score_then_row(
                flat_scores, flat_rows, cand_n
            )
            # Pad-replica dedup: a row probed through BOTH its partitions
            # appears twice with a bitwise-identical score (same int8
            # block entry + scale), so the (-score, row) sort makes the
            # copies adjacent — mask every repeat of its left neighbour.
            dup = jnp.concatenate(
                [
                    jnp.zeros_like(cand_rows[:, :1], dtype=bool),
                    (cand_rows[:, 1:] == cand_rows[:, :-1])
                    & (cand_rows[:, 1:] >= 0),
                ],
                axis=1,
            )
            cand_v = jnp.where(dup, -jnp.inf, cand_v)
            safe = jnp.maximum(cand_rows, 0)
            if use_kernel:
                # scalar-prefetch gather: DMA exactly the candidate rows
                # (XLA's take lowers to a full-corpus pass at scale)
                from ..ops.pallas_scan import pallas_gather_rescore

                re = pallas_gather_rescore(
                    qn, corpus_bf16, safe, interpret=probe_interpret
                )
            else:
                re = gather_rescore(qn, corpus_bf16, safe)
            re = jnp.where(jnp.isfinite(cand_v), re, -jnp.inf)
            kk = min(k, cand_n)
            v, idx = topk_by_score_then_row(re, cand_rows, kk)
            return v, jnp.where(jnp.isneginf(v), -1, idx)

        def _bound(q):
            return _search(q, self.centroids, self.part_rows, self.part_int8,
                           self.part_scale, self.corpus_bf16)

        return _bound

    def search(
        self, queries: np.ndarray | jax.Array, k: int,
        nprobe: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k ``(scores, rows)`` per query; rows are corpus row ids, -1
        when fewer than k vectors exist."""
        self._require_built()
        self._ensure_device()
        nprobe = nprobe or self.default_nprobe
        P, m = (int(s) for s in self.part_rows.shape)
        if nprobe * m >= self.num_vectors or nprobe >= P:
            # probing (nearly) the whole corpus: the exact segment scan IS
            # that program, without a [B, nprobe] probe stage that scales
            # SMEM/VMEM with nprobe (the tuner's doubling sweep reaches
            # here on hard query sets)
            return self.search_brute(queries, k)
        key = (int(k), int(nprobe))
        if self._search_fn is None or self._search_fn[0] != key:
            self._search_fn = (key, self._make_search_fn(k, nprobe))
        v, i = self._search_fn[1](jnp.asarray(queries))
        return np.asarray(v), np.asarray(i)

    def search_brute(
        self, queries: np.ndarray | jax.Array, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact full-scan top-k over the bf16 corpus (large-batch path /
        recall oracle; BASELINE config 3)."""
        self._require_built()
        self._ensure_device()
        kk = min(k, self.num_vectors)
        n_real = self.num_vectors
        if self._brute_fn is None or self._brute_fn[0] != kk:

            # corpus as an explicit argument (not a captured HLO constant —
            # see _make_search_fn); the segmented store scans segment-wise
            # with a running top-k merge (scores never materialise [B, N])
            @jax.jit
            def _brute(q, segs) -> tuple[jax.Array, jax.Array]:
                from ..ops.topk import merge_topk

                qn = l2_normalize(q.astype(jnp.float32))
                best_v = best_i = None
                base = 0
                for seg in segs:
                    scores = jnp.einsum(
                        "bd,nd->bn", qn.astype(jnp.bfloat16), seg,
                        preferred_element_type=jnp.float32,
                    )
                    if base + int(seg.shape[0]) > n_real:
                        # store segments zero-pad to the gather kernel's
                        # 32-row alignment; pad rows score 0.0 which can
                        # outrank negative true scores — mask them out
                        valid = (
                            jnp.arange(seg.shape[0], dtype=jnp.int32) + base
                        ) < n_real
                        scores = jnp.where(valid[None, :], scores, -jnp.inf)
                    v, i = exact_topk(scores, min(kk, seg.shape[0]))
                    i = i.astype(jnp.int32) + base
                    if v.shape[1] < kk:  # short tail segment: pad to width
                        pad = kk - v.shape[1]
                        v = jnp.pad(
                            v, ((0, 0), (0, pad)), constant_values=-jnp.inf
                        )
                        i = jnp.pad(i, ((0, 0), (0, pad)), constant_values=-1)
                    if best_v is None:
                        best_v, best_i = v, i
                    else:
                        best_v, best_i = merge_topk(
                            jnp.stack([best_v, v], axis=1),
                            jnp.stack([best_i, i], axis=1),
                            kk,
                        )
                    base += seg.shape[0]
                return best_v, best_i

            self._brute_fn = (kk, _brute)
        v, i = self._brute_fn[1](jnp.asarray(queries), self.corpus_bf16)
        return np.asarray(v), np.asarray(i.astype(jnp.int32))

    def tune_nprobe(
        self,
        sample_queries: np.ndarray,
        k: int = 10,
        target_recall: float = 0.95,
    ) -> int:
        """Pick the smallest ``nprobe`` whose recall@k vs the exact scan hits
        ``target_recall`` on sample queries, and persist it in the config
        (SURVEY.md §7 "tune (P, nprobe) to hit 0.95 recall@10").

        Doubling sweep then midpoint refine — O(log P) search passes.

        CAVEAT: with corpus rows as their own sample queries this
        tie-aware criterion is degenerate on duplicate-heavy corpora
        (every returned duplicate ties the oracle's k-th score — the
        5M-chunk CAP build tuned to nprobe=1 while case-level serving
        recall was 0.53). Prefer ``index.tuning.tune_nprobe_case_recall``
        with query-shaped probes whenever storage + encoder are
        available; this remains the small-corpus / vectors-only fallback.
        """
        self._require_built()
        ov, _ = self.search_brute(sample_queries, k)
        # SCORE-based recall: a hit is any result scoring within eps of the
        # oracle's k-th score. Index-based recall is ill-defined under score
        # ties — real corpora carry large duplicate-text groups (identical
        # embeddings), where the probe path and the brute oracle legitimately
        # return different equal-scoring rows; the tuner would then chase
        # unreachable recall out to nprobe ~ P (observed: the 5M-chunk build
        # died compiling a [64, 3904] scalar-prefetch that overflowed SMEM).
        # eps covers f32 accumulation-order noise ONLY (both the brute
        # oracle and the probe rescore cast q to bf16 against the same
        # bf16 store, so an exact row match scores identically up to
        # reduction tiling). A bf16-scale eps (1e-3) here over-credited
        # near-ties and let the tuner accept an nprobe the strict f32
        # north-star metric then failed by ~0.5% (round-5 replica work).
        thresh = np.asarray(ov)[:, k - 1 : k] - 1e-5

        def recall_at(nprobe: int) -> float:
            gv, _ = self.search(sample_queries, k, nprobe=nprobe)
            return float(np.mean(np.asarray(gv) >= thresh))

        P = int(self.centroids.shape[0])
        # power-of-two sweep + ONE midpoint refine: every distinct nprobe
        # is a fresh XLA/Mosaic program (minutes each over a remote-compile
        # tunnel), so the tuner bounds itself to ~log2(P)+1 compiles and
        # accepts ≤1.5x over-probe instead of an exact binary search
        start = max(1, self.default_nprobe // 2)
        n = 1 << (start - 1).bit_length()  # next pow2 ≥ start
        if recall_at(n) >= target_recall:
            hi = n
            while hi > 1:  # descend while the target still holds
                half = hi // 2
                if recall_at(half) < target_recall:
                    break
                hi = half
        else:
            lo = n
            while True:
                n *= 2
                if n >= P:
                    hi = P
                    break
                if recall_at(n) >= target_recall:
                    hi = n
                    break
                lo = n
            if hi < P and hi - lo > 1:  # one midpoint refine
                mid = (lo + hi) // 2
                if recall_at(mid) >= target_recall:
                    hi = mid
        self.tuned_nprobe = hi
        return hi

    def _require_built(self) -> None:
        if self.centroids is None:
            raise VectorIndexConstructionFailed("index not built/loaded")

    # -- stats / persistence ------------------------------------------------

    def get_stats(self) -> AnnStats:
        if self.centroids is None:
            return AnnStats()
        int8_b = int(self.part_int8.nbytes) + 4 * int(self.part_scale.size)
        res_b = 2 * sum(int(s.size) for s in self.corpus_bf16)
        total = int8_b + res_b + 4 * int(self.part_rows.size) + 4 * int(
            self.centroids.size
        )
        return AnnStats(
            num_vectors=self.num_vectors,
            num_partitions=int(self.centroids.shape[0]),
            partition_capacity=int(self.part_rows.shape[1]),
            nbytes_int8=int8_b,
            nbytes_rescore=res_b,
            nbytes_total=total,
        )

    def save(self, path: str | Path) -> None:
        """Persist the frozen index as a (np.load-compatible) npz zip.

        The bf16 rescore store writes ONE SEGMENT PER MEMBER
        (``corpus_f16_0..S-1``), streamed into the zip one at a time — a
        concatenated single array would spike host RAM by the whole
        corpus (~6.4 GB f16 at the 8.4M×384 CAP scale) on top of the
        device copy, undoing the O(slab) build discipline."""
        self._require_built()
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if self._emit_dir is not None:
            # small-artifact save after a memmap-emit build: the npz is
            # the canonical artifact; drop the unadopted emit directory
            import shutil

            self._emit_arrays = []
            shutil.rmtree(self._emit_dir, ignore_errors=True)
            self._emit_dir = None
        int8_blocks = self.part_int8.dtype == jnp.int8
        blocks = (
            np.asarray(self.part_int8)
            if int8_blocks
            # numpy can't round-trip bfloat16 through savez: store f16
            else np.asarray(self.part_int8.astype(jnp.float32)).astype(np.float16)
        )
        import zipfile
        from numpy.lib import format as npformat

        meta = np.array(json.dumps({
            "num_vectors": self.num_vectors,
            "int8_blocks": bool(int8_blocks),
            "rescore_segments": len(self.corpus_bf16),
            # tuned search breadth; without this a loaded CAP-scale
            # index falls back to the default_nprobe heuristic (~P/10),
            # over-probing ~10x
            "num_probes": int(
                self.tuned_nprobe or self.config.num_probes
            ),
            "replicated": bool(self._replicated),
        }))
        with zipfile.ZipFile(
            path, "w", zipfile.ZIP_DEFLATED, allowZip64=True
        ) as zf:
            def put(name: str, arr: np.ndarray) -> None:
                with zf.open(name + ".npy", "w", force_zip64=True) as f:
                    npformat.write_array(
                        f, np.asanyarray(arr), allow_pickle=False
                    )

            put("centroids", np.asarray(self.centroids))
            put("part_rows", np.asarray(self.part_rows))
            put("part_int8", blocks)
            put("part_scale", np.asarray(self.part_scale))
            put("meta", meta)
            del blocks
            for i, s in enumerate(self.corpus_bf16):
                # bf16 device → host (ml_dtypes) → f16, one segment of
                # transient host RAM at a time
                put(f"corpus_f16_{i}", np.asarray(s).astype(np.float16))

    def save_dir(self, path: str | Path) -> None:
        """Persist as a directory of RAW ``.npy`` files (+ ``meta.json``) —
        the large-artifact format. The npz format pays a full zlib pass
        both ways (measured: the round-3 5M-chunk artifact took 242.6 s to
        load, dominated by DEFLATE over ~4.6 GB); raw .npy files load as
        memmaps at disk speed and bf16 segments persist as uint16 bit
        views, so load performs ZERO dtype conversion work. Atomic: writes
        to ``<path>.tmp`` then renames over."""
        self._require_built()
        path = Path(path)
        if self._emit_dir is not None:
            # memmap-emit build: the directory already holds every large
            # array in this exact format — flush, add the small files, and
            # rename it into place (no ~16 GB device fetch + rewrite)
            import shutil

            emit = Path(self._emit_dir)
            for a in self._emit_arrays:
                a.flush()
            np.save(emit / "centroids.npy", np.asarray(self.centroids))
            n_segs = sum(
                1 for f in emit.iterdir() if f.name.startswith("rescore_")
            )
            (emit / "meta.json").write_text(json.dumps({
                "num_vectors": self.num_vectors,
                "int8_blocks": True,
                "rescore_segments": n_segs,
                "num_probes": int(
                    self.tuned_nprobe or self.config.num_probes
                ),
                "replicated": bool(self._replicated),
            }))
            self._emit_dir = None
            self._emit_arrays = []
            if emit == path:
                return
            if path.exists():
                shutil.rmtree(path)
            emit.rename(path)
            return
        tmp = path.with_name(path.name + ".tmp")
        if tmp.exists():
            import shutil

            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        int8_blocks = self.part_int8.dtype == jnp.int8
        blocks = np.asarray(self.part_int8)
        if not int8_blocks:  # bf16 blocks persist as uint16 bit views
            blocks = blocks.view(np.uint16)
        np.save(tmp / "part_int8.npy", blocks)
        del blocks
        np.save(tmp / "centroids.npy", np.asarray(self.centroids))
        np.save(tmp / "part_rows.npy", np.asarray(self.part_rows))
        np.save(tmp / "part_scale.npy", np.asarray(self.part_scale))
        for i, s in enumerate(self.corpus_bf16):
            # one segment of transient host RAM at a time
            np.save(tmp / f"rescore_{i}.npy", np.asarray(s).view(np.uint16))
        (tmp / "meta.json").write_text(json.dumps({
            "num_vectors": self.num_vectors,
            "int8_blocks": bool(int8_blocks),
            "rescore_segments": len(self.corpus_bf16),
            "num_probes": int(self.tuned_nprobe or self.config.num_probes),
            "replicated": bool(self._replicated),
        }))
        if path.exists():
            import shutil

            shutil.rmtree(path)
        tmp.rename(path)

    @classmethod
    def load_dir(
        cls, path: str | Path, config: Optional[AnnConfig] = None
    ) -> "PartitionedANN":
        """Load the raw-``.npy`` directory format (see :meth:`save_dir`).
        Arrays are memmapped and handed straight to the device — no
        decompression and no host-side dtype conversion."""
        idx = cls(config)
        path = Path(path)
        try:
            meta = json.loads((path / "meta.json").read_text())
            mm = lambda n: np.load(path / n, mmap_mode="r")  # noqa: E731
            idx.centroids = jnp.asarray(mm("centroids.npy"), jnp.float32)
            idx.part_rows = jnp.asarray(mm("part_rows.npy"))
            blocks = mm("part_int8.npy")
            if meta.get("int8_blocks", True):
                idx.part_int8 = jnp.asarray(blocks, jnp.int8)
            else:
                idx.part_int8 = jnp.asarray(
                    blocks.view(ml_dtypes.bfloat16)
                )
            idx.part_scale = jnp.asarray(mm("part_scale.npy"))
            idx.corpus_bf16 = tuple(
                jnp.asarray(
                    mm(f"rescore_{i}.npy").view(ml_dtypes.bfloat16)
                )
                for i in range(int(meta.get("rescore_segments", 0)))
            )
            idx.num_vectors = int(meta["num_vectors"])
            idx._replicated = bool(meta.get("replicated", False))
            if not idx.config.num_probes:
                idx.tuned_nprobe = int(meta.get("num_probes", 0))
        except (KeyError, ValueError, OSError, json.JSONDecodeError) as e:
            raise IndexCorrupted(index_type="ann", details=str(e)) from e
        return idx

    @classmethod
    def load(cls, path: str | Path, config: Optional[AnnConfig] = None) -> "PartitionedANN":
        idx = cls(config)
        try:
            with np.load(path, allow_pickle=False) as z:
                meta = json.loads(str(z["meta"]))
                idx.centroids = jnp.asarray(z["centroids"], jnp.float32)
                idx.part_rows = jnp.asarray(z["part_rows"])
                idx.part_int8 = jnp.asarray(
                    z["part_int8"],
                    jnp.int8 if meta.get("int8_blocks", True) else jnp.bfloat16,
                )
                idx.part_scale = jnp.asarray(z["part_scale"])
                n_segs = int(meta.get("rescore_segments", 0))
                if n_segs:
                    # segment-per-member layout: decompress + convert one
                    # segment at a time (save() wrote them pre-aligned)
                    idx.corpus_bf16 = tuple(
                        jnp.asarray(z[f"corpus_f16_{i}"], jnp.bfloat16)
                        for i in range(n_segs)
                    )
                else:  # legacy single concatenated member
                    idx.corpus_bf16 = _rescore_store(z["corpus_f16"])
                idx.num_vectors = int(meta["num_vectors"])
                idx._replicated = bool(meta.get("replicated", False))
                # adopt the persisted tuned nprobe as INSTANCE state, and
                # only when the caller's config leaves num_probes unset
                # (an explicit config override wins). The shared config
                # object is never mutated — a stale artifact value must
                # not leak into later rebuilds (server reindex)
                if not idx.config.num_probes:
                    idx.tuned_nprobe = int(meta.get("num_probes", 0))
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            raise IndexCorrupted(index_type="ann", details=str(e)) from e
        return idx
