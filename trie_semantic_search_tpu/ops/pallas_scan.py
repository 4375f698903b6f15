"""Pallas kernel: fused int8 corpus scan + running top-k.

The XLA path materialises the full ``[B, N]`` score matrix to HBM between
the matmul and the top-k (measured ~6 ms/step for B=256, N=262k on v5e —
dominated by that round-trip). This kernel keeps scores in VMEM: the corpus
streams through in ``[TN, D]`` int8 tiles, each tile's scores are reduced
into a per-query running top-k scratch, and only ``[B, K]`` ever leaves the
chip. HBM traffic drops from ``N·D + 2·B·N·4`` to ``N·D`` bytes — the
speed-of-light for this op (read the corpus once).

Layout:
  * grid = (B/TB, N/TN); the corpus axis is innermost so the running
    top-k scratch carries across corpus tiles for one query tile.
  * per step: ``scores = dot(q8[TB,D], tile[TN,D]^T)`` on the MXU with
    int32 accumulation, rescaled to f32, then merged with the running
    ``[TB, K]`` best via ``jax.lax.top_k`` over the concatenation.
  * padding rows (scale 0) score exactly 0; real corpus vectors are
    L2-normalised with non-zero norm, so callers must treat score<=0 as
    "no match" when N is padded (or mask afterwards by index < n_real).

Used on TPU; ``fused_int8_topk`` falls back to the plain XLA path on other
backends (and is what the interpret-mode tests exercise).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: corpus rows per tile (int8 tile of 2048×384 = 768 KB VMEM)
TILE_N = 2048
#: corpus rows per tile at CAP scale (int8 tile of 8192×384 = 3 MB VMEM).
#: Fewer grid steps amortise the per-tile filter-column loads: measured on
#: v5e at 8.4M×384, 8.42 ms/256-query batch (2.14x HBM floor) vs 9.03 ms
#: (2.30x) at TILE_N (bench_results/scantune_r03: tb256_tn8192 vs tb256).
TILE_N_BIG = 8192
#: corpus size above which the big tile pays for itself
_BIG_N = 1 << 22  # 4.2M rows


def auto_tile_n(n: int) -> int:
    """Serving tile size for an ``n``-row corpus: ``TILE_N_BIG`` when the
    corpus is big enough to amortise the larger tile AND divisible by it
    (the engine pads with :func:`pad_align_for`), else ``TILE_N``. The
    lane family of a row is ``row % lanes`` under EITHER tile size (the
    lane-major column layout fixes it globally), so results are
    bit-identical across tile sizes — only grid-step overhead changes."""
    if n >= _BIG_N and n % TILE_N_BIG == 0:
        return TILE_N_BIG
    return TILE_N


def pad_align_for(n: int) -> int:
    """Row alignment the engine should pad an ``n``-row corpus to so the
    fused scan gets its preferred tile (multiples of TILE_N_BIG are also
    TILE_N multiples, so every existing divisibility gate still holds)."""
    return TILE_N_BIG if n >= _BIG_N else TILE_N
#: query rows per tile. 256 keeps the serving batch in ONE query tile, so
#: the corpus streams ONCE per batch — measured on v5e at 8.4M×384:
#: 9.03 ms/batch (2.30x HBM floor) vs 10.98 ms (2.79x) with two 128-row
#: tiles (bench_results/capscale_r03: tb256 vs base_tb128). VMEM holds:
#: the [256, 2048] int32 accumulator is 2 MB and per-slice work stays
#: stride-lanes wide.
TILE_B = 256


def _scan_kernel(
    q8_ref,  # [TB, D] int8
    qscale_ref,  # [TB, 1] f32
    tile_ref,  # [TN, D] int8
    tscale_ref,  # [TN, 1] f32
    out_v_ref,  # [TB, K] f32
    out_i_ref,  # [TB, K] int32
    run_v,  # scratch [TB, K] f32
    run_i,  # scratch [TB, K] int32
    *,
    k: int,
    tile_n: int,
):
    n_idx = pl.program_id(1)
    num_n = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _init():
        run_v[:] = jnp.full_like(run_v[:], -jnp.inf)
        run_i[:] = jnp.full_like(run_i[:], -1)

    # int8 × int8 → int32 on the MXU
    acc = jax.lax.dot_general(
        q8_ref[:],
        tile_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = (
        acc.astype(jnp.float32)
        * qscale_ref[:]  # [TB, 1]
        * tscale_ref[:].reshape(1, -1)  # [1, TN]
    )
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    global_idx = col + n_idx * tile_n

    # Mosaic has no top_k/sort/gather lowering; select the new running
    # top-k by K passes of (max, masked-argmin-of-position, mask-out) —
    # pure elementwise + reductions, fully vectorised on the VPU.
    merged_v = jnp.concatenate([run_v[:], scores], axis=1)  # [TB, K+TN]
    merged_i = jnp.concatenate([run_i[:], global_idx], axis=1)
    mcol = jax.lax.broadcasted_iota(jnp.int32, merged_v.shape, 1)
    width = merged_v.shape[1]
    new_v = []
    new_i = []
    for _ in range(k):
        m = jnp.max(merged_v, axis=1, keepdims=True)  # [TB, 1]
        is_max = merged_v >= m
        # first occurrence (deterministic tie-break to the lower position,
        # which — running values first, ascending global idx after —
        # preserves lax.top_k's lower-index-wins order)
        pos = jnp.min(jnp.where(is_max, mcol, width), axis=1, keepdims=True)
        sel = mcol == pos
        idx = jnp.max(jnp.where(sel, merged_i, -1), axis=1)
        new_v.append(m[:, 0])
        new_i.append(idx)
        merged_v = jnp.where(sel, -jnp.inf, merged_v)
    run_v[:] = jnp.stack(new_v, axis=1)
    run_i[:] = jnp.stack(new_i, axis=1)

    @pl.when(n_idx == num_n - 1)
    def _flush():
        out_v_ref[:] = run_v[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_b", "tile_n"))
def pallas_int8_topk(
    q8: jax.Array,  # [B, D] int8
    q_scale: jax.Array,  # [B, 1] f32
    corpus_q: jax.Array,  # [N, D] int8 (N % tile_n == 0)
    corpus_scale: jax.Array,  # [N, 1] f32
    k: int = 10,
    tile_b: int = TILE_B,
    tile_n: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    B, D = q8.shape
    N = corpus_q.shape[0]
    if tile_n is None:
        tile_n = auto_tile_n(N)
    if B % tile_b != 0:
        tile_b = B  # small batches: single query tile
    if N % tile_n != 0:
        raise ValueError(f"corpus rows {N} not divisible by tile_n {tile_n}")

    grid = (B // tile_b, N // tile_n)
    kernel = functools.partial(_scan_kernel, k=k, tile_n=tile_n)
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda b, n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda b, n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, k), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, k), jnp.float32),
            pltpu.VMEM((tile_b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D + B * D + 4 * B * k * 2,
            transcendentals=0,
        ),
    )(q8, q_scale, corpus_q, corpus_scale)
    return out_v, out_i


def pack_court_words(court_table: jax.Array) -> jax.Array:
    """Pack a ``[B, V]`` bool allowed-court table into ``[B, W]`` uint32
    bitmask words (``W = ceil(V/32)``). The fused kernel applies the court
    filter as W elementwise bitmask passes instead of a ``[B, N]`` gather
    (Mosaic has no dynamic-gather lowering) or a ``[B, V]×[V, N]`` one-hot
    matmul (30%+ extra MXU work at V=128)."""
    B, V = court_table.shape
    W = max(1, -(-V // 32))
    ct = jnp.pad(court_table, ((0, 0), (0, W * 32 - V)))
    bits = ct.reshape(B, W, 32).astype(jnp.uint32) << jnp.arange(
        32, dtype=jnp.uint32
    )
    # bits are disjoint, so sum == bitwise-or
    return bits.sum(axis=-1, dtype=jnp.uint32)


def _fused_scan_kernel(
    q8_ref,  # [TB, D] int8
    qscale_ref,  # [TB, 1] f32
    qwords_ref,  # [TB, W] int32 allowed-court bitmask words
    qdlo_ref,  # [TB, 1] f32 date lower bound (inclusive, f32-exact)
    qdhi_ref,  # [TB, 1] f32 date upper bound (inclusive, f32-exact)
    qmins_ref,  # [TB, 1] f32 similarity threshold
    tile_ref,  # [TN, D] int8
    tscale_ref,  # [TN/lanes, lanes] f32 — lane-major (see wrapper)
    tcword_ref,  # [TN/lanes, lanes] int32 court word index per chunk
    tcbit_ref,  # [TN/lanes, lanes] int32 court bit per chunk
    tdate_ref,  # [TN/lanes, lanes] f32 decision date per chunk (f32-exact)
    out_v_ref,  # [TB, T·lanes] f32 running top-T-per-lane scores
    out_i_ref,  # [TB, T·lanes] int32 global row index per candidate
    *,
    tile_n: int,
    lanes: int,
    n_words: int,
    n_keep: int,
    use_date: bool,
):
    """Fused int8 scan + metadata filters + running top-T-per-lane.

    The corpus axis is the INNER grid dimension, so the per-query-tile
    output block stays resident in VMEM across the whole corpus stream and
    doubles as the accumulator: each step bubble-inserts its ``tile_n``
    filtered scores into per-lane sorted top-``T`` lists. Only ``T·lanes``
    candidates per query ever leave the kernel — the round-1 layout wrote
    ``lanes`` candidates per corpus tile ([num_n, B, lanes]: 134 MB per
    512k-row slab at B=256, which XLA spilled to scoped VMEM and OOM'd).

    Mosaic VMEM discipline (all measured on v5e via the remote compiler):
    scoring, filtering, and inserting happen per stride-``lanes`` slice,
    never on full [TB, TN] tensors — full-width filter compares cost
    ~100 MB of scoped VMEM and fail to compile; per-row columns arrive
    lane-major ([rows/lanes, lanes], element (r, l) = row r·lanes+l) so
    their blocks tile (8,128) exactly — a (TN, 1) column block pads to
    lanes·TN·4 bytes (1 MB each at TN=2048).

    Accuracy = approx_max_k at reduction ratio N/(T·lanes): a true top-k
    entry is lost only when ``T`` better rows share its lane (PAPERS.md
    TPU-KNN).
    """
    n_idx = pl.program_id(1)

    @pl.when(n_idx == 0)
    def _init():
        out_v_ref[:] = jnp.full(out_v_ref.shape, -jnp.inf, jnp.float32)
        out_i_ref[:] = jnp.full(out_i_ref.shape, -1, jnp.int32)

    # int8 × int8 → int32 on the MXU
    acc = jax.lax.dot_general(
        q8_ref[:],
        tile_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    nb = tile_n // lanes
    rv = [out_v_ref[:, t * lanes : (t + 1) * lanes] for t in range(n_keep)]
    ri = [out_i_ref[:, t * lanes : (t + 1) * lanes] for t in range(n_keep)]
    lane = jax.lax.broadcasted_iota(jnp.int32, rv[0].shape, 1)
    for j in range(nb):
        # rescale to f32 cosine for this lane slice
        s = (
            acc[:, j * lanes : (j + 1) * lanes].astype(jnp.float32)
            * qscale_ref[:]
            * tscale_ref[j : j + 1, :]
        )
        # similarity threshold is always on; court/date masks compile away
        # entirely when the caller proves the batch has no such filter
        # (n_words == 0 / use_date=False) — the per-slice mask ops are a
        # real share of the VPU work on an otherwise compute-bound scan
        keep = s >= qmins_ref[:]
        if n_words:
            # court filter: W bitmask passes (parity with ops/hybrid's
            # take(court_table, chunk_court)). int32 bit ops, not uint32:
            # the two's-complement &/!=0 is identical and Mosaic compiles
            # the int32 form ~30x faster (measured 102s → 3s).
            court_ok = jnp.zeros(s.shape, jnp.bool_)
            for w in range(n_words):
                qw = qwords_ref[:, w : w + 1]  # [TB, 1] int32
                court_ok = court_ok | (
                    ((qw & tcbit_ref[j : j + 1, :]) != 0)
                    & (tcword_ref[j : j + 1, :] == w)
                )
            keep = keep & court_ok
        if use_date:
            # date compare in f32 (values are f32-exact by the columns
            # contract — see MetadataColumns.encode_date_range)
            dtj = tdate_ref[j : j + 1, :]
            keep = keep & (dtj >= qdlo_ref[:]) & (dtj <= qdhi_ref[:])
        s = jnp.where(keep, s, -jnp.inf)
        # bubble-insert into the per-lane sorted top-T lists held in the
        # output block. Strict '>' keeps the earlier (lower-row-id) entry
        # on ties — the determinism promise within a lane. Same-case
        # contiguous chunks land in different lanes, so they rarely
        # collide — good for the downstream dedup-by-case.
        gi = n_idx * tile_n + j * lanes + lane
        for t in range(n_keep):
            gt = s > rv[t]
            nv, niv = jnp.where(gt, s, rv[t]), jnp.where(gt, gi, ri[t])
            s, gi = jnp.where(gt, rv[t], s), jnp.where(gt, ri[t], gi)
            rv[t], ri[t] = nv, niv
    for t in range(n_keep):
        out_v_ref[:, t * lanes : (t + 1) * lanes] = rv[t]
        out_i_ref[:, t * lanes : (t + 1) * lanes] = ri[t]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile_b", "tile_n", "lanes", "interpret", "use_court",
        "use_date",
    ),
)
def pallas_fused_topk(
    q8: jax.Array,  # [B, D] int8 quantised queries
    q_scale: jax.Array,  # [B, 1] f32
    corpus_q: jax.Array,  # [N, D] int8 (N % tile_n == 0)
    corpus_scale: jax.Array,  # [N, 1] f32
    chunk_court: jax.Array,  # [N] int32 court id per chunk
    chunk_date: jax.Array,  # [N] int32 decision date per chunk
    court_table: jax.Array,  # [B, V] bool allowed-court table
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    min_sim: jax.Array,  # [B] f32
    k: int,
    tile_b: int = TILE_B,
    tile_n: Optional[int] = None,
    lanes: int = 128,
    interpret: bool = False,
    use_court: bool = True,
    use_date: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Fused filtered scan + top-k: the TPU serving path of
    ``ops.hybrid.fused_hybrid_topk`` (round-1 VERDICT item 4).

    HBM traffic is ``num_b·N·D`` int8 (the corpus streams once per query
    tile) plus ``8·B·T·lanes`` candidate bytes out — the [B, N] f32 score
    matrix of the XLA path (``2·4·B·N`` write+read) never exists, and
    neither does a per-corpus-tile candidate array (the accumulator lives
    in the resident output block). Approximate at the lane-family level
    (a true top-k entry is lost only when ``T`` better rows share its
    lane); returns ``(values, global indices) [B, k]`` with filtered rows
    at ``(-inf, -1)``.

    ``use_court=False`` / ``use_date=False`` are STATIC promises that no
    query in the batch carries that filter — the mask ops compile away
    (the scan is VPU-heavy; callers that can prove filter absence
    host-side should say so).
    """
    B, D = q8.shape
    N = corpus_q.shape[0]
    if tile_n is None:
        tile_n = auto_tile_n(N)
    if B % tile_b != 0:
        tile_b = B  # small batches: single query tile
    if N % tile_n != 0 or tile_n % lanes != 0:
        raise ValueError(
            f"N={N} must divide by tile_n={tile_n}, tile_n by lanes={lanes}"
        )
    qwords = jax.lax.bitcast_convert_type(
        pack_court_words(court_table), jnp.int32
    )
    W = qwords.shape[1]
    # per-row columns go lane-major [N/lanes, lanes] (element (r, l) = row
    # r·lanes+l): blocks tile (8,128) exactly — see the kernel docstring
    cword = (chunk_court.astype(jnp.int32) // 32).reshape(N // lanes, lanes)
    cbit = jax.lax.bitcast_convert_type(
        jnp.uint32(1) << (chunk_court.astype(jnp.uint32) % 32), jnp.int32
    ).reshape(N // lanes, lanes)
    dts = chunk_date.astype(jnp.float32).reshape(N // lanes, lanes)
    num_n, num_b = N // tile_n, B // tile_b
    # top-T per lane: enough slots to hold k plus one collision layer
    n_keep = min(max(2, -(-k // lanes) + 1), tile_n // lanes)

    kernel = functools.partial(
        _fused_scan_kernel, tile_n=tile_n, lanes=lanes,
        n_words=W if use_court else 0, n_keep=n_keep, use_date=use_date,
    )
    # corpus axis INNER: the per-query-tile output block stays resident in
    # VMEM as the running accumulator while the corpus streams; the corpus
    # is re-read once per query tile (num_b = B/tile_b passes — still far
    # cheaper than materialising per-tile candidates).
    q_map = lambda b, n: (b, 0)  # noqa: E731
    t_map = lambda b, n: (n, 0)  # noqa: E731
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=(num_b, num_n),
        in_specs=[
            pl.BlockSpec((tile_b, D), q_map),
            pl.BlockSpec((tile_b, 1), q_map),
            pl.BlockSpec((tile_b, W), q_map),
            pl.BlockSpec((tile_b, 1), q_map),
            pl.BlockSpec((tile_b, 1), q_map),
            pl.BlockSpec((tile_b, 1), q_map),
            pl.BlockSpec((tile_n, D), t_map),
            pl.BlockSpec((tile_n // lanes, lanes), t_map),
            pl.BlockSpec((tile_n // lanes, lanes), t_map),
            pl.BlockSpec((tile_n // lanes, lanes), t_map),
            pl.BlockSpec((tile_n // lanes, lanes), t_map),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, n_keep * lanes), q_map),
            pl.BlockSpec((tile_b, n_keep * lanes), q_map),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_keep * lanes), jnp.float32),
            jax.ShapeDtypeStruct((B, n_keep * lanes), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=num_b * N * D + B * D + 8 * B * n_keep * lanes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        q8,
        q_scale.astype(jnp.float32).reshape(B, 1),
        qwords,
        date_lo.astype(jnp.float32).reshape(B, 1),
        date_hi.astype(jnp.float32).reshape(B, 1),
        min_sim.astype(jnp.float32).reshape(B, 1),
        corpus_q,
        corpus_scale.astype(jnp.float32).reshape(N // lanes, lanes),
        cword,
        cbit,
        dts,
    )
    kk = min(k, out_v.shape[1])
    # final reduction over the lane-ordered accumulator: composite-key sort
    # so score ties break to the lower global row id across lanes (the repo
    # determinism invariant; lax.top_k alone would break ties by lane/slot
    # position here)
    from .topk import topk_by_score_then_row

    v, i = topk_by_score_then_row(out_v, out_i, kk)
    return v, jnp.where(jnp.isneginf(v), -1, i)


def _probe_kernel(
    # scalar-prefetch refs (SMEM — dynamically indexable by program id):
    ids_ref,  # [B, NP] int32 probed partition per query
    qdlo_ref,  # [B] int32
    qdhi_ref,  # [B] int32
    qmins_ref,  # [B] f32
    qscale_ref,  # [B] f32
    qwords_ref,  # [B, W] uint32
    # tensor blocks:
    q8_ref,  # [B, D] int8 (full array — tiny)
    pint8_ref,  # [1, m, D] int8 — THE probed partition block (DMA'd by index)
    pscale_ref,  # [1, 1, m] f32
    prows_ref,  # [1, 1, m] int32 global row ids (-1 pad)
    pcword_ref,  # [1, 1, m] int32 court word index per slot
    pcbit_ref,  # [1, 1, m] uint32 court bit per slot
    pdate_ref,  # [1, 1, m] int32 decision date per slot
    out_v_ref,  # [1, 1, 2, lanes] f32 (top-2 per lane)
    out_s_ref,  # [1, 1, 2, lanes] int32 slot-within-partition per candidate
    *,
    m: int,
    lanes: int,
    n_words: int,
):
    """Partitioned-ANN probe step: score ONE query against ONE probed
    partition block, filters fused, block-reduced to ``lanes`` candidates.

    The partition id comes from the scalar-prefetched ``ids`` array, so the
    pipeline DMAs exactly the probed ``[m, D]`` int8 blocks from HBM — the
    XLA equivalent (``jnp.take(part_int8, top_p)``) materialises the same
    gather through a copy hundreds of times slower (measured 400 ms/16
    queries at 8.4M rows). Per-slot filter columns are pre-laid-out in
    partition-major order by the caller, so every input is a contiguous
    block keyed by the same prefetched index. Per-query scalars live in
    SMEM (scalar prefetch) — VMEM blocks cannot legally be 1-row tiles.

    The whole (small) query batch is scored against the block on the MXU
    and the current query's row is selected with a one-hot matvec — Mosaic
    has no dynamic sublane indexing, and the MXU is idle anyway (the step
    is DMA-bound). int32 scores ≤ 127·127·D stay exact in f32 for D ≤ 1040.
    """
    b = pl.program_id(0)
    acc = jax.lax.dot_general(
        q8_ref[:],  # [B, D]
        pint8_ref[0],  # [m, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, m]
    # select query b's row with an exact int32 masked reduction (a f32
    # one-hot matvec would ride the MXU at bf16 precision — measured ~0.3%
    # score drift vs interpret mode; int32 adds are exact and B is tiny)
    bidx = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)  # [B, m]
    row = jnp.sum(
        jnp.where(bidx == b, acc, 0), axis=0, keepdims=True
    )  # [1, m] int32
    scores = row.astype(jnp.float32) * qscale_ref[b] * pscale_ref[0]

    cb = pcbit_ref[0]  # [1, m] uint32
    cw = pcword_ref[0]  # [1, m] int32
    court_ok = jnp.zeros(scores.shape, jnp.bool_)
    for w in range(n_words):
        qw = qwords_ref[b, w]  # scalar uint32
        court_ok = court_ok | (((qw & cb) != 0) & (cw == w))
    dts = pdate_ref[0]
    date_ok = (dts >= qdlo_ref[b]) & (dts <= qdhi_ref[b])
    keep = (
        court_ok & date_ok
        & (prows_ref[0] >= 0)
        & (scores >= qmins_ref[b])
    )
    scores = jnp.where(keep, scores, -jnp.inf)

    # Running TOP-2 per lane over the nb sub-blocks: clustered corpora put
    # a query's whole true top-k in one partition, and with top-1-per-lane
    # two true hits ``lanes`` slots apart collide (measured recall@10
    # ~0.96 on exactly-clustered data). Top-2 needs THREE top-k rows in
    # one lane to lose one (~1e-3).
    nb = m // lanes
    red_v1 = scores[:, :lanes]
    red_j1 = jnp.zeros(red_v1.shape, jnp.int32)
    red_v2 = jnp.full(red_v1.shape, -jnp.inf, jnp.float32)
    red_j2 = jnp.zeros(red_v1.shape, jnp.int32)
    for j in range(1, nb):
        s = scores[:, j * lanes : (j + 1) * lanes]
        gt1 = s > red_v1
        # loser of the slot-1 contest competes for slot 2
        c2_v = jnp.where(gt1, red_v1, s)
        c2_j = jnp.where(gt1, red_j1, j)
        red_v1 = jnp.where(gt1, s, red_v1)
        red_j1 = jnp.where(gt1, j, red_j1)
        gt2 = c2_v > red_v2
        red_v2 = jnp.where(gt2, c2_v, red_v2)
        red_j2 = jnp.where(gt2, c2_j, red_j2)
    lane = jax.lax.broadcasted_iota(jnp.int32, red_v1.shape, 1)
    out_v_ref[0, 0, :, :] = jnp.concatenate([red_v1, red_v2], axis=0)
    out_s_ref[0, 0, :, :] = jnp.concatenate(
        [red_j1 * lanes + lane, red_j2 * lanes + lane], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("lanes", "interpret")
)
def pallas_probe_candidates(
    q8: jax.Array,  # [B, D] int8
    q_scale: jax.Array,  # [B, 1] f32
    top_p: jax.Array,  # [B, NP] int32 probed partition ids
    part_int8: jax.Array,  # [P, m, D] int8
    part_scale: jax.Array,  # [P, m] f32
    part_rows: jax.Array,  # [P, m] int32 (-1 pad)
    part_cword: jax.Array,  # [P, m] int32 court word index per slot
    part_cbit: jax.Array,  # [P, m] uint32 court bit per slot
    part_date: jax.Array,  # [P, m] int32
    qwords: jax.Array,  # [B, W] uint32 (pack_court_words)
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    min_sim: jax.Array,  # [B] f32
    lanes: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Scalar-prefetch probe scan. Returns ``(values, slots)`` each
    ``[B, NP·2·lanes]`` — top-2-per-lane filtered candidates per probed
    partition; ``slots`` index into the partition's ``m`` axis (caller maps
    to global rows via ``part_rows[top_p, slot]``)."""
    B, D = q8.shape
    P, m = part_scale.shape
    NP = top_p.shape[1]
    if m % lanes != 0:
        raise ValueError(f"partition size {m} not divisible by lanes {lanes}")
    W = qwords.shape[1]
    kernel = functools.partial(
        _probe_kernel, m=m, lanes=lanes, n_words=W
    )
    # slot-column arrays get a singleton middle dim so the per-step block's
    # trailing dims (1, m) EQUAL the array's (Mosaic's tiling rule)
    # index maps receive (grid indices, *all scalar-prefetch refs)
    full_map = lambda b, p, ids, *_: (0, 0)  # noqa: E731
    blk_map = lambda b, p, ids, *_: (ids[b, p], 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B, NP),
        in_specs=[
            pl.BlockSpec((B, D), full_map),
            pl.BlockSpec((1, m, D), blk_map),
            pl.BlockSpec((1, 1, m), blk_map),
            pl.BlockSpec((1, 1, m), blk_map),
            pl.BlockSpec((1, 1, m), blk_map),
            pl.BlockSpec((1, 1, m), blk_map),
            pl.BlockSpec((1, 1, m), blk_map),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 2, lanes), lambda b, p, ids, *_: (b, p, 0, 0)),
            pl.BlockSpec((1, 1, 2, lanes), lambda b, p, ids, *_: (b, p, 0, 0)),
        ),
    )
    out_v, out_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, NP, 2, lanes), jnp.float32),
            jax.ShapeDtypeStruct((B, NP, 2, lanes), jnp.int32),
        ),
        interpret=interpret,
    )(
        # scalar-prefetch operands (order matches the kernel's refs)
        top_p.astype(jnp.int32),
        date_lo.astype(jnp.int32).reshape(B),
        date_hi.astype(jnp.int32).reshape(B),
        min_sim.astype(jnp.float32).reshape(B),
        q_scale.astype(jnp.float32).reshape(B),
        qwords,
        # tensor operands
        q8,
        part_int8,
        part_scale.astype(jnp.float32).reshape(P, 1, m),
        part_rows.astype(jnp.int32).reshape(P, 1, m),
        part_cword.reshape(P, 1, m),
        part_cbit.reshape(P, 1, m),
        part_date.astype(jnp.int32).reshape(P, 1, m),
    )
    return out_v.reshape(B, NP * 2 * lanes), out_s.reshape(B, NP * 2 * lanes)


def _gather_row_align(dt) -> int:
    """Sublane tiling of an ``[N, D]`` HBM array for ``dt``: the minimum
    row count/alignment Mosaic accepts for a dim-0 DMA slice (f32 8,
    bf16 16, int8 32)."""
    return 8 * (4 // max(np.dtype(dt).itemsize, 1)) or 8


def _make_gather_gang_kernel(
    seg_rows: tuple[int, ...], C: int, D: int, A: int
):
    """Kernel factory: one grid step per QUERY. The step issues all ``C``
    candidate-group DMAs back-to-back on ONE semaphore (maximum overlap —
    the previous design ran one row per grid step, paying ~µs of grid +
    wait latency per row, ×S segments: a flat ~40 ms/batch at B=32 on
    v5e), drains them, then scores every gathered row in a single bf16
    MXU dot.

    Each DMA moves an ``[A, D]`` tile-ALIGNED row group (A = sublane
    tiling: 16 for bf16): Mosaic rejects unaligned dim-0 slices of a
    tiled HBM array ("slice shape must be aligned to tiling"), and the
    aligned group is the physical HBM layout unit anyway — a single
    logical row is interleaved across its (A, 128) tiles, so gathering
    the whole group is the same memory traffic. ``ids_ref`` holds the
    GROUP-start row of each candidate (wrapper-computed, clamped inside
    its segment); the wrapper selects the candidate's row from the
    group's scores afterwards."""
    S = len(seg_rows)

    def kernel(ids_ref, q_ref, *rest):
        seg_refs = rest[:S]
        out_ref = rest[S]
        scratch = rest[S + 1]  # VMEM [C*A, D], segment dtype
        sem = rest[S + 2]  # ONE DMA semaphore for all C copies
        b = pl.program_id(0)

        def issue(c, carry):
            gstart = ids_ref[b, c]
            base = 0
            for s in range(S):
                local = gstart - base

                @pl.when((local >= 0) & (local < seg_rows[s]))
                def _start(s=s, local=local, c=c):
                    # wrapper guarantees group starts are A-aligned;
                    # multiple_of carries the proof Mosaic needs for a
                    # dynamic dim-0 offset into a tiled HBM memref
                    pltpu.make_async_copy(
                        seg_refs[s].at[pl.ds(pl.multiple_of(local, A), A), :],
                        scratch.at[pl.ds(c * A, A), :],
                        sem,
                    ).start()

                base += seg_rows[s]
            return carry

        jax.lax.fori_loop(0, C, issue, 0)

        def drain(c, carry):
            # every copy is one [A, D] group — identical byte count, so
            # any segment's descriptor drains any copy on the shared sem
            pltpu.make_async_copy(
                seg_refs[0].at[pl.ds(0, A), :],
                scratch.at[pl.ds(c * A, A), :],
                sem,
            ).wait()
            return carry

        jax.lax.fori_loop(0, C, drain, 0)

        q = q_ref[...].reshape(1, D).astype(scratch.dtype)
        scores = jax.lax.dot_general(
            q, scratch[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, C*A]
        out_ref[...] = scores.reshape(1, 1, C * A)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_gather_rescore(
    queries: jax.Array,  # [B, D] f32 (L2-normalised)
    corpus: jax.Array,  # [N, D] bf16/f32 full-precision corpus
    candidate_idx: jax.Array,  # [B, C] int32 candidate rows (clipped >= 0)
    interpret: bool = False,
) -> jax.Array:
    """ANN rescore stage as a ganged scalar-prefetch gather: DMA exactly
    the ``B·C`` candidate rows (all ``C`` of a query's rows in flight at
    once) and score them in one bf16 MXU dot per query — ``[B, C]`` f32.

    The XLA equivalent (``jnp.take`` + einsum, ops/scoring.gather_rescore)
    lowers the dynamic row gather to a full-corpus pass on TPU — measured
    ~124 ms at 8.4M×384 bf16 for ANY candidate count (the whole round-2
    "latency-regime saturates at 6.4k QPS" ceiling was this constant;
    probetune_r03.jsonl: every (P, m, nprobe) config ≈124 ms). Here the
    pipeline reads ``B·C`` rows (~2 MB at B=32, C=40) instead of the
    6.4 GB corpus.

    ``corpus`` may be a tuple of row segments (see
    :func:`split_rescore_corpus`): Mosaic block-offset addressing caps a
    single input at ~4 GiB (measured: 3.2 GB compiles, 6.4 GB crashes the
    remote compiler), so CAP-scale stores split. Segments stay in HBM
    (``memory_space=ANY``); the kernel picks each group's segment with a
    predicated DMA — exactly one fires per candidate, so the shared
    semaphore sees exactly ``C`` group-sized signals per query.

    The DMA unit is an ``[A, D]`` tile-aligned row group (A = sublane
    tiling, 16 for bf16 — both a Mosaic alignment requirement and the
    physical HBM layout unit); the wrapper computes each candidate's
    group start (clamped inside its segment, so ragged final segments
    need no padding) and picks the candidate's own score out of the
    group afterwards.

    Matches the XLA path's numerics exactly: query cast to the corpus
    dtype, f32 MXU accumulation."""
    segs = tuple(corpus) if isinstance(corpus, (tuple, list)) else (corpus,)
    B, D = queries.shape
    C = candidate_idx.shape[1]
    seg_rows = tuple(int(s.shape[0]) for s in segs)
    total = sum(seg_rows)
    dt = segs[0].dtype
    A = _gather_row_align(dt)
    if min(seg_rows) < A or any(r % A for r in seg_rows):
        # a segment smaller than one tile group can't be group-gathered,
        # and a ragged (non-A-multiple) segment would force the group
        # clamp below to a NON-aligned start (clip(..., 0, n-A) with
        # n % A != 0), breaking the pl.multiple_of alignment proof the
        # compiled kernel relies on — silently wrong DMAs on TPU.
        # split_rescore_corpus pads store segments to the 32-row lcm so
        # the serving path never lands here; hand-built segments demote
        # to the exact XLA gather.
        from .scoring import gather_rescore as _xla_gather

        return _xla_gather(queries, segs, candidate_idx)
    # clamp into [0, total): guarantees exactly one predicated DMA fires
    # per candidate (an out-of-range id would leave the semaphore short
    # and hang the drain loop)
    idx = jnp.clip(candidate_idx.astype(jnp.int32), 0, total - 1)
    # per-candidate aligned group start + in-group offset, segment-aware:
    # the group is clamped to end inside its segment, so `off` ∈ [0, A)
    gstart = jnp.zeros_like(idx)
    off = jnp.zeros_like(idx)
    base = 0
    for s, n in enumerate(seg_rows):
        local = idx - base
        blk = jnp.clip((local // A) * A, 0, n - A)
        inseg = (local >= 0) & (local < n)
        gstart = jnp.where(inseg, base + blk, gstart)
        off = jnp.where(inseg, local - blk, off)
        base += n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda b, ids: (b, 0, 0)),
            *[
                pl.BlockSpec(memory_space=pltpu.ANY)
                for _ in segs
            ],
        ],
        out_specs=pl.BlockSpec((1, 1, C * A), lambda b, ids: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((C * A, D), dt),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _make_gather_gang_kernel(seg_rows, C, D, A),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, C * A), jnp.float32),
        interpret=interpret,
    )(
        gstart,
        queries.astype(dt).reshape(B, 1, D),
        *segs,
    )
    group_scores = out.reshape(B, C, A)
    return jnp.take_along_axis(
        group_scores, off[..., None], axis=2
    )[..., 0]


#: Mosaic addresses block offsets within one input at most ~4 GiB deep
#: (measured on v5e: 3.2 GB rescore corpus compiles, 6.4 GB crashes the
#: remote compiler). 2 GiB segments sit comfortably inside the proven
#: region for any D.
GATHER_SEG_BYTES = 1 << 31

#: lcm of every :func:`_gather_row_align` value (f32 8, bf16 16, int8 32):
#: store segments sized to this multiple keep the gather kernel's aligned
#: group starts provable for ANY element dtype — the final ragged segment
#: pads up with zero rows (consumers mask rows >= the real count).
GATHER_ROW_ALIGN_LCM = 32


def split_rescore_corpus(v, to_device=None) -> tuple:
    """Split an ``[N, D]`` rescore corpus (numpy or jax) into row segments
    each under :data:`GATHER_SEG_BYTES`, as a tuple. Returns a 1-tuple
    when it already fits. ``to_device`` (optional callable) maps each
    numpy segment onto the device — splitting BEFORE the transfer keeps
    host copies at one segment.

    Every returned segment's row count is a multiple of
    :data:`GATHER_ROW_ALIGN_LCM` (the tail segment zero-pads): the
    compiled gather kernel computes each candidate's group start as
    ``(local // A) * A`` and proves it A-aligned to Mosaic, which only
    holds when no clamp against a ragged segment end is ever needed.
    Full-scan consumers must mask rows at or beyond the real row count
    (zero pad rows score 0.0, which can outrank negative true scores)."""
    n, d = v.shape
    itemsize = int(np.dtype(v.dtype).itemsize)
    L = GATHER_ROW_ALIGN_LCM
    rows = max(L, (GATHER_SEG_BYTES // max(d * itemsize, 1)) // L * L)
    if to_device is None:
        to_device = lambda x: x  # noqa: E731
    xp = jnp if isinstance(v, jax.Array) else np

    def _seg(lo: int) -> "np.ndarray":
        seg = v[lo : min(lo + rows, n)]
        r = int(seg.shape[0]) % L
        if r:
            seg = xp.concatenate(
                [seg, xp.zeros((L - r, d), dtype=seg.dtype)]
            )
        return seg

    if n <= rows:
        return (to_device(_seg(0)),)
    return tuple(to_device(_seg(lo)) for lo in range(0, n, rows))


def partition_filter_columns(
    part_rows: jax.Array | "np.ndarray",  # [P, m] int32 (-1 pad)
    chunk_court: jax.Array | "np.ndarray",  # [N] int32
    chunk_date: jax.Array | "np.ndarray",  # [N] int32
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Lay the chunk filter columns out partition-major (one-time, at index
    build/load) so the probe kernel reads contiguous blocks. Pad slots get
    an out-of-range court word (-1) and MISSING date so no filter passes."""
    import numpy as onp

    rows = onp.asarray(part_rows)
    court = onp.asarray(chunk_court)
    date = onp.asarray(chunk_date)
    safe = onp.maximum(rows, 0)
    pc = court[safe].astype(onp.int32)
    pd = date[safe].astype(onp.int32)
    cword = (pc // 32).astype(onp.int32)
    cbit = (onp.uint32(1) << (pc.astype(onp.uint32) % 32))
    pad = rows < 0
    cword[pad] = -1  # matches no bitmask word
    pd[pad] = onp.iinfo(onp.int32).min
    return jnp.asarray(cword), jnp.asarray(cbit), jnp.asarray(pd)


def xla_int8_topk(
    q8: jax.Array,
    q_scale: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Reference XLA path (materialised scores): used for parity tests and
    as the non-TPU fallback."""
    acc = jnp.einsum("bd,nd->bn", q8, corpus_q, preferred_element_type=jnp.int32)
    scores = acc.astype(jnp.float32) * q_scale * corpus_scale.reshape(1, -1)
    return jax.lax.top_k(scores, k)


def fused_int8_topk(
    q8: jax.Array,
    q_scale: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Best available fused scan: Pallas on TPU (when tile-divisible), XLA
    otherwise."""
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and corpus_q.shape[0] % TILE_N == 0:
        return pallas_int8_topk(q8, q_scale, corpus_q, corpus_scale, k)
    return xla_int8_topk(q8, q_scale, corpus_q, corpus_scale, k)
