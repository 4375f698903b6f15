"""External-sort content-index build (round-3 scale path).

The pooled trie builders hold every node resident while building —
measured 5.9 GB RSS at 500k chunks (docs/ROADMAP), which caps the content
index near ~1M cases on one host. This module removes the content trie
from the resident set entirely:

  * **spill**: during the streaming build, each content window becomes one
    fixed-width record ``[window tokens (-1 padded), case_row, para]``
    appended to an in-RAM buffer that flushes to a ``.npy`` spill file at
    every shard checkpoint. Only the token→id vocabulary stays resident
    (persisted to JSON at each checkpoint for resume).
  * **sort**: at finalize, the spill files concatenate (sequential read)
    and sort lexicographically by token columns (``np.lexsort``, stable —
    equal windows keep stream order, so postings order matches the pooled
    builders).
  * **build**: the sorted order IS the trie's DFS pre-order, so the frozen
    CSR arrays build in ONE sequential native pass
    (``native.csr_from_sorted_windows``; Python fallback here) with
    O(output) memory — bit-identical to ``TrieBuilder.freeze`` over the
    same windows (parity-tested).

Replays the exact windowing of ``TrieIndex.insert_content`` (word_tokens +
``_phrase_start_positions`` + content_window/max_windows caps) so a spill
build and a pooled build of the same stream agree bit-for-bit.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..core.config import TrieConfig
from .trie import (
    FrozenTrie,
    _phrase_start_positions,
    word_tokens,
)

_log = logging.getLogger("tss_tpu.spill")

_VOCAB_FILE = "spill_vocab.json"


def csr_from_sorted_windows_py(
    W: np.ndarray, rows: np.ndarray, paras: np.ndarray
) -> dict[str, np.ndarray]:
    """Pure-Python equivalent of ``native.csr_from_sorted_windows`` (used
    when the native library is unavailable; also the parity oracle)."""
    n, L = W.shape
    if n == 0:
        from .trie import TrieBuilder

        empty = TrieBuilder().freeze()
        return {f: getattr(empty, f) for f in FrozenTrie._ARRAY_FIELDS}
    depth = np.argmax(W < 0, axis=1)
    depth[(W >= 0).all(axis=1)] = L
    # common prefix length with the previous row, vectorised
    cpl = np.zeros(n, np.int64)
    if n > 1:
        eq = W[1:] == W[:-1]
        run = np.argmin(eq, axis=1)
        run[eq.all(axis=1)] = L
        cpl[1:] = np.minimum(run, depth[1:])
    num_nodes = int(1 + (depth - cpl).sum())

    parent = np.full(num_nodes, -1, np.int32)
    in_token = np.full(num_nodes, -1, np.int32)
    child_count = np.zeros(num_nodes, np.int64)
    post_count = np.zeros(num_nodes, np.int64)
    is_end = np.zeros(num_nodes, bool)
    frequency = np.zeros(num_nodes, np.int32)
    post_case = np.asarray(rows, np.int32).copy()
    post_para = np.asarray(paras, np.int32).copy()

    stack = np.zeros(L + 1, np.int32)
    next_id = 1
    for i in range(n):
        d, c = int(depth[i]), int(cpl[i])
        for t in range(c, d):
            parent[next_id] = stack[t]
            in_token[next_id] = W[i, t]
            child_count[stack[t]] += 1
            stack[t + 1] = next_id
            next_id += 1
        term = stack[d]
        is_end[term] = True
        frequency[term] += 1
        post_count[term] += 1

    edge_offsets = np.zeros(num_nodes + 1, np.int32)
    edge_offsets[1:] = np.cumsum(child_count)
    n_edges = num_nodes - 1
    edge_tokens = np.zeros(max(n_edges, 1), np.int32)
    edge_targets = np.zeros(max(n_edges, 1), np.int32)
    fill = np.zeros(num_nodes, np.int64)
    for nid in range(1, num_nodes):
        p = parent[nid]
        e = edge_offsets[p] + fill[p]
        fill[p] += 1
        edge_tokens[e] = in_token[nid]
        edge_targets[e] = nid
    post_offsets = np.zeros(num_nodes + 1, np.int32)
    post_offsets[1:] = np.cumsum(post_count)

    size = np.ones(num_nodes, np.int64)
    for nid in range(num_nodes - 1, 0, -1):
        size[parent[nid]] += size[nid]
    span_end = np.arange(num_nodes, dtype=np.int64) + size - 1
    subtree_post_end = post_offsets[span_end + 1].astype(np.int32)
    return {
        "edge_offsets": edge_offsets,
        "edge_tokens": edge_tokens[:n_edges],
        "edge_targets": edge_targets[:n_edges],
        "post_offsets": post_offsets,
        "post_case": post_case,
        "post_para": post_para,
        "subtree_post_end": subtree_post_end,
        "is_end": is_end,
        "frequency": frequency,
    }


def _void_keys(W: np.ndarray, L: int) -> np.ndarray:
    """Per-row lexicographic sort key for a window matrix: tokens shift by
    +1 (pad -1 -> 0, monotonic) then pack big-endian so byte-wise ``V``
    comparison equals ``np.lexsort``'s signed column order — one comparable
    scalar per row for the merge's binary searches."""
    return (
        np.ascontiguousarray((W[:, :L].astype(np.int64) + 1).astype(">u4"))
        .view(f"|V{4 * L}")
        .ravel()
    )


class _RunReader:
    """Raw-pread access to one sorted ``.npy`` run.

    Deliberately NOT ``np.load(mmap_mode="r")``: the merge streams every
    run once, and mapped file pages the kernel hasn't reclaimed yet count
    toward the process RSS — the exact number the scale criterion bounds.
    Plain ``seek``+``read`` serves from the page cache without joining the
    resident set, so measured peak RSS reflects real allocations only."""

    def __init__(self, path: Path):
        self.f = open(path, "rb")
        ver = np.lib.format.read_magic(self.f)
        if ver == (1, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(self.f)
        else:
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(self.f)
        assert not fortran and dtype == np.int32
        self.n, self.width = int(shape[0]), int(shape[1])
        self._off = self.f.tell()
        self._rowbytes = 4 * self.width

    def read(self, lo: int, hi: int) -> np.ndarray:
        self.f.seek(self._off + lo * self._rowbytes)
        buf = self.f.read((hi - lo) * self._rowbytes)
        return np.frombuffer(buf, np.int32).reshape(hi - lo, self.width)

    def key_at(self, i: int, L: int) -> bytes:
        # bytes, not np.void: void SCALARS lack comparison ufuncs, while
        # python bytes compare by memcmp — the identical order
        return _void_keys(self.read(i, i + 1), L)[0].tobytes()

    def advance_to(self, c: int, pivot: bytes, L: int) -> int:
        """First index ``>= c`` whose key exceeds ``pivot`` (galloping +
        one in-block binary search; touches O(advance) rows)."""
        n, lo, step = self.n, c, 4096
        while lo < n:
            hi = min(n, lo + step)
            if self.key_at(hi - 1, L) <= pivot:
                lo = hi
                step *= 2
                continue
            ks = _void_keys(self.read(lo, hi), L)
            pv = np.frombuffer(pivot, dtype=ks.dtype)
            return lo + int(np.searchsorted(ks, pv, side="right")[0])
        return n

    def close(self) -> None:
        self.f.close()


def _npy_stream_writer(path: Path, dtype, shape: tuple):
    """Open ``path`` as a streaming ``.npy`` writer: header now, raw
    ``write()`` appends after — dirty pages belong to the page cache, not
    this process's RSS (unlike filling an ``open_memmap``)."""
    f = open(path, "wb")
    np.lib.format.write_array_header_1_0(
        f,
        {
            "descr": np.lib.format.dtype_to_descr(np.dtype(dtype)),
            "fortran_order": False,
            "shape": shape,
        },
    )
    return f


class SpillContentBuilder:
    """Disk-spilled content-trie builder (see module docstring)."""

    def __init__(
        self,
        work_dir: str | Path,
        config: Optional[TrieConfig] = None,
        resume: bool = True,
    ):
        self.config = config or TrieConfig()
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.window = self.config.content_window
        self.max_windows = self.config.max_windows_per_paragraph
        self.mode = getattr(self.config, "content_windowing", "all")
        self.vocab: dict[str, int] = {}
        self._buf: list[np.ndarray] = []
        self._buf_rows = 0
        self.total_windows = 0
        vpath = self.work_dir / _VOCAB_FILE
        if resume and vpath.exists():
            d = json.loads(vpath.read_text())
            self.vocab = d["vocab"]
            self.total_windows = int(d.get("total_windows", 0))
        elif not resume:
            vpath.unlink(missing_ok=True)
            for p in self.work_dir.glob("spill_*.npy"):
                p.unlink()
            for p in self.work_dir.glob("sorted_*.npy"):
                p.unlink()

    # -- build-time ---------------------------------------------------------

    def _ids(self, toks: Sequence[str]) -> list[int]:
        vocab = self.vocab
        out = []
        for t in toks:
            tid = vocab.get(t)
            if tid is None:
                tid = len(vocab)
                vocab[t] = tid
            out.append(tid)
        return out

    def insert_content(
        self, tokens: Sequence[str], case_row: int, para_idx: int = 0
    ) -> None:
        """Same windowing as ``TrieIndex.insert_content`` — records spill
        instead of touching a node pool."""
        toks = word_tokens(" ".join(tokens))
        if not toks:
            return
        ids = self._ids(toks)
        L = self.window
        if self.mode == "all":
            starts = list(range(min(len(ids), self.max_windows)))
        else:
            starts = _phrase_start_positions(toks, self.mode)[
                : self.max_windows
            ]
        recs = np.full((len(starts), L + 2), -1, np.int32)
        for r, s in enumerate(starts):
            w = ids[s : s + L]
            recs[r, : len(w)] = w
            recs[r, L] = case_row
            recs[r, L + 1] = para_idx
        self._buf.append(recs)
        self._buf_rows += len(starts)
        self.total_windows += len(starts)

    def flush(self, shard_name: str) -> None:
        """Write the buffered windows to ``spill_<shard>.npy`` and persist
        the vocabulary — call at every shard checkpoint (crash-safe: the
        spill file is keyed by the shard the manifest records)."""
        path = self.work_dir / f"spill_{shard_name}.npy"
        if self._buf:
            recs = np.concatenate(self._buf, axis=0)
        else:
            recs = np.zeros((0, self.window + 2), np.int32)
        np.save(path, recs)
        self._buf = []
        self._buf_rows = 0
        vpath = self.work_dir / _VOCAB_FILE
        tmp = vpath.with_suffix(".tmp")
        tmp.write_text(json.dumps(
            {"vocab": self.vocab, "total_windows": self.total_windows}
        ))
        tmp.replace(vpath)

    def discard_buffer(self) -> None:
        """Drop unflushed records (resume path: windows after the last
        checkpoint re-stream from storage)."""
        self._buf = []
        self._buf_rows = 0

    # -- finalize -----------------------------------------------------------

    def finalize(
        self, shard_names: Sequence[str], merge_block_rows: int = 1 << 19
    ) -> FrozenTrie:
        """External-sort every spilled window and build the frozen content
        trie with O(block) resident memory (round-4 VERDICT item 4: the
        previous concatenate + full in-RAM ``np.lexsort`` + gather was
        ~3× the spill bytes resident — linear in corpus size, ~50 GB at
        the reference's 65M-chunk scale).

        ``shard_names`` are the manifest's shard list — only their spill
        files participate (stale files from an interrupted newer run are
        ignored), in stream order for stable-duplicate parity. Three
        streaming phases, each crash-safe to re-run:

        1. **run sort** — each spill file stable-lexsorts alone in RAM
           (runs are one shard's windows, ~tens of MB) and caches to
           ``sorted_<shard>.npy`` (mtime-validated, so a resumed finalize
           skips completed runs);
        2. **k-way merge** — pivot-bounded gather rounds: the pivot is the
           smallest ``cursor+block``-th key across runs, every run yields
           its rows ``<= pivot`` (galloped binary search), the gathered
           block stable-lexsorts (runs concatenate in stream order, so
           equal windows keep stream order — the postings-parity
           invariant) and streams to ``sorted_windows/rows/paras.npy``
           via plain ``write()``;
        3. **CSR build** — the native single pass reads the sorted arrays
           memmapped and fills disk-backed outputs.
        """
        L = self.window
        # -- phase 1: per-run sort (cached, mtime-validated) ---------------
        run_paths: list[Path] = []
        total = 0
        for name in shard_names:
            p = self.work_dir / f"spill_{name}.npy"
            if not p.exists():
                continue
            sp = self.work_dir / f"sorted_{name}.npy"
            if not sp.exists() or sp.stat().st_mtime < p.stat().st_mtime:
                a = np.load(p)
                if len(a):
                    order = np.lexsort(
                        tuple(a[:, c] for c in range(L - 1, -1, -1))
                    )
                    a = np.ascontiguousarray(a[order])
                tmp = self.work_dir / f"sorted_{name}.tmp"
                with open(tmp, "wb") as f:
                    np.save(f, a)
                tmp.replace(sp)
            with open(sp, "rb") as f:
                ver = np.lib.format.read_magic(f)
                shape = (
                    np.lib.format.read_array_header_1_0(f)
                    if ver == (1, 0)
                    else np.lib.format.read_array_header_2_0(f)
                )[0]
            if shape[0]:
                run_paths.append(sp)
                total += int(shape[0])

        # -- phase 2: streaming k-way merge ---------------------------------
        w_path = self.work_dir / "sorted_windows.npy"
        r_path = self.work_dir / "sorted_rows.npy"
        p_path = self.work_dir / "sorted_paras.npy"
        if total:
            runs = [_RunReader(p) for p in run_paths]
            cursors = [0] * len(runs)
            fw = _npy_stream_writer(w_path, np.int32, (total, L))
            fr = _npy_stream_writer(r_path, np.int32, (total,))
            fp = _npy_stream_writer(p_path, np.int32, (total,))
            active = list(range(len(runs)))
            written = 0
            while active:
                pivot = min(
                    runs[i].key_at(
                        min(cursors[i] + merge_block_rows, runs[i].n) - 1, L
                    )
                    for i in active
                )
                parts = []
                still = []
                for i in active:  # run order == stream order (stability)
                    e = runs[i].advance_to(cursors[i], pivot, L)
                    if e > cursors[i]:
                        parts.append(runs[i].read(cursors[i], e))
                        cursors[i] = e
                    if cursors[i] < runs[i].n:
                        still.append(i)
                active = still
                blk = parts[0] if len(parts) == 1 else np.concatenate(parts)
                if len(blk) > 1:
                    order = np.lexsort(
                        tuple(blk[:, c] for c in range(L - 1, -1, -1))
                    )
                    blk = blk[order]
                fw.write(np.ascontiguousarray(blk[:, :L]).tobytes())
                fr.write(np.ascontiguousarray(blk[:, L]).tobytes())
                fp.write(np.ascontiguousarray(blk[:, L + 1]).tobytes())
                written += len(blk)
            for rd in runs:
                rd.close()
            for f in (fw, fr, fp):
                f.close()
            assert written == total, (written, total)
            W = np.load(w_path, mmap_mode="r")
            rows = np.load(r_path, mmap_mode="r")
            paras = np.load(p_path, mmap_mode="r")
        else:
            W = np.zeros((0, L), np.int32)
            rows = np.zeros(0, np.int32)
            paras = np.zeros(0, np.int32)

        from .. import native as _native

        # CSR outputs allocate as disk-backed memmaps (multi-GB at CAP
        # scale — ~21 B/node + 8 B/posting must not join the resident
        # set; the frozen trie serves memmapped and save_to_disk streams
        # a sequential copy into the artifact dir)
        csr_dir = self.work_dir / "csr"
        csr_dir.mkdir(parents=True, exist_ok=True)

        def _alloc(name: str, shape: tuple, dtype) -> np.ndarray:
            return np.lib.format.open_memmap(
                csr_dir / f"{name}.npy", mode="w+", dtype=dtype, shape=shape
            )

        arrays = None
        if total:
            arrays = _native.csr_from_sorted_windows(
                W, rows, paras, alloc=_alloc
            )
        if arrays is None:
            arrays = csr_from_sorted_windows_py(
                np.asarray(W), np.asarray(rows), np.asarray(paras)
            )
        else:
            for a in arrays.values():  # flush dirty pages; reopen lazily
                if isinstance(a, np.memmap):
                    a.flush()
        id_to_token = [""] * len(self.vocab)
        for tok, tid in self.vocab.items():
            id_to_token[tid] = tok
        _log.info(
            "spill finalize: %d windows -> %d nodes, %d postings",
            total, len(arrays["is_end"]), total,
        )
        return FrozenTrie(
            vocab=dict(self.vocab), id_to_token=id_to_token, **arrays
        )
