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

    def finalize(self, shard_names: Sequence[str]) -> FrozenTrie:
        """Sort every spilled window and build the frozen content trie.

        ``shard_names`` are the manifest's shard list — only their spill
        files participate (stale files from an interrupted newer run are
        ignored), in stream order for stable-duplicate parity."""
        L = self.window
        chunks = []
        for name in shard_names:
            p = self.work_dir / f"spill_{name}.npy"
            if p.exists():
                a = np.load(p, mmap_mode="r")
                if len(a):
                    chunks.append(np.asarray(a))
        if chunks:
            recs = np.concatenate(chunks, axis=0)
        else:
            recs = np.zeros((0, L + 2), np.int32)
        del chunks
        W = recs[:, :L]
        rows = recs[:, L]
        paras = recs[:, L + 1]
        if len(recs):
            # lexsort: last key is primary → reversed column order; stable,
            # so duplicate windows keep stream order (postings parity)
            order = np.lexsort(tuple(W[:, c] for c in range(L - 1, -1, -1)))
            W = np.ascontiguousarray(W[order])
            rows = np.ascontiguousarray(rows[order])
            paras = np.ascontiguousarray(paras[order])

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
        if len(recs):
            arrays = _native.csr_from_sorted_windows(
                W, rows, paras, alloc=_alloc
            )
        if arrays is None:
            arrays = csr_from_sorted_windows_py(W, rows, paras)
        else:
            for a in arrays.values():  # flush dirty pages; reopen lazily
                if isinstance(a, np.memmap):
                    a.flush()
        id_to_token = [""] * len(self.vocab)
        for tok, tid in self.vocab.items():
            id_to_token[tid] = tok
        _log.info(
            "spill finalize: %d windows -> %d nodes, %d postings",
            len(recs), len(arrays["is_end"]), len(rows),
        )
        return FrozenTrie(
            vocab=dict(self.vocab), id_to_token=id_to_token, **arrays
        )
