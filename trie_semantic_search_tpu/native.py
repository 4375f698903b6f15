"""ctypes bindings for the native (C++) host kernels.

The reference's host runtime is native (Rust); these bindings expose the
C++ equivalents in ``native/``:

  * :func:`tokenize_spans` / :func:`count_syllables` — text hot loops
  * :class:`NativeWordPiece` — greedy longest-match subword encoder
  * :class:`NativeTrieBuilder` — CSR trie construction at corpus scale,
    producing bit-identical arrays to the Python
    :class:`~trie_semantic_search_tpu.index.trie.TrieBuilder`.

The shared library builds on demand (``make`` in ``native/``); every caller
gates on :func:`available` and falls back to the pure-Python paths, so the
framework works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_log = logging.getLogger("tss_tpu.native")

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libtss_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError) as e:
        _log.warning("native build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB_PATH.exists() and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            _log.warning("native load failed: %s", e)
            _load_failed = True
            return None
        # signatures
        lib.tss_tokenize_spans.restype = ctypes.c_int64
        lib.tss_tokenize_spans.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, _i32p, _i32p, ctypes.c_int64,
        ]
        lib.tss_count_syllables.restype = ctypes.c_int32
        lib.tss_count_syllables.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tss_wp_create.restype = ctypes.c_void_p
        lib.tss_wp_create.argtypes = [
            ctypes.c_char_p, _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ]
        lib.tss_wp_free.argtypes = [ctypes.c_void_p]
        lib.tss_wp_encode_word.restype = ctypes.c_int64
        lib.tss_wp_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, _i32p, ctypes.c_int64,
        ]
        lib.tss_wp_encode_text.restype = ctypes.c_int64
        lib.tss_wp_encode_text.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, _i32p, ctypes.c_int64,
        ]
        lib.tss_tb_create.restype = ctypes.c_void_p
        lib.tss_tb_free.argtypes = [ctypes.c_void_p]
        lib.tss_tb_insert.argtypes = [
            ctypes.c_void_p, _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.tss_tb_insert_windows.argtypes = [
            ctypes.c_void_p, _i32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.tss_tb_sizes.argtypes = [ctypes.c_void_p, _i64p]
        lib.tss_tb_freeze.argtypes = [ctypes.c_void_p] + [_i32p] * 6 + [_i32p, _i8p, _i32p]
        lib.tss_csr_count.restype = ctypes.c_int64
        lib.tss_csr_count.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64]
        lib.tss_csr_fill.argtypes = (
            [_i32p, _i32p, _i32p, ctypes.c_int64, ctypes.c_int64,
             ctypes.c_int64] + [_i32p] * 6 + [_i32p, _i8p, _i32p]
        )
        _lib = lib
        _log.info("native library loaded: %s", _LIB_PATH)
        return _lib


def available() -> bool:
    return _load() is not None


def _as_i32p(a: np.ndarray):
    return a.ctypes.data_as(_i32p)


# ---------------------------------------------------------------------------
# text kernels
# ---------------------------------------------------------------------------


def tokenize_spans(text: str, max_tokens: int = 1 << 20) -> Optional[np.ndarray]:
    """Word spans as byte offsets ``[T, 2]`` into UTF-8 text, or None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode("utf-8")
    starts = np.empty(max_tokens, np.int32)
    ends = np.empty(max_tokens, np.int32)
    n = lib.tss_tokenize_spans(raw, len(raw), _as_i32p(starts), _as_i32p(ends), max_tokens)
    return np.stack([starts[:n], ends[:n]], axis=1)


def count_syllables(word: str) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    raw = word.encode("utf-8")
    return int(lib.tss_count_syllables(raw, len(raw)))


class NativeWordPiece:
    """Native greedy WordPiece over a frozen vocab."""

    def __init__(self, vocab: dict[str, int], unk_id: int, max_chars: int = 100):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        pieces = b"\x00".join(k.encode("utf-8") for k in vocab) + b"\x00"
        ids = np.asarray(list(vocab.values()), np.int32)
        self._h = lib.tss_wp_create(pieces, _as_i32p(ids), len(vocab), unk_id, max_chars)

    def encode_word(self, word: str, max_out: int = 128) -> Optional[list[int]]:
        """Piece ids for one (pre-lowercased) word; None = [UNK]."""
        out = np.empty(max_out, np.int32)
        raw = word.encode("utf-8")
        n = self._lib.tss_wp_encode_word(self._h, raw, len(raw), _as_i32p(out), max_out)
        if n < 0:
            return None
        return out[:n].tolist()

    def encode_text(self, text: str, max_out: int = 4096) -> np.ndarray:
        """Full tokenize+lower+wordpiece pass over raw text → piece ids."""
        out = np.empty(max_out, np.int32)
        raw = text.encode("utf-8")
        n = self._lib.tss_wp_encode_text(self._h, raw, len(raw), _as_i32p(out), max_out)
        return out[:n]

    def __del__(self):
        try:
            self._lib.tss_wp_free(self._h)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# trie builder
# ---------------------------------------------------------------------------


class NativeTrieBuilder:
    """C++ CSR trie builder with the same frozen layout as the Python one."""

    def __init__(self) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.tss_tb_create()

    def insert(self, token_ids: Sequence[int] | np.ndarray, case_row: int,
               para_idx: int = 0) -> None:
        arr = np.ascontiguousarray(token_ids, np.int32)
        self._lib.tss_tb_insert(self._h, _as_i32p(arr), len(arr), case_row, para_idx)

    def insert_windows(self, token_ids: Sequence[int] | np.ndarray, window: int,
                       max_windows: int, case_row: int, para_idx: int = 0) -> None:
        arr = np.ascontiguousarray(token_ids, np.int32)
        self._lib.tss_tb_insert_windows(
            self._h, _as_i32p(arr), len(arr), window, max_windows, case_row, para_idx
        )

    def freeze_arrays(self) -> dict[str, np.ndarray]:
        sizes = np.zeros(3, np.int64)
        self._lib.tss_tb_sizes(self._h, sizes.ctypes.data_as(_i64p))
        n_nodes, n_edges, n_posts = (int(x) for x in sizes)
        arrays = {
            "edge_offsets": np.zeros(n_nodes + 1, np.int32),
            "edge_tokens": np.zeros(max(n_edges, 1), np.int32),
            "edge_targets": np.zeros(max(n_edges, 1), np.int32),
            "post_offsets": np.zeros(n_nodes + 1, np.int32),
            "post_case": np.zeros(max(n_posts, 1), np.int32),
            "post_para": np.zeros(max(n_posts, 1), np.int32),
            "subtree_post_end": np.zeros(n_nodes, np.int32),
            "is_end": np.zeros(n_nodes, np.uint8),
            "frequency": np.zeros(n_nodes, np.int32),
        }
        self._lib.tss_tb_freeze(
            self._h,
            _as_i32p(arrays["edge_offsets"]),
            _as_i32p(arrays["edge_tokens"]),
            _as_i32p(arrays["edge_targets"]),
            _as_i32p(arrays["post_offsets"]),
            _as_i32p(arrays["post_case"]),
            _as_i32p(arrays["post_para"]),
            _as_i32p(arrays["subtree_post_end"]),
            arrays["is_end"].ctypes.data_as(_i8p),
            _as_i32p(arrays["frequency"]),
        )
        arrays["edge_tokens"] = arrays["edge_tokens"][:n_edges]
        arrays["edge_targets"] = arrays["edge_targets"][:n_edges]
        arrays["post_case"] = arrays["post_case"][:n_posts]
        arrays["post_para"] = arrays["post_para"][:n_posts]
        arrays["is_end"] = arrays["is_end"].astype(bool)
        return arrays

    def __del__(self):
        try:
            self._lib.tss_tb_free(self._h)
        except Exception:
            pass


def csr_from_sorted_windows(
    windows: np.ndarray,  # [n, L] int32, lexicographically sorted, -1 pad
    rows: np.ndarray,  # [n] int32
    paras: np.ndarray,  # [n] int32
    alloc=None,  # (name, shape, dtype) -> zero-filled ndarray-like
) -> Optional[dict[str, np.ndarray]]:
    """Build the frozen CSR trie arrays from a SORTED window matrix in one
    native pass (round-3 scale path; bit-identical to the pooled builders'
    freeze — the sorted order is the DFS pre-order). Returns None when the
    native library is unavailable (callers fall back to the Python
    equivalent in index.spill).

    ``alloc`` overrides output allocation — the scale build passes a
    disk-backed ``np.lib.format.open_memmap`` allocator so the multi-GB
    CSR arrays never join the resident set (the native pass fills
    caller-allocated, zero-initialised buffers either way)."""
    lib = _load()
    if lib is None:
        return None
    if alloc is None:
        alloc = lambda name, shape, dtype: np.zeros(shape, dtype)  # noqa: E731
    W = np.ascontiguousarray(windows, np.int32)
    r = np.ascontiguousarray(rows, np.int32)
    p = np.ascontiguousarray(paras, np.int32)
    n, L = W.shape
    num_nodes = int(lib.tss_csr_count(_as_i32p(W), n, L))
    n_edges = num_nodes - 1
    arrays = {
        "edge_offsets": alloc("edge_offsets", (num_nodes + 1,), np.int32),
        "edge_tokens": alloc("edge_tokens", (max(n_edges, 1),), np.int32),
        "edge_targets": alloc("edge_targets", (max(n_edges, 1),), np.int32),
        "post_offsets": alloc("post_offsets", (num_nodes + 1,), np.int32),
        "post_case": alloc("post_case", (max(n, 1),), np.int32),
        "post_para": alloc("post_para", (max(n, 1),), np.int32),
        "subtree_post_end": alloc("subtree_post_end", (num_nodes,), np.int32),
        "is_end": alloc("is_end", (num_nodes,), np.uint8),
        "frequency": alloc("frequency", (num_nodes,), np.int32),
    }
    lib.tss_csr_fill(
        _as_i32p(W), _as_i32p(r), _as_i32p(p), n, L, num_nodes,
        _as_i32p(arrays["edge_offsets"]),
        _as_i32p(arrays["edge_tokens"]),
        _as_i32p(arrays["edge_targets"]),
        _as_i32p(arrays["post_offsets"]),
        _as_i32p(arrays["post_case"]),
        _as_i32p(arrays["post_para"]),
        _as_i32p(arrays["subtree_post_end"]),
        arrays["is_end"].ctypes.data_as(_i8p),
        _as_i32p(arrays["frequency"]),
    )
    arrays["edge_tokens"] = arrays["edge_tokens"][:n_edges]
    arrays["edge_targets"] = arrays["edge_targets"][:n_edges]
    arrays["post_case"] = arrays["post_case"][:n]
    arrays["post_para"] = arrays["post_para"][:n]
    # zero-copy bool reinterpret (values are 0/1) — keeps a memmap-backed
    # allocation memmap-backed
    arrays["is_end"] = arrays["is_end"].view(bool)
    return arrays
