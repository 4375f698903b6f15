"""Utility helpers (rebuild of ``/root/reference/src/utils.rs:22-203``).

``Timer`` / ``time_block``, ``TextUtils``, ``SystemUtils`` and
``ValidationUtils`` with the same behaviour — including implementing the
memory-usage/uptime probes the reference left as TODO stubs
(``utils.rs:103-112``).
"""

from __future__ import annotations

import contextlib
import hashlib
import logging
import re
import time
import uuid
from typing import Iterator, Optional

_log = logging.getLogger("tss_tpu.utils")

#: THE serving batch-bucket ladder, shared by every device entry point
#: (embedder batch pad, fused hybrid batch pad, warmup coverage). One
#: ladder means warmup's shape set IS the serve-time shape set — round-4's
#: 504 storm came from an unwarmed shape, and the round-5 c=64 stall from
#: the embedder padding 9..16-query batches to a 16 bucket the fused
#: ladder (and therefore warmup) didn't have.
BATCH_BUCKETS = (1, 8, 32, 64)


def batch_bucket(b: int) -> int:
    """Smallest ladder bucket >= b (powers of two past the ladder)."""
    for cap in BATCH_BUCKETS:
        if b <= cap:
            return cap
    return 1 << max(0, b - 1).bit_length()


class Timer:
    """Performance timer (ref: ``utils.rs:34-54``)."""

    def __init__(self, name: str):
        self.name = name
        self.start = time.perf_counter()

    def elapsed_ms(self) -> float:
        return (time.perf_counter() - self.start) * 1000.0

    def stop(self) -> float:
        elapsed = self.elapsed_ms()
        _log.debug("Timer '%s' completed in %.2fms", self.name, elapsed)
        return elapsed


@contextlib.contextmanager
def time_block(name: str) -> Iterator[Timer]:
    """Context-manager analogue of the ``time_block!`` macro
    (ref: ``utils.rs:187-195``)."""
    timer = Timer(name)
    try:
        yield timer
    finally:
        timer.stop()


class TextUtils:
    """Text helpers (ref: ``utils.rs:56-99``)."""

    @staticmethod
    def truncate(text: str, max_length: int) -> str:
        if len(text) <= max_length:
            return text
        return text[: max(0, max_length - 3)] + "..."

    @staticmethod
    def extract_preview(text: str, max_words: int) -> str:
        words = text.split()[:max_words]
        preview = " ".join(words)
        if len(words) >= max_words:
            return preview + "..."
        return preview

    @staticmethod
    def sanitize(text: str) -> str:
        # Drop control chars but keep whitespace (ref: utils.rs:79-83).
        return "".join(c for c in text if not _is_control(c) or c.isspace())

    @staticmethod
    def word_count(text: str) -> int:
        return len(text.split())

    @staticmethod
    def text_hash(text: str) -> str:
        # Stable across processes (unlike Rust's DefaultHasher, which was
        # only stable within one run anyway) — used as a cache key.
        return hashlib.blake2b(text.encode("utf-8"), digest_size=8).hexdigest()


def _is_control(c: str) -> bool:
    o = ord(c)
    return o < 0x20 or o == 0x7F or (0x80 <= o <= 0x9F)


class SystemUtils:
    """System helpers (ref: ``utils.rs:101-147``; memory/uptime were TODO
    stubs in the reference and are implemented for real here)."""

    @staticmethod
    def memory_usage() -> Optional[int]:
        """Current RSS in bytes (Linux /proc; the ref stubbed this)."""
        try:
            with open("/proc/self/statm") as f:
                parts = f.read().split()
            import os

            return int(parts[1]) * os.sysconf("SC_PAGE_SIZE")
        except (OSError, IndexError, ValueError):
            return None

    @staticmethod
    def anon_memory_usage() -> Optional[int]:
        """Anonymous RSS in bytes (``RssAnon`` from ``/proc/self/status``):
        the un-evictable part of the footprint. File-backed resident pages
        (memmapped index arrays, page cache) are reclaimable under memory
        pressure and excluded — this is the number the corpus-scale build
        budget is judged on (round-4 VERDICT item 4)."""
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("RssAnon:"):
                        return int(line.split()[1]) * 1024
        except (OSError, IndexError, ValueError):
            pass
        return None

    @staticmethod
    def uptime() -> Optional[float]:
        """System uptime in seconds (the ref stubbed this)."""
        try:
            with open("/proc/uptime") as f:
                return float(f.read().split()[0])
        except (OSError, IndexError, ValueError):
            return None

    @staticmethod
    def format_bytes(n: int) -> str:
        units = ["B", "KB", "MB", "GB", "TB"]
        size = float(n)
        i = 0
        while size >= 1024.0 and i < len(units) - 1:
            size /= 1024.0
            i += 1
        if i == 0:
            return f"{int(size)} {units[i]}"
        return f"{size:.2f} {units[i]}"

    @staticmethod
    def format_duration(seconds: float) -> str:
        total = int(seconds)
        hours, rem = divmod(total, 3600)
        minutes, secs = divmod(rem, 60)
        if hours > 0:
            return f"{hours}h {minutes}m {secs}s"
        if minutes > 0:
            return f"{minutes}m {secs}s"
        return f"{secs}s"


def madvise_dontneed(arr) -> bool:
    """Drop an ``np.memmap``'s resident pages from THIS process's page
    tables (``madvise(MADV_DONTNEED)``) — best effort, returns whether it
    ran. Data is never lost: for ``MAP_SHARED`` write maps the pages stay
    in (or move to) the page cache, dirty ones get written back by normal
    kernel writeback; for read maps the next access minor-faults the page
    straight back from cache. Corpus-scale builds call this after
    consuming each slab so a 10M-chunk finalize's RSS stays O(slab)
    instead of accumulating every touched file page (round-4 VERDICT
    item 4)."""
    import mmap as _mmap

    m = getattr(arr, "_mmap", None)
    if m is None or not hasattr(m, "madvise"):
        return False
    try:
        m.madvise(_mmap.MADV_DONTNEED)
        return True
    except (ValueError, OSError):  # closed map / platform without madvise
        return False


_CITATION_RE = re.compile(r"^\d+\s+[A-Za-z.]+\s+\d+.*\(\d{4}\)")


class ValidationUtils:
    """Validation helpers (ref: ``utils.rs:152-184``)."""

    @staticmethod
    def is_valid_case_id(s: str) -> bool:
        try:
            uuid.UUID(s)
            return True
        except (ValueError, AttributeError, TypeError):
            return False

    @staticmethod
    def is_valid_citation(citation: str) -> bool:
        return _CITATION_RE.match(citation) is not None

    @staticmethod
    def is_valid_search_query(query: str, min_length: int, max_length: int) -> bool:
        trimmed = query.strip()
        return bool(trimmed) and min_length <= len(trimmed) <= max_length

    @staticmethod
    def sanitize_filename(filename: str) -> str:
        return "".join(
            c if (c.isalnum() or c in "-_.") else "_" for c in filename
        )


def enable_persistent_compile_cache(
    cache_dir: str = "/root/.jax_compile_cache",
) -> bool:
    """Turn on JAX's on-disk compilation cache so re-boots of the serving
    process (and every chain stage) reuse prior XLA compiles instead of
    re-paying 15–90 s per shape over the remote-compile tunnel. The full
    serve-time warmup set is ~16+ programs — cold it can take tens of
    minutes, cached it is seconds. Safe on any backend; call BEFORE the
    first jit execution. Returns False if the config knob is unavailable
    or the backend already initialised past the point of no return."""
    import os

    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile that took >= 1 s (the default 1 s floor is
        # fine: sub-second compiles are cheaper than the disk round trip)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # name every compile in the log: a serve-time stall caused by an
        # unwarmed shape is then attributable from the serve log alone
        # (the round-5 flagship loadtest had ONE ~10 s mid-run stall that
        # 504'd 64 requests with nothing in the log to blame)
        jax.config.update("jax_log_compiles", True)
        return True
    except Exception as e:  # never let a cache knob break serving
        logging.getLogger("tss_tpu.utils").warning(
            "persistent compile cache unavailable: %s", e
        )
        return False


def guard_dead_tpu_relay(port: int = 8093, timeout_s: float = 2.0) -> bool:
    """Demote JAX to the CPU backend when the axon TPU relay is down.

    The dev environment reaches its TPU through a loopback relay
    (``JAX_PLATFORMS=axon``). If the relay process has died (observed
    after device-OOM incidents), a JAX client does not error — it
    futex-hangs forever at its first device op. Probe the relay port
    first and switch platforms instead of hanging. No-op on real TPU
    hardware (no axon platform in ``JAX_PLATFORMS``).

    Returns True when the fallback was applied. Call BEFORE any backend
    initialisation; if a backend is already up the switch is skipped.
    """
    import os
    import socket

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return False
    s = socket.socket()
    s.settimeout(timeout_s)
    try:
        s.connect(("127.0.0.1", port))
        return False
    except OSError:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            return False  # backend already initialised; nothing safe to do
        return True
    finally:
        s.close()
