"""Ingestion pipeline: fetch → validate → process → store (+ cache).

Rebuild of ``/root/reference/src/ingestion/pipeline.rs:35-478`` with the
same per-case dataflow and batch orchestration:

* per case (ref process_single_case, pipeline.rs:285-333): duplicate check →
  processed-case cache lookup → validate → ``TextProcessor.process_text`` →
  ``enhance_metadata`` (word-count backfill, citation + judge backfill from
  extraction; ref pipeline.rs:336-360) → store metadata + gzip text →
  cache the processed result
* batches under a concurrency semaphore (``max_concurrent_jobs``,
  ref pipeline.rs:132,244), inter-batch rate-limit sleep (ref 213-215),
  memory watchdog every 10 batches purging the memory cache (ref 388-417 —
  the reference's memory reading was stubbed; ours uses the real RSS probe)
* stats: processed/failed/skipped counts, rate, ETA, memory
  (ref PipelineStats, pipeline.rs:46-79)
* graceful shutdown draining in-flight batches (ref 458-477).

Fixes over the reference: duplicate detection keys on (name, citation)
content identity instead of the always-fresh UUID (see
``StorageManager.find_case_id``).
"""

from __future__ import annotations

import asyncio
import datetime as _dt
import logging
import time
from dataclasses import dataclass, field
from typing import Optional

from ..core.config import Config, IngestionConfig, TextProcessingConfig
from ..core.errors import SourceUnavailable
from ..core.types import CaseMetadata
from ..storage.store import StorageManager
from ..text.processor import TextProcessor
from ..utils import SystemUtils
from .cache import CacheManager, content_key
from .sources.base import CasePayload, DataSource
from .validation import CaseValidator

_log = logging.getLogger("tss_tpu.ingest.pipeline")


@dataclass
class MemoryStats:
    """ref: pipeline.rs MemoryStats."""

    rss_bytes: Optional[int] = None
    cache_purges: int = 0


@dataclass
class PipelineStats:
    """ref: pipeline.rs:46-79."""

    total_cases: int = 0
    processed: int = 0
    skipped_duplicates: int = 0
    failed_validation: int = 0
    failed_processing: int = 0
    cache_hits: int = 0
    batches_completed: int = 0
    started_at: Optional[_dt.datetime] = None
    finished_at: Optional[_dt.datetime] = None
    elapsed_seconds: float = 0.0
    cases_per_second: float = 0.0
    eta_seconds: Optional[float] = None
    memory: MemoryStats = field(default_factory=MemoryStats)


class IngestionPipeline:
    def __init__(
        self,
        config: IngestionConfig,
        storage: StorageManager,
        text_config: Optional[TextProcessingConfig] = None,
        cache_manager: Optional[CacheManager] = None,
    ):
        self.config = config
        self.storage = storage
        self.text_processor = TextProcessor(text_config or TextProcessingConfig())
        self.validator = CaseValidator(config.validation)
        self.cache = cache_manager or CacheManager(config.cache)
        self.stats = PipelineStats()
        self._job_sem = asyncio.Semaphore(max(1, config.max_concurrent_jobs))
        self._shutdown = asyncio.Event()
        # pause gate between batches: set = running, cleared = paused
        # (drives the PAUSED job state the reference declared without a
        # driver, ingestion/mod.rs:116-185)
        self._resume = asyncio.Event()
        self._resume.set()
        self._inflight: set[asyncio.Task] = set()
        # serialises the dup-check→store critical section: concurrent batch
        # workers would otherwise both pass the check and double-insert
        import threading as _threading

        self._store_lock = _threading.Lock()

    # -- driver (ref run_ingestion, pipeline.rs:146-240) --------------------

    async def run_ingestion(
        self, source: DataSource, limit: Optional[int] = None
    ) -> PipelineStats:
        self.stats = PipelineStats(started_at=_dt.datetime.now(_dt.timezone.utc))
        self._shutdown.clear()  # a cancel() only applies to the run it interrupts
        t0 = time.perf_counter()

        health = await source.health_check()
        if not health.healthy:
            raise SourceUnavailable(source=source.name, details=health.message)

        cases = await self._fetch_with_retries(source, limit)
        self.stats.total_cases = len(cases)
        _log.info("fetched %d cases from %s", len(cases), source.name)

        bs = max(1, self.config.batch_size)
        batches = [cases[i : i + bs] for i in range(0, len(cases), bs)]
        for bi, batch in enumerate(batches):
            if not self._resume.is_set():
                _log.info("ingestion paused before batch %d", bi)
                # wake on EITHER resume or shutdown (a cancel() during a
                # pause must still drain the run)
                rt = asyncio.create_task(self._resume.wait())
                st = asyncio.create_task(self._shutdown.wait())
                _, pending = await asyncio.wait(
                    {rt, st}, return_when=asyncio.FIRST_COMPLETED
                )
                for t in pending:
                    t.cancel()
                _log.info("ingestion resumed at batch %d", bi)
            if self._shutdown.is_set():
                _log.warning("shutdown requested; stopping after %d batches", bi)
                break
            await self._process_batch(batch)
            self.stats.batches_completed += 1
            self._update_progress(t0)
            if (bi + 1) % 10 == 0:
                self._check_memory()
            if self.config.rate_limit_delay_ms and bi + 1 < len(batches):
                await asyncio.sleep(self.config.rate_limit_delay_ms / 1000)

        self.cache.flush()
        self.storage.flush()
        self.stats.finished_at = _dt.datetime.now(_dt.timezone.utc)
        self.stats.elapsed_seconds = time.perf_counter() - t0
        if self.stats.elapsed_seconds > 0:
            self.stats.cases_per_second = (
                self.stats.processed / self.stats.elapsed_seconds
            )
        self.stats.eta_seconds = 0.0
        return self.stats

    async def _fetch_with_retries(
        self, source: DataSource, limit: Optional[int]
    ) -> list[CasePayload]:
        """Fetch with the configured retry policy (``retry_attempts`` /
        ``retry_delay_seconds``, ref config.rs:105-107,511-512 — declared by
        the reference, enforced here). Only recoverable errors retry
        (``SearchError.is_recoverable``, ref errors.rs:222-232)."""
        from ..core.errors import SearchError

        attempts = max(1, self.config.retry_attempts)
        delay = self.config.retry_delay_seconds
        last: Optional[Exception] = None
        for attempt in range(attempts):
            try:
                return await source.fetch_cases(limit)
            except SearchError as e:
                if not e.is_recoverable() or attempt == attempts - 1:
                    raise
                last = e
                _log.warning(
                    "fetch from %s failed (attempt %d/%d): %s; retrying in %ss",
                    source.name, attempt + 1, attempts, e, delay,
                )
                await asyncio.sleep(delay)
        raise last  # pragma: no cover — loop always returns or raises

    async def _process_batch(self, batch: list[CasePayload]) -> None:
        """Concurrent per-case processing under the job semaphore
        (ref process_batch, pipeline.rs:243-282)."""

        async def run_one(payload: CasePayload) -> None:
            async with self._job_sem:
                # per-case error tolerance (ref pipeline.rs:253-266)
                try:
                    await asyncio.to_thread(self.process_single_case, *payload)
                except Exception as e:
                    self.stats.failed_processing += 1
                    _log.warning("case %r failed: %s", payload[0].name, e)

        tasks = [asyncio.ensure_future(run_one(p)) for p in batch]
        self._inflight.update(tasks)
        try:
            await asyncio.gather(*tasks)
        finally:
            self._inflight.difference_update(tasks)

    # -- per-case flow (ref process_single_case, pipeline.rs:285-333) -------

    def process_single_case(self, metadata: CaseMetadata, text: str) -> str:
        """Returns the outcome: "stored" | "duplicate" | "invalid"."""
        # 1. duplicate fast-path (unlocked; rechecked under lock at store)
        if self.storage.find_case_id(metadata.name, metadata.citation) is not None:
            self.stats.skipped_duplicates += 1
            return "duplicate"

        # 2. processed-case cache
        key = content_key(metadata.name, text)
        cached = self.cache.get_processed_case(key)
        if cached is not None:
            meta = CaseMetadata.from_json(cached["metadata"])
            meta.id = metadata.id  # fresh identity, cached enrichment
            if not self._store_once(meta, text):
                return "duplicate"
            self.stats.cache_hits += 1
            self.stats.processed += 1
            return "stored"

        # 3. validate
        result = self.validator.validate_case(metadata, text)
        if not result.passed:
            self.stats.failed_validation += 1
            _log.debug(
                "validation failed for %r: %s",
                metadata.name,
                "; ".join(i.message for i in result.errors),
            )
            return "invalid"

        # 4. text processing + metadata enhancement
        processed = self.text_processor.process_text(text)
        self._enhance_metadata(metadata, processed)

        # 5. store (dup-rechecked under the lock)
        if not self._store_once(metadata, text):
            return "duplicate"

        # 6. cache the enriched result
        doc = metadata.to_json()
        doc.pop("full_text", None)
        self.cache.store_processed_case(key, {"metadata": doc})
        self.stats.processed += 1
        return "stored"

    def _store_once(self, metadata: CaseMetadata, text: str) -> bool:
        """Atomic dup-recheck + store. Returns False if another worker won
        the race for this (name, citation) identity."""
        with self._store_lock:
            if self.storage.find_case_id(metadata.name, metadata.citation) is not None:
                self.stats.skipped_duplicates += 1
                return False
            self.storage.store_case_metadata(metadata)
            self.storage.store_case_text(metadata.id, text)
            return True

    def _enhance_metadata(self, metadata: CaseMetadata, processed) -> None:
        """ref: enhance_metadata (pipeline.rs:336-360): word count, citation
        backfill from extraction, judge backfill from NER."""
        if not metadata.word_count:
            metadata.word_count = processed.stats.word_count
        if not metadata.citations and processed.citations:
            metadata.citations = [c.normalized for c in processed.citations]
            if not metadata.citation:
                metadata.citation = metadata.citations[0]
        if not metadata.judges:
            from ..text.processor import EntityType

            judges = []
            for e in processed.entities:
                if e.entity_type == EntityType.JUDGE and e.text not in judges:
                    judges.append(e.text)
            metadata.judges = judges[:10]

    # -- watchdog (ref check_memory_usage, pipeline.rs:388-417) -------------

    def _check_memory(self) -> None:
        rss = SystemUtils.memory_usage()
        self.stats.memory.rss_bytes = rss
        limit = self.config.max_memory_usage_mb * 1024 * 1024
        if rss is not None and rss > limit:
            _log.warning(
                "memory %s over limit %s; purging caches",
                SystemUtils.format_bytes(rss),
                SystemUtils.format_bytes(limit),
            )
            self.cache.clear_memory_cache()
            self.stats.memory.cache_purges += 1

    def _update_progress(self, t0: float) -> None:
        elapsed = time.perf_counter() - t0
        done = self.stats.processed + self.stats.skipped_duplicates
        if elapsed > 0 and done > 0:
            rate = done / elapsed
            remaining = max(0, self.stats.total_cases - done)
            self.stats.cases_per_second = rate
            self.stats.eta_seconds = remaining / rate if rate > 0 else None

    # -- ops surface (ref pipeline.rs:146,443,458-477) ----------------------

    def get_stats(self) -> PipelineStats:
        return self.stats

    def health_check(self) -> None:
        self.storage.health_check()
        self.cache.health_check()

    def pause(self) -> None:
        """Hold ingestion at the next batch boundary (in-flight batch
        items finish; nothing new starts until :meth:`resume`)."""
        self._resume.clear()

    def resume(self) -> None:
        self._resume.set()

    @property
    def paused(self) -> bool:
        return not self._resume.is_set()

    async def shutdown(self) -> None:
        """Drain in-flight work, flush caches (ref pipeline.rs:458-477)."""
        self._shutdown.set()
        if self._inflight:
            await asyncio.gather(*list(self._inflight), return_exceptions=True)
        self.cache.flush()
        self.storage.flush()


def make_pipeline(config: Config, storage: StorageManager) -> IngestionPipeline:
    return IngestionPipeline(
        config.ingestion, storage, text_config=config.text_processing
    )
