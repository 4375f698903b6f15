"""Ingestion manager: job model, source registry, bulk/incremental drivers.

Rebuild of ``/root/reference/src/ingestion/mod.rs:64-479``:

* job model (``IngestionJob``; types BulkAll / BulkSource / IncrementalAll /
  IncrementalSource / Reprocess; statuses Queued → Running → Completed /
  Failed / Cancelled / Paused — ref ingestion/mod.rs:116-185)
* source registry (register/lookup by name)
* bulk driver fanning case batches out under a download semaphore
  (``max_concurrent_downloads``, ref mod.rs:190,430-469)
* incremental driver keyed on the per-source last-update watermark
  (ref mod.rs:377-415)
* post-ingest index rebuild hook — the stage the reference left TODO
  (main.rs:248-261) — wiring ingest → ``build_indexes``.
"""

from __future__ import annotations

import asyncio
import datetime as _dt
import enum
import itertools
import logging
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..core.config import Config
from ..core.errors import SourceUnavailable
from ..storage.store import StorageManager
from .cache import CacheManager
from .pipeline import IngestionPipeline, PipelineStats
from .sources.base import DataSource

_log = logging.getLogger("tss_tpu.ingest.manager")


class IngestionJobType(str, enum.Enum):
    """ref: ingestion/mod.rs IngestionJobType."""

    BULK_ALL = "bulk_all"
    BULK_SOURCE = "bulk_source"
    INCREMENTAL_ALL = "incremental_all"
    INCREMENTAL_SOURCE = "incremental_source"
    REPROCESS = "reprocess"


class JobStatus(str, enum.Enum):
    """ref: ingestion/mod.rs job statuses Queued..Paused."""

    QUEUED = "queued"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"
    CANCELLED = "cancelled"
    PAUSED = "paused"


_job_ids = itertools.count(1)


@dataclass
class IngestionJob:
    """ref: ingestion/mod.rs IngestionJob."""

    job_type: IngestionJobType
    source: Optional[str] = None
    limit: Optional[int] = None
    id: int = field(default_factory=lambda: next(_job_ids))
    status: JobStatus = JobStatus.QUEUED
    created_at: _dt.datetime = field(
        default_factory=lambda: _dt.datetime.now(_dt.timezone.utc)
    )
    started_at: Optional[_dt.datetime] = None
    finished_at: Optional[_dt.datetime] = None
    error: Optional[str] = None
    stats: Optional[PipelineStats] = None


@dataclass
class IngestionStats:
    """ref: ingestion/mod.rs:74-113 — aggregate across jobs."""

    jobs_run: int = 0
    jobs_failed: int = 0
    total_processed: int = 0
    total_skipped: int = 0
    total_failed_validation: int = 0
    last_run: Optional[_dt.datetime] = None


class IngestionManager:
    def __init__(
        self,
        config: Config,
        storage: StorageManager,
        pipeline: Optional[IngestionPipeline] = None,
        cache_manager: Optional[CacheManager] = None,
        on_ingest_complete: Optional[Callable[[], None]] = None,
    ):
        self.config = config
        self.storage = storage
        self.cache = cache_manager or CacheManager(config.ingestion.cache)
        self.pipeline = pipeline or IngestionPipeline(
            config.ingestion,
            storage,
            text_config=config.text_processing,
            cache_manager=self.cache,
        )
        self.sources: dict[str, DataSource] = {}
        self.jobs: list[IngestionJob] = []
        self.stats = IngestionStats()
        self._dl_sem = asyncio.Semaphore(
            max(1, config.ingestion.max_concurrent_downloads)
        )
        #: called after a successful ingest job — index rebuild hook
        self.on_ingest_complete = on_ingest_complete

    # -- registry -----------------------------------------------------------

    def register_source(self, source: DataSource) -> None:
        self.sources[source.name] = source

    def get_source(self, name: str) -> DataSource:
        try:
            return self.sources[name]
        except KeyError:
            raise SourceUnavailable(source=name, details="not registered") from None

    # -- job execution ------------------------------------------------------

    async def run_job(self, job: IngestionJob) -> IngestionJob:
        self.jobs.append(job)
        job.status = (
            JobStatus.PAUSED if self.pipeline.paused else JobStatus.RUNNING
        )
        job.started_at = _dt.datetime.now(_dt.timezone.utc)
        try:
            if job.job_type == IngestionJobType.REPROCESS:
                job.stats = await asyncio.to_thread(self._reprocess_all)
                job.status = JobStatus.COMPLETED
                self.stats.jobs_run += 1
                self.stats.last_run = _dt.datetime.now(_dt.timezone.utc)
                if self.on_ingest_complete and job.stats.processed:
                    self.on_ingest_complete()
                return job
            if job.job_type in (
                IngestionJobType.BULK_ALL,
                IngestionJobType.INCREMENTAL_ALL,
            ):
                targets = list(self.sources.values())
            else:
                targets = [self.get_source(job.source or "")]

            incremental = job.job_type in (
                IngestionJobType.INCREMENTAL_ALL,
                IngestionJobType.INCREMENTAL_SOURCE,
            )
            agg = PipelineStats()
            for src in targets:
                stats = await self._ingest_source(src, job.limit, incremental)
                agg.total_cases += stats.total_cases
                agg.processed += stats.processed
                agg.skipped_duplicates += stats.skipped_duplicates
                agg.failed_validation += stats.failed_validation
                agg.failed_processing += stats.failed_processing
            job.stats = agg
            job.status = (
                JobStatus.CANCELLED
                if self.pipeline._shutdown.is_set()
                else JobStatus.COMPLETED
            )
            self.stats.jobs_run += 1
            self.stats.total_processed += agg.processed
            self.stats.total_skipped += agg.skipped_duplicates
            self.stats.total_failed_validation += agg.failed_validation
            self.stats.last_run = _dt.datetime.now(_dt.timezone.utc)
            if self.on_ingest_complete and agg.processed:
                self.on_ingest_complete()
        except Exception as e:
            job.status = JobStatus.FAILED
            job.error = str(e)
            self.stats.jobs_failed += 1
            _log.error("ingestion job %d failed: %s", job.id, e)
        finally:
            job.finished_at = _dt.datetime.now(_dt.timezone.utc)
        return job

    async def ingest_bulk(
        self, source_name: Optional[str] = None, limit: Optional[int] = None
    ) -> IngestionJob:
        """ref: IngestionManager::ingest_bulk (ingestion/mod.rs:223-272)."""
        job = IngestionJob(
            job_type=IngestionJobType.BULK_SOURCE
            if source_name
            else IngestionJobType.BULK_ALL,
            source=source_name,
            limit=limit,
        )
        return await self.run_job(job)

    async def check_for_updates(
        self, source_name: Optional[str] = None, limit: Optional[int] = None
    ) -> IngestionJob:
        """Incremental ingest from the last watermark
        (ref: check_for_updates, ingestion/mod.rs:377-415)."""
        job = IngestionJob(
            job_type=IngestionJobType.INCREMENTAL_SOURCE
            if source_name
            else IngestionJobType.INCREMENTAL_ALL,
            source=source_name,
            limit=limit,
        )
        return await self.run_job(job)

    async def cancel(self) -> None:
        """Cancel in-flight ingestion: drains current batches and stops
        (jobs finish with status CANCELLED — the job state the reference
        declared, ingestion/mod.rs:116-185, without a driver)."""
        await self.pipeline.shutdown()

    def pause(self) -> None:
        """Hold running jobs at the next batch boundary and mark them
        PAUSED (the job state the reference declared without a driver,
        ingestion/mod.rs:116-185)."""
        self.pipeline.pause()
        for job in self.jobs:
            if job.status == JobStatus.RUNNING:
                job.status = JobStatus.PAUSED

    def resume(self) -> None:
        """Release paused jobs back to RUNNING."""
        self.pipeline.resume()
        for job in self.jobs:
            if job.status == JobStatus.PAUSED:
                job.status = JobStatus.RUNNING

    async def reprocess(self) -> IngestionJob:
        """Re-run text processing + metadata enhancement over every stored
        case (ref job type ``Reprocess``, ingestion/mod.rs:116-185 — the
        reference declared it without a driver)."""
        return await self.run_job(IngestionJob(job_type=IngestionJobType.REPROCESS))

    def _reprocess_all(self) -> PipelineStats:
        stats = PipelineStats()
        for meta, text in self.storage.iter_cases():
            stats.total_cases += 1
            try:
                processed = self.pipeline.text_processor.process_text(text)
                # re-derive enriched fields from scratch
                meta.word_count = processed.stats.word_count
                if processed.citations:
                    meta.citations = [c.normalized for c in processed.citations]
                    if not meta.citation:
                        meta.citation = meta.citations[0]
                self.pipeline._enhance_metadata(meta, processed)
                self.storage.store_case_metadata(meta)
                stats.processed += 1
            except Exception as e:
                stats.failed_processing += 1
                _log.warning("reprocess failed for %s: %s", meta.id, e)
        self.storage.flush()
        return stats

    # -- internals ----------------------------------------------------------

    async def _ingest_source(
        self, source: DataSource, limit: Optional[int], incremental: bool
    ) -> PipelineStats:
        if incremental:
            since = self.cache.get_last_update(source.name)
            if since is not None:
                updated = await source.list_updated_cases(since, limit)
                if not updated:
                    _log.info("%s: no updates since %s", source.name, since)
                    self.cache.set_last_update(
                        source.name, _dt.datetime.now(_dt.timezone.utc)
                    )
                    return PipelineStats()
                payloads = await self._fetch_concurrent(source, updated)
                stats = PipelineStats(total_cases=len(payloads))
                for p in payloads:
                    try:
                        outcome = await asyncio.to_thread(
                            self.pipeline.process_single_case, *p
                        )
                        if outcome == "stored":
                            stats.processed += 1
                        elif outcome == "duplicate":
                            stats.skipped_duplicates += 1
                        else:
                            stats.failed_validation += 1
                    except Exception as e:
                        stats.failed_processing += 1
                        _log.warning("incremental case failed: %s", e)
                self.cache.set_last_update(
                    source.name, _dt.datetime.now(_dt.timezone.utc)
                )
                return stats
        stats = await self.pipeline.run_ingestion(source, limit)
        self.cache.set_last_update(source.name, _dt.datetime.now(_dt.timezone.utc))
        return stats

    async def _fetch_concurrent(
        self, source: DataSource, ids: list[str]
    ) -> list:
        """Concurrent single-case downloads under the download semaphore
        (ref process_case_batch, ingestion/mod.rs:418-472)."""

        async def one(cid: str):
            async with self._dl_sem:
                try:
                    return await source.fetch_case(cid)
                except Exception as e:
                    _log.warning("fetch %s failed: %s", cid, e)
                    return None

        results = await asyncio.gather(*(one(c) for c in ids))
        return [r for r in results if r is not None]

    # -- ops ----------------------------------------------------------------

    def get_stats(self) -> IngestionStats:
        return self.stats

    def get_jobs(self) -> list[IngestionJob]:
        return list(self.jobs)

    async def shutdown(self) -> None:
        await self.pipeline.shutdown()
