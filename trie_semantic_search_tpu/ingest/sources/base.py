"""Data-source interface and shared source infrastructure.

Rebuild of ``/root/reference/src/ingestion/sources/mod.rs:46-156``. The
reference shipped two incompatible ``DataSource`` trait shapes (SURVEY.md
§0.1): the declared trait (``fetch_case``, ``list_available_cases``) and the
shape the pipeline/demo actually call (``fetch_cases(limit)``,
``health_check() -> Result``). This ABC is the union of both, so every
caller in the reference's API surface has a target.
"""

from __future__ import annotations

import abc
import asyncio
import time
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Optional

from ...core.types import CaseMetadata

CasePayload = tuple[CaseMetadata, str]  # (metadata, full_text)


@dataclass
class SourceHealth:
    """ref: sources/mod.rs SourceHealth."""

    healthy: bool
    message: str = ""
    last_check: Optional[datetime] = None
    response_time_ms: Optional[float] = None


@dataclass
class SourceInfo:
    """ref: sources/mod.rs SourceInfo."""

    name: str
    description: str
    base_url: str = ""
    requires_auth: bool = False
    supports_incremental: bool = True


@dataclass
class RateLimits:
    """ref: sources/mod.rs RateLimits."""

    requests_per_minute: int = 60
    requests_per_hour: int = 3600
    concurrent_requests: int = 5


@dataclass
class SourceStats:
    """ref: sources/mod.rs:73-82 (+ rate_limit_hits, which cap.rs:319 used
    but the reference never declared — fixed here)."""

    cases_fetched: int = 0
    requests_made: int = 0
    errors: int = 0
    rate_limit_hits: int = 0
    bytes_downloaded: int = 0
    last_fetch: Optional[datetime] = None


@dataclass
class SourceConfig:
    """ref: sources/mod.rs SourceConfig — free-form per-source settings."""

    name: str = ""
    enabled: bool = True
    settings: dict[str, Any] = field(default_factory=dict)


class RateLimiter:
    """Min-interval limiter (ref: cap.rs:36-63 — sleep to maintain a
    minimum spacing between requests)."""

    def __init__(self, requests_per_minute: int = 60):
        self.min_interval = 60.0 / max(1, requests_per_minute)
        self._last = 0.0
        self._lock = asyncio.Lock()

    async def acquire(self) -> None:
        async with self._lock:
            now = time.monotonic()
            wait = self.min_interval - (now - self._last)
            if wait > 0:
                await asyncio.sleep(wait)
            self._last = time.monotonic()


class DataSource(abc.ABC):
    """Unified async data-source interface (union of the reference's two
    trait shapes, sources/mod.rs:86-122 + pipeline.rs:146-169)."""

    def __init__(self) -> None:
        self.stats = SourceStats()

    # -- identity -----------------------------------------------------------

    @property
    @abc.abstractmethod
    def name(self) -> str: ...

    @property
    def description(self) -> str:
        return self.get_source_info().description

    @abc.abstractmethod
    def get_source_info(self) -> SourceInfo: ...

    def get_rate_limits(self) -> RateLimits:
        return RateLimits()

    def get_source_config(self) -> SourceConfig:
        return SourceConfig(name=self.name)

    def get_stats(self) -> SourceStats:
        return self.stats

    # -- health -------------------------------------------------------------

    @abc.abstractmethod
    async def health_check(self) -> SourceHealth: ...

    # -- fetching -----------------------------------------------------------

    @abc.abstractmethod
    async def fetch_cases(self, limit: Optional[int] = None) -> list[CasePayload]:
        """Bulk fetch (the shape the pipeline drives, pipeline.rs:169)."""

    async def fetch_case(self, case_id: str) -> Optional[CasePayload]:
        """Single-case fetch (declared trait shape, sources/mod.rs:99)."""
        return None

    async def list_available_cases(self, limit: Optional[int] = None) -> list[str]:
        """Source-native ids available for fetch."""
        return []

    async def list_updated_cases(
        self, since: datetime, limit: Optional[int] = None
    ) -> list[str]:
        """Ids updated after ``since`` (incremental ingest watermark)."""
        return []

    async def search_cases(
        self, query: str, limit: Optional[int] = None
    ) -> list[str]:
        """Source-side search returning source-native ids."""
        return []
