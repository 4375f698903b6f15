"""Ingestion tests: validator rules, cache manager, pipeline e2e with the
MockDataSource, CAP/CourtListener clients against httpx.MockTransport (the
wiremock-style tests the reference declared but never wrote), manager jobs
and incremental watermarks."""

import asyncio
import datetime as dt
import json

import httpx
import pytest

from trie_semantic_search_tpu.core.config import Config, ValidationConfig
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.ingest import (
    CacheManager,
    CaseValidator,
    IngestionJobType,
    IngestionManager,
    IngestionPipeline,
    JobStatus,
    content_key,
)
from trie_semantic_search_tpu.ingest.sources import (
    CapDataSource,
    CourtListenerDataSource,
    MockDataSource,
)
from trie_semantic_search_tpu.storage.store import StorageManager


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


LONG_TEXT = (
    "The court held that the challenged statute violates the equal "
    "protection clause of the Fourteenth Amendment. " * 5
)


def make_case(name="State v. Example", citation="100 U.S. 1 (1880)", text=LONG_TEXT):
    return CaseMetadata(
        id=new_case_id(),
        name=name,
        citation=citation,
        court="Supreme Court of the United States",
        decision_date=dt.date(1880, 1, 1),
        full_text=text,
    )


# ---------------------------------------------------------------------------
# validator
# ---------------------------------------------------------------------------


def test_validator_passes_good_case():
    v = CaseValidator(ValidationConfig())
    res = v.validate_case(make_case(), LONG_TEXT)
    assert res.passed, [e.message for e in res.errors]


def test_validator_text_too_short():
    v = CaseValidator(ValidationConfig(min_text_length=100))
    res = v.validate_case(make_case(), "short")
    assert not res.passed
    assert any("too short" in e.message for e in res.errors)


def test_validator_missing_required_fields():
    v = CaseValidator(ValidationConfig())
    c = make_case(name="")
    res = v.validate_case(c, LONG_TEXT)
    assert not res.passed
    assert any("required" in e.message for e in res.errors)


def test_validator_future_date():
    v = CaseValidator(ValidationConfig())
    c = make_case()
    c.decision_date = dt.date.today() + dt.timedelta(days=365)
    res = v.validate_case(c, LONG_TEXT)
    assert not res.passed


def test_validator_bad_citation_is_warning():
    v = CaseValidator(ValidationConfig())
    c = make_case(citation="not a citation")
    res = v.validate_case(c, LONG_TEXT)
    assert res.passed  # LOW severity → warning only
    assert res.warnings


# ---------------------------------------------------------------------------
# cache manager
# ---------------------------------------------------------------------------


def test_cache_watermarks_persist(tmp_path):
    from trie_semantic_search_tpu.core.config import CacheConfig

    cfg = CacheConfig(disk_cache_path=str(tmp_path / "cache"))
    cm = CacheManager(cfg)
    now = dt.datetime(2020, 5, 1, tzinfo=dt.timezone.utc)
    cm.set_last_update("cap", now)
    cm2 = CacheManager(cfg)  # reload from disk
    assert cm2.get_last_update("cap") == now
    cm2.clear_source_cache("cap")
    assert cm2.get_last_update("cap") is None


def test_cache_processed_case_mem_and_disk(tmp_path):
    from trie_semantic_search_tpu.core.config import CacheConfig

    cfg = CacheConfig(disk_cache_path=str(tmp_path / "cache"))
    cm = CacheManager(cfg)
    key = content_key("A v. B", "text")
    cm.store_processed_case(key, {"metadata": {"name": "A v. B"}})
    assert cm.get_processed_case(key)["metadata"]["name"] == "A v. B"
    cm.clear_memory_cache()
    assert cm.get_processed_case(key) is not None  # disk tier
    st = cm.get_stats()
    assert st.disk_entries == 1 and st.watermarks == 0
    cm.health_check()


# ---------------------------------------------------------------------------
# pipeline e2e with mock source (ref ingestion_demo flow, SURVEY §3.4)
# ---------------------------------------------------------------------------


@pytest.fixture()
def storage(tmp_path):
    from trie_semantic_search_tpu.core.config import StorageConfig

    return StorageManager(StorageConfig(db_path=str(tmp_path / "db.sqlite")))


def test_pipeline_e2e_mock(storage, tmp_config):
    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    stats = run(pipe.run_ingestion(MockDataSource()))
    assert stats.total_cases == 3
    assert stats.processed == 3
    assert stats.failed_validation == 0
    ids = storage.list_case_ids()
    assert len(ids) == 3
    meta = storage.get_case_metadata(ids[0])
    assert meta.word_count > 0  # enhanced
    assert storage.get_case_text(ids[0])


def test_pipeline_dedup_on_reingest(storage, tmp_config):
    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    src = MockDataSource()
    run(pipe.run_ingestion(src))
    stats2 = run(pipe.run_ingestion(src))
    assert stats2.skipped_duplicates == 3
    assert stats2.processed == 0
    assert len(storage.list_case_ids()) == 3


def test_pipeline_validation_rejects(storage, tmp_config):
    bad = make_case(text="x")
    src = MockDataSource(cases=[(bad, "too short")])
    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    stats = run(pipe.run_ingestion(src))
    assert stats.failed_validation == 1
    assert stats.processed == 0


def test_pipeline_unhealthy_source(storage, tmp_config):
    from trie_semantic_search_tpu.core.errors import SourceUnavailable

    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    with pytest.raises(SourceUnavailable):
        run(pipe.run_ingestion(MockDataSource(healthy=False)))


def test_pipeline_enhance_metadata(storage, tmp_config):
    text = (
        "Justice Marshall delivered the opinion. See 163 U.S. 537 (1896). "
        + LONG_TEXT
    )
    c = make_case(name="Plessy v. Ferguson", citation="")
    c.word_count = 0
    src = MockDataSource(cases=[(c, text)])
    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    run(pipe.run_ingestion(src))
    stored = storage.get_case_metadata(c.id)
    assert stored.word_count > 0
    assert any("163 U.S. 537" in cit for cit in stored.citations)
    assert any("Marshall" in j for j in stored.judges)


# ---------------------------------------------------------------------------
# CAP client against MockTransport
# ---------------------------------------------------------------------------

CAP_CASE = {
    "id": 1,
    "url": "https://api.case.law/v1/cases/1/",
    "name": "Brown v. Board of Education",
    "name_abbreviation": "Brown",
    "decision_date": "1954-05-17",
    "docket_number": "No. 1",
    "citations": [{"cite": "347 U.S. 483", "type": "official"}],
    "court": {"name": "Supreme Court of the United States", "slug": "us"},
    "jurisdiction": {"slug": "us", "name": "U.S."},
    "analysis": {"word_count": 4000},
    "casebody": {
        "status": "ok",
        "data": {
            "head_matter": "Argued December 9, 1952.",
            "parties": ["Oliver Brown", "Board of Education"],
            "attorneys": ["Thurgood Marshall"],
            "judges": ["Warren, C. J."],
            "opinions": [
                {"type": "majority", "author": "Warren",
                 "text": "Separate educational facilities are inherently unequal."}
            ],
        },
    },
}


def make_cap_source(handler):
    transport = httpx.MockTransport(handler)
    client = httpx.AsyncClient(transport=transport)
    return CapDataSource(client=client, requests_per_minute=100000,
                         backoff_seconds=0.0)


def test_cap_fetch_and_convert():
    def handler(request):
        assert "page_size" in str(request.url)
        return httpx.Response(200, json={"count": 1, "next": None,
                                         "results": [CAP_CASE]})

    src = make_cap_source(handler)
    cases = run(src.fetch_cases(limit=10))
    assert len(cases) == 1
    meta, text = cases[0]
    assert meta.name == "Brown v. Board of Education"
    assert meta.citation == "347 U.S. 483"
    assert meta.decision_date == dt.date(1954, 5, 17)
    assert meta.judges == ["Warren, C. J."]
    assert meta.word_count == 4000
    assert "PARTIES: Oliver Brown; Board of Education" in text
    assert "ATTORNEYS: Thurgood Marshall" in text
    assert "OPINION (MAJORITY) by Warren:" in text
    assert "inherently unequal" in text
    assert src.stats.cases_fetched == 1


def test_cap_pagination():
    calls = []

    def handler(request):
        calls.append(str(request.url))
        if len(calls) == 1:
            return httpx.Response(200, json={
                "count": 2, "next": "https://api.case.law/v1/cases/?page=2",
                "results": [CAP_CASE]})
        return httpx.Response(200, json={"count": 2, "next": None,
                                         "results": [CAP_CASE]})

    src = make_cap_source(handler)
    cases = run(src.fetch_cases())
    assert len(cases) == 2 and len(calls) == 2


def test_cap_429_backoff():
    from trie_semantic_search_tpu.core.errors import RateLimitExceeded

    def handler(request):
        return httpx.Response(429, text="slow down")

    src = make_cap_source(handler)
    with pytest.raises(RateLimitExceeded):
        run(src.fetch_cases())
    assert src.stats.rate_limit_hits == 1


def test_cap_http_error():
    from trie_semantic_search_tpu.core.errors import NetworkError

    src = make_cap_source(lambda req: httpx.Response(500, text="boom"))
    with pytest.raises(NetworkError):
        run(src.fetch_cases())


def test_cap_malformed_case_skipped():
    bad = dict(CAP_CASE)
    bad["decision_date"] = "not-a-date"

    def handler(request):
        return httpx.Response(200, json={"count": 2, "next": None,
                                         "results": [bad, CAP_CASE]})

    src = make_cap_source(handler)
    cases = run(src.fetch_cases())
    assert len(cases) == 1
    assert src.stats.errors == 1


def test_cap_health_check():
    src = make_cap_source(
        lambda req: httpx.Response(200, json={"count": 0, "results": []})
    )
    h = run(src.health_check())
    assert h.healthy and h.response_time_ms is not None
    src2 = make_cap_source(lambda req: httpx.Response(500))
    h2 = run(src2.health_check())
    assert not h2.healthy


def test_cap_auth_header():
    from trie_semantic_search_tpu.core.config import CapConfig

    seen = {}

    def handler(request):
        seen["auth"] = request.headers.get("Authorization")
        return httpx.Response(200, json={"count": 0, "results": []})

    transport = httpx.MockTransport(handler)
    client = httpx.AsyncClient(
        transport=transport, headers={"Authorization": "Token sekrit"}
    )
    src = CapDataSource(CapConfig(api_key="sekrit"), client=client,
                        requests_per_minute=100000)
    run(src.fetch_cases())
    assert seen["auth"] == "Token sekrit"


# ---------------------------------------------------------------------------
# CourtListener client
# ---------------------------------------------------------------------------

CL_HIT = {
    "id": 42,
    "caseName": "Gideon v. Wainwright",
    "dateFiled": "1963-03-18",
    "citation": ["372 U.S. 335"],
    "court": "Supreme Court of the United States",
    "judge": "Black",
    "docketNumber": "155",
    "absolute_url": "/opinion/42/",
    "snippet": "<p>The right to counsel is fundamental.</p>",
}


def test_courtlistener_fetch():
    def handler(request):
        assert "search/" in str(request.url)
        return httpx.Response(200, json={"count": 1, "next": None,
                                         "results": [CL_HIT]})

    transport = httpx.MockTransport(handler)
    src = CourtListenerDataSource(
        client=httpx.AsyncClient(transport=transport), requests_per_minute=100000
    )
    cases = run(src.fetch_cases(limit=5))
    assert len(cases) == 1
    meta, text = cases[0]
    assert meta.name == "Gideon v. Wainwright"
    assert meta.citation == "372 U.S. 335"
    assert meta.decision_date == dt.date(1963, 3, 18)
    assert "right to counsel" in text.lower()
    assert "<p>" not in text  # html stripped


def test_courtlistener_fetch_single_opinion():
    def handler(request):
        url = str(request.url)
        if "opinions/7/" in url:
            return httpx.Response(200, json={
                "id": 7, "cluster": "https://cl/api/rest/v3/clusters/9/",
                "plain_text": "Full opinion text here.",
                "absolute_url": "/opinion/7/"})
        if "clusters/9/" in url:
            return httpx.Response(200, json={
                "case_name": "Katz v. United States",
                "date_filed": "1967-12-18",
                "citations": [{"volume": 389, "reporter": "U.S.", "page": 347}],
                "judges": "Stewart", "court": "scotus", "docket": "35"})
        return httpx.Response(404)

    transport = httpx.MockTransport(handler)
    src = CourtListenerDataSource(
        client=httpx.AsyncClient(transport=transport), requests_per_minute=100000
    )
    meta, text = run(src.fetch_case("7"))
    assert meta.name == "Katz v. United States"
    assert meta.citation == "389 U.S. 347"
    assert text == "Full opinion text here."


# ---------------------------------------------------------------------------
# manager
# ---------------------------------------------------------------------------


def test_manager_bulk_job(storage, tmp_config):
    mgr = IngestionManager(tmp_config, storage)
    mgr.register_source(MockDataSource())
    job = run(mgr.ingest_bulk("mock"))
    assert job.status == JobStatus.COMPLETED
    assert job.stats.processed == 3
    assert mgr.get_stats().jobs_run == 1
    assert len(storage.list_case_ids()) == 3
    assert mgr.cache.get_last_update("mock") is not None


def test_manager_pause_resume(storage, tmp_config):
    """PAUSED job driver (the state the reference declared, mod.rs:116-185,
    without a driver): pause holds ingestion at a batch boundary, resume
    finishes the job; a cancel during a pause still drains."""
    import asyncio

    tmp_config.ingestion.batch_size = 1  # one case per batch → 3 boundaries
    mgr = IngestionManager(tmp_config, storage)
    mgr.register_source(MockDataSource())

    async def drive():
        mgr.pause()
        task = asyncio.create_task(mgr.ingest_bulk("mock"))
        await asyncio.sleep(0.1)
        # held before the first batch; job visible as PAUSED
        assert not task.done()
        assert any(j.status == JobStatus.PAUSED for j in mgr.jobs) or any(
            j.status == JobStatus.RUNNING for j in mgr.jobs
        )
        mgr.pause()  # idempotent; marks the RUNNING job PAUSED
        assert mgr.pipeline.paused
        mgr.resume()
        job = await asyncio.wait_for(task, timeout=30)
        return job

    job = run(drive())
    assert job.status == JobStatus.COMPLETED
    assert job.stats.processed == 3
    assert len(storage.list_case_ids()) == 3

    # cancel during a pause must not deadlock
    async def drive_cancel():
        mgr2 = IngestionManager(tmp_config, storage)
        mgr2.register_source(MockDataSource())
        mgr2.pause()
        task = asyncio.create_task(mgr2.ingest_bulk("mock"))
        await asyncio.sleep(0.1)
        await asyncio.wait_for(mgr2.cancel(), timeout=10)
        return await asyncio.wait_for(task, timeout=30)

    job2 = run(drive_cancel())
    assert job2.status in (JobStatus.CANCELLED, JobStatus.COMPLETED)


def test_manager_unknown_source(storage, tmp_config):
    mgr = IngestionManager(tmp_config, storage)
    job = run(mgr.ingest_bulk("nope"))
    assert job.status == JobStatus.FAILED
    assert "not registered" in job.error


def test_manager_incremental_no_updates(storage, tmp_config):
    mgr = IngestionManager(tmp_config, storage)
    src = MockDataSource()
    mgr.register_source(src)
    run(mgr.ingest_bulk("mock"))
    # mock source returns no updated cases → incremental processes nothing new
    job = run(mgr.check_for_updates("mock"))
    assert job.status == JobStatus.COMPLETED
    assert job.stats.processed == 0


def test_manager_rebuild_hook(storage, tmp_config):
    called = []
    mgr = IngestionManager(
        tmp_config, storage, on_ingest_complete=lambda: called.append(1)
    )
    mgr.register_source(MockDataSource())
    run(mgr.ingest_bulk("mock"))
    assert called == [1]


def test_manager_job_bookkeeping(storage, tmp_config):
    mgr = IngestionManager(tmp_config, storage)
    mgr.register_source(MockDataSource())
    job = run(mgr.ingest_bulk("mock", limit=2))
    assert job.job_type == IngestionJobType.BULK_SOURCE
    assert job.started_at is not None and job.finished_at is not None
    assert mgr.get_jobs()[-1].id == job.id
    assert job.stats.total_cases == 2


def test_manager_reprocess_job(storage, tmp_config):
    mgr = IngestionManager(tmp_config, storage)
    mgr.register_source(MockDataSource())
    run(mgr.ingest_bulk("mock"))
    # wipe enrichment then reprocess restores it
    ids = storage.list_case_ids()
    meta = storage.get_case_metadata(ids[0])
    meta.word_count = 0
    meta.judges = []
    storage.store_case_metadata(meta)
    job = run(mgr.reprocess())
    assert job.status == JobStatus.COMPLETED
    assert job.stats.processed == 3
    restored = storage.get_case_metadata(ids[0])
    assert restored.word_count > 0


def test_pipeline_fetch_retries(storage, tmp_config):
    """Recoverable fetch errors retry per config; success on a later
    attempt completes the run."""
    from trie_semantic_search_tpu.core.errors import NetworkError

    class FlakySource(MockDataSource):
        def __init__(self):
            super().__init__()
            self.calls = 0

        async def fetch_cases(self, limit=None):
            self.calls += 1
            if self.calls < 3:
                raise NetworkError("transient blip")
            return await super().fetch_cases(limit)

    tmp_config.ingestion.retry_attempts = 3
    tmp_config.ingestion.retry_delay_seconds = 0
    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    src = FlakySource()
    stats = run(pipe.run_ingestion(src))
    assert src.calls == 3
    assert stats.processed == 3


def test_pipeline_fetch_nonrecoverable_no_retry(storage, tmp_config):
    from trie_semantic_search_tpu.core.errors import ParseError

    class BrokenSource(MockDataSource):
        def __init__(self):
            super().__init__()
            self.calls = 0

        async def fetch_cases(self, limit=None):
            self.calls += 1
            raise ParseError(source="broken", details="bad schema")

    tmp_config.ingestion.retry_attempts = 3
    tmp_config.ingestion.retry_delay_seconds = 0
    pipe = IngestionPipeline(tmp_config.ingestion, storage)
    src = BrokenSource()
    with pytest.raises(ParseError):
        run(pipe.run_ingestion(src))
    assert src.calls == 1  # not recoverable -> no retry


def test_manager_cancel_marks_job_cancelled(storage, tmp_config):
    """Cancelling mid-run drains and finishes with CANCELLED status."""

    class SlowSource(MockDataSource):
        def __init__(self, mgr_holder):
            super().__init__()
            self.mgr_holder = mgr_holder

        async def fetch_cases(self, limit=None):
            cases = await super().fetch_cases(limit)
            # request cancellation before the pipeline starts batching
            await self.mgr_holder["mgr"].cancel()
            return cases

    holder = {}
    tmp_config.ingestion.batch_size = 1
    mgr = IngestionManager(tmp_config, storage)
    holder["mgr"] = mgr
    mgr.register_source(SlowSource(holder))
    job = run(mgr.run_job(
        __import__("trie_semantic_search_tpu.ingest.manager",
                   fromlist=["IngestionJob"]).IngestionJob(
            job_type=IngestionJobType.BULK_SOURCE, source="mock")
    ))
    assert job.status == JobStatus.CANCELLED


def test_cancel_does_not_poison_next_run(storage, tmp_config):
    """Review regression: cancel() must only affect the interrupted run."""
    mgr = IngestionManager(tmp_config, storage)
    mgr.register_source(MockDataSource())
    run(mgr.cancel())  # cancel with nothing running
    job = run(mgr.ingest_bulk("mock"))
    assert job.status == JobStatus.COMPLETED
    assert job.stats.processed == 3
