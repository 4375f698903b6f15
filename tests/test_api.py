"""API server tests (aiohttp test client) + batching queue + CLI."""

import asyncio
import datetime as dt
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from trie_semantic_search_tpu.api.batching import BatchingQueue, QueueFullError
from trie_semantic_search_tpu.api.server import ApiServer
from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import AppState, CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.builder import build_indexes
from trie_semantic_search_tpu.models.embedder import Embedder
from trie_semantic_search_tpu.models.minilm import MiniLMConfig
from trie_semantic_search_tpu.models.tokenizer import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from trie_semantic_search_tpu.search.engine import SearchEngine
from trie_semantic_search_tpu.storage.store import StorageManager

TEXTS = [
    ("Brown v. Board of Education", "347 U.S. 483 (1954)",
     "Separate educational facilities are inherently unequal in public education."),
    ("Miranda v. Arizona", "384 U.S. 436 (1966)",
     "You have the right to remain silent during custodial interrogation."),
]

TINY = MiniLMConfig(vocab_size=4096, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, max_position=64)


def make_state(tmp_path, api_key=None) -> AppState:
    cfg = Config()
    cfg.storage.db_path = str(tmp_path / "db.sqlite")
    cfg.trie.index_path = str(tmp_path / "trie_index")
    cfg.vector.hnsw.index_path = str(tmp_path / "vector_index")
    cfg.vector.hnsw.num_partitions = 8
    cfg.vector.dimension = 64
    # first-query jit compiles exceed the 5 s production budget on the CPU
    # test backend; the timeout path itself is covered explicitly below
    cfg.search.search_timeout_ms = 120_000
    if api_key:
        cfg.server.api_key = api_key
    storage = StorageManager(cfg.storage)
    for name, cit, text in TEXTS:
        meta = CaseMetadata(
            id=new_case_id(), name=name, citation=cit,
            court="Supreme Court of the United States",
            decision_date=dt.date(1960, 1, 1),
        )
        storage.store_case_metadata(meta)
        storage.store_case_text(meta.id, text)
    vocab = train_wordpiece_vocab([t[2] for t in TEXTS], vocab_size=4096,
                                  min_frequency=1)
    embedder = Embedder(cfg.vector.model, tokenizer=WordPieceTokenizer(vocab),
                        model_config=TINY)
    built = build_indexes(storage, cfg, embedder=embedder)
    engine = SearchEngine(cfg, storage, built.trie, built.vector, built.columns)
    return AppState(config=cfg, search_engine=engine, storage=storage)


@pytest.fixture()
def client(tmp_path, event_loop=None):
    state = make_state(tmp_path)
    server = ApiServer(state)

    async def _make():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        return c

    loop = asyncio.new_event_loop()
    c = loop.run_until_complete(_make())
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()


def test_search_endpoint(client):
    c, loop = client

    async def go():
        resp = await c.post("/search", json={"query": "brown v. board of education"})
        assert resp.status == 200
        data = await resp.json()
        assert data["total_results"] >= 1
        top = data["results"][0]
        assert top["case_metadata"]["name"] == "Brown v. Board of Education"
        assert top["match_type"] == "case_name"
        assert "query_time_ms" in data
        assert data["pagination"]["page"] == 1

    loop.run_until_complete(go())


def test_search_with_filters(client):
    c, loop = client

    async def go():
        resp = await c.post("/search", json={
            "query": "right to remain silent",
            "max_results": 5,
            "court_filter": ["Supreme Court of the United States"],
            "date_range": ["1950-01-01", "1970-01-01"],
        })
        assert resp.status == 200
        data = await resp.json()
        assert data["total_results"] >= 1

    loop.run_until_complete(go())


def test_search_validation_errors(client):
    c, loop = client

    async def go():
        resp = await c.post("/search", json={"query": "a"})
        assert resp.status == 400
        resp = await c.post("/search", json={})
        assert resp.status == 400
        resp = await c.post("/search", data=b"not json")
        assert resp.status == 400

    loop.run_until_complete(go())


def test_health_endpoint(client):
    c, loop = client

    async def go():
        resp = await c.get("/health")
        assert resp.status == 200
        data = await resp.json()
        assert data["status"] == "healthy"
        assert data["components"]["storage"] == "healthy"
        assert data["components"]["search_engine"] == "healthy"
        assert data["components"]["trie_index"] == "healthy"
        assert data["components"]["vector_index"] == "healthy"
        assert "version" in data and "uptime_seconds" in data

    loop.run_until_complete(go())


def test_stats_endpoint(client):
    c, loop = client

    async def go():
        resp = await c.get("/stats")
        assert resp.status == 200
        data = await resp.json()
        assert data["engine"]["total_cases_indexed"] == 2
        assert data["storage"]["total_cases"] == 2
        assert "trie" in data["engine"]

    loop.run_until_complete(go())


def test_completions_endpoint(client):
    c, loop = client

    async def go():
        resp = await c.get("/completions?prefix=miranda")
        assert resp.status == 200
        data = await resp.json()
        assert any("arizona" in x for x in data["completions"])
        resp = await c.get("/completions")
        assert resp.status == 400

    loop.run_until_complete(go())


def test_landing_page_and_cors(client):
    c, loop = client

    async def go():
        resp = await c.get("/")
        assert resp.status == 200
        body = await resp.text()
        assert "Legal Search" in body
        assert resp.headers.get("Access-Control-Allow-Origin") == "*"

    loop.run_until_complete(go())


def test_api_key_auth(tmp_path):
    state = make_state(tmp_path, api_key="sekrit")
    server = ApiServer(state)
    loop = asyncio.new_event_loop()

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        try:
            resp = await c.post("/search", json={"query": "brown v. board"})
            assert resp.status == 401
            resp = await c.post("/search", json={"query": "brown v. board of education"},
                                headers={"X-API-Key": "sekrit"})
            assert resp.status == 200
            # health stays unauthenticated
            resp = await c.get("/health")
            assert resp.status == 200
        finally:
            await c.close()

    loop.run_until_complete(go())
    loop.close()


def test_concurrent_requests_batched(client):
    """Many concurrent requests: all succeed through the batcher."""
    c, loop = client

    async def go():
        async def one(q):
            resp = await c.post("/search", json={"query": q})
            assert resp.status == 200
            return await resp.json()

        results = await asyncio.gather(
            *[one("right to remain silent") for _ in range(20)]
        )
        assert all(r["total_results"] >= 1 for r in results)

    loop.run_until_complete(go())


# ---------------------------------------------------------------------------
# BatchingQueue unit tests
# ---------------------------------------------------------------------------


def test_batching_queue_batches():
    seen_batches = []

    def run_batch(items):
        seen_batches.append(len(items))
        return [i * 2 for i in items]

    async def go():
        bq = BatchingQueue(run_batch, max_batch=8, window_ms=20)
        await bq.start()
        out = await asyncio.gather(*[bq.submit(i) for i in range(10)])
        await bq.stop()
        return out

    out = asyncio.new_event_loop().run_until_complete(go())
    assert sorted(out) == [i * 2 for i in range(10)]
    assert max(seen_batches) > 1  # actually coalesced


def test_batching_queue_poison_item_isolated():
    def run_batch(items):
        if any(i == "bad" for i in items):
            raise ValueError("poisoned batch")
        return [i.upper() for i in items]

    async def go():
        bq = BatchingQueue(run_batch, max_batch=8, window_ms=20)
        await bq.start()
        good = asyncio.create_task(bq.submit("ok"))
        bad = asyncio.create_task(bq.submit("bad"))
        r_good = await good
        with pytest.raises(ValueError):
            await bad
        await bq.stop()
        return r_good

    assert asyncio.new_event_loop().run_until_complete(go()) == "OK"


def test_batching_queue_sheds_load_when_full():
    """Backlog at max_pending → immediate QueueFullError, not a silent
    queue-then-timeout (round-4 TPU loadtest: 398/1000 requests 504'd)."""
    import threading

    release = threading.Event()

    def run_batch(items):
        release.wait(5.0)
        return list(items)

    async def go():
        bq = BatchingQueue(
            run_batch, max_batch=2, window_ms=1, max_pending=4, inflight=1
        )
        await bq.start()
        # saturate far past max_pending; excess submits must raise
        # QueueFullError immediately rather than queue into timeout
        tasks = [asyncio.create_task(bq.submit(i)) for i in range(12)]
        # un-block the backend shortly after the burst: queued requests
        # get served, only the shed ones fail
        asyncio.get_running_loop().call_later(0.2, release.set)
        results = await asyncio.gather(
            *[asyncio.wait_for(t, 2.0) for t in tasks], return_exceptions=True
        )
        await bq.stop()
        return results, bq.stats["shed"]

    results, stat = asyncio.new_event_loop().run_until_complete(go())
    shed = [r for r in results if isinstance(r, QueueFullError)]
    timed_out = [r for r in results if isinstance(r, asyncio.TimeoutError)]
    assert len(shed) >= 1 and stat == len(shed)
    # shed requests failed INSTANTLY — none of them burned the client's
    # 2 s budget (the 504-storm failure mode)
    assert len(shed) + len(timed_out) < 12  # some requests actually served


def test_batching_queue_drops_ghost_requests():
    """A caller that times out (future cancelled) must not cost device
    time: the dispatcher drops cancelled futures at assembly time."""
    executed = []

    def run_batch(items):
        executed.extend(items)
        return list(items)

    async def go():
        bq = BatchingQueue(run_batch, max_batch=4, window_ms=5)
        # enqueue ghosts BEFORE the dispatcher starts, then cancel them
        loop = asyncio.get_running_loop()
        for i in range(6):
            fut = loop.create_future()
            fut.cancel()
            await bq._queue.put((f"ghost{i}", fut))
        await bq.start()
        live = await bq.submit("live")
        await bq.stop()
        return live, bq.stats["ghosts_dropped"]

    live, ghosts = asyncio.new_event_loop().run_until_complete(go())
    assert live == "live"
    assert ghosts == 6
    assert all(not str(x).startswith("ghost") for x in executed)


def test_batching_queue_large_failed_batch_fails_fast():
    """A failed batch bigger than single_retry_max must fail fast, not
    stall the dispatcher with N serial single retries."""
    calls = []

    def run_batch(items):
        calls.append(len(items))
        raise RuntimeError("backend down")

    async def go():
        bq = BatchingQueue(
            run_batch, max_batch=16, window_ms=50, single_retry_max=2
        )
        await bq.start()
        tasks = [asyncio.create_task(bq.submit(i)) for i in range(8)]
        results = await asyncio.gather(*tasks, return_exceptions=True)
        await bq.stop()
        return results

    results = asyncio.new_event_loop().run_until_complete(go())
    assert all(isinstance(r, RuntimeError) for r in results)
    # one batch call (possibly split across dispatch windows), but never
    # 8 serial single-item retries
    assert sum(1 for c in calls if c == 1) == 0


def test_batching_queue_pipelines_under_slow_bursty_backend():
    """Regression for the round-4 TPU 504 storm: c=32 bursty clients with
    client-side timeouts against a slow backend. The queue must (a) keep
    goodput above the serial bound via inflight=2 pipelining, (b) never
    wedge, (c) drop ghosts instead of executing them."""
    import time as _time

    exec_log = []

    def run_batch(items):
        _time.sleep(0.05)  # slow backend: 50 ms per batch regardless of size
        exec_log.append(len(items))
        return [f"r{i}" for i in items]

    async def go():
        bq = BatchingQueue(
            run_batch, max_batch=16, window_ms=2, max_pending=64, inflight=2
        )
        await bq.start()

        async def client(i):
            try:
                return await asyncio.wait_for(bq.submit(i), timeout=1.5)
            except (asyncio.TimeoutError, QueueFullError):
                return None

        t0 = _time.perf_counter()
        out = []
        # 4 bursts of 32 concurrent clients
        for burst in range(4):
            out.extend(
                await asyncio.gather(
                    *[client(burst * 32 + i) for i in range(32)]
                )
            )
        wall = _time.perf_counter() - t0
        await bq.stop()
        return out, wall

    out, wall = asyncio.new_event_loop().run_until_complete(go())
    ok = [r for r in out if r is not None]
    # all 128 requests served (no timeouts at this modest load) ...
    assert len(ok) == 128
    # ... and strictly faster than the serial bound of 128/16 batches
    # back-to-back with no pipelining (8 × 50 ms = 400 ms + windows);
    # generous bound for CI jitter
    assert wall < 2.0


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_cli_parser_and_help(capsys):
    from trie_semantic_search_tpu.cli import build_parser, main

    p = build_parser()
    args = p.parse_args(["serve", "-p", "9000"])
    assert args.port == 9000 and args.fn is not None
    assert main([]) == 2  # no subcommand → help + exit 2


def test_cli_ingest_and_search(tmp_path, capsys, monkeypatch):
    from trie_semantic_search_tpu.cli import main

    cfg = Config()
    cfg.storage.db_path = str(tmp_path / "db.sqlite")
    cfg.trie.index_path = str(tmp_path / "trie")
    cfg.vector.hnsw.index_path = str(tmp_path / "vec")
    cfg.vector.hnsw.num_partitions = 8
    cfg_path = tmp_path / "config.toml"
    cfg.save_to_file(cfg_path)

    rc = main(["-c", str(cfg_path), "ingest", "--source", "mock"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["processed"] == 3

    rc = main(["-c", str(cfg_path), "build-index"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["cases"] == 3

    rc = main(["-c", str(cfg_path), "check-health"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["status"] == "healthy"

    rc = main(["-c", str(cfg_path), "search", "miranda v. arizona", "--limit", "3"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out[0]["case_metadata"]["name"] == "Miranda v. Arizona"

    rc = main(["-c", str(cfg_path), "completions", "brown"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and any("board" in x for x in out)


def test_reindex_endpoint(client):
    c, loop = client

    async def go():
        resp = await c.post("/admin/reindex")
        assert resp.status == 202
        data = await resp.json()
        assert data["status"] == "started"
        # wait for background rebuild to finish (small corpus)
        for _ in range(100):
            await asyncio.sleep(0.1)
            resp = await c.post("/admin/reindex")
            if resp.status == 202:
                break
        # search still works after the swap
        resp = await c.post("/search", json={"query": "brown v. board of education"})
        assert resp.status == 200
        data = await resp.json()
        assert data["total_results"] >= 1

    loop.run_until_complete(go())


def test_search_timeout_returns_504(tmp_path):
    state = make_state(tmp_path)
    state.config.search.search_timeout_ms = 1  # everything times out
    server = ApiServer(state)
    loop = asyncio.new_event_loop()

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        try:
            resp = await c.post("/search", json={"query": "brown v. board of education"})
            assert resp.status == 504
            data = await resp.json()
            assert "timeout" in data["error"].lower()
        finally:
            await c.close()

    loop.run_until_complete(go())
    loop.close()


def test_rate_limit_429(tmp_path):
    state = make_state(tmp_path)
    state.config.server.rate_limit_rpm = 3
    server = ApiServer(state)
    loop = asyncio.new_event_loop()

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        try:
            codes = []
            for _ in range(5):
                resp = await c.get("/stats")
                codes.append(resp.status)
            assert codes[:3] == [200, 200, 200]
            assert 429 in codes[3:]
        finally:
            await c.close()

    loop.run_until_complete(go())
    loop.close()


def test_payload_too_large_413(tmp_path):
    state = make_state(tmp_path)
    state.config.server.max_payload_size_mb = 1
    server = ApiServer(state)  # client_max_size set at construction
    loop = asyncio.new_event_loop()

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        try:
            big = {"query": "x" * (2 * 1024 * 1024)}
            resp = await c.post("/search", json=big)
            assert resp.status == 413
        finally:
            await c.close()

    loop.run_until_complete(go())
    loop.close()


def test_cli_config_dump(tmp_path, capsys):
    from trie_semantic_search_tpu.cli import main

    cfg = Config()
    cfg.server.port = 9123
    cfg_path = tmp_path / "c.toml"
    cfg.save_to_file(cfg_path)
    rc = main(["-c", str(cfg_path), "config-dump"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "port = 9123" in out
    # round-trips through the parser
    import tomllib

    parsed = tomllib.loads(out)
    assert parsed["server"]["port"] == 9123
    assert parsed["trie"]["content_window"] == 8


def test_cli_loadtest_against_test_server(tmp_path, capsys):
    """loadtest subcommand drives a live server and reports stats."""
    import threading

    from aiohttp.test_utils import TestServer as TS

    from trie_semantic_search_tpu.cli import main as cli_main

    state = make_state(tmp_path)
    server = ApiServer(state)
    loop = asyncio.new_event_loop()
    # the server's loop must keep running in a background thread while the
    # loadtest client (its own loop) fires requests at it
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    ts = TS(server.app)
    asyncio.run_coroutine_threadsafe(ts.start_server(), loop).result(30)
    port = ts.port
    try:
        rc = cli_main([
            "loadtest", "--url", f"http://127.0.0.1:{port}",
            "--requests", "6", "--concurrency", "3",
            "--query-template", "right to remain silent {i}",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert out["requests"] == 6
        assert out["errors"] == 0
        assert out["qps"] > 0 and out["p50_ms"] > 0
    finally:
        asyncio.run_coroutine_threadsafe(ts.close(), loop).result(30)
        loop.call_soon_threadsafe(loop.stop)
        thread.join(timeout=5)


def test_search_get_endpoint(client):
    """GET /search?query=... — the reference README's query-string form
    (README.md:102-118) with its documented response shape."""
    c, loop = client

    async def go():
        resp = await c.get("/search", params={"query": "brown v. board of education",
                                              "limit": "5"})
        assert resp.status == 200
        data = await resp.json()
        assert data["query"] == "brown v. board of education"
        top = data["results"][0]
        assert top["case_name"] == "Brown v. Board of Education"
        assert set(top) == {"case_name", "citation", "decision_date",
                            "snippet", "score", "match_type"}
        assert top["match_type"] == "case_name"
        # filters mirror the POST body
        resp = await c.get("/search", params={
            "query": "right to remain silent",
            "court": "Supreme Court of the United States",
            "date_from": "1950-01-01", "date_to": "1970-01-01",
        })
        assert resp.status == 200
        assert (await resp.json())["results"]
        # missing query → 400
        resp = await c.get("/search")
        assert resp.status == 400

    loop.run_until_complete(go())


def test_graphql_endpoint(client):
    """POST /graphql — the reference README's declared GraphQL schema
    (README.md:121-132)."""
    c, loop = client

    async def go():
        doc = ('query { search(query: "brown v. board of education", '
               'court: "Supreme Court of the United States", limit: 5) '
               '{ caseName citation score snippet } }')
        resp = await c.post("/graphql", json={"query": doc})
        assert resp.status == 200
        data = await resp.json()
        hits = data["data"]["search"]
        assert hits and hits[0]["caseName"] == "Brown v. Board of Education"
        assert set(hits[0]) == {"caseName", "citation", "score", "snippet"}

        # variables + alias + extra fields
        doc = ("query Q($q: String!) { search(query: $q) "
               "{ name: caseName matchType decisionDate } }")
        resp = await c.post("/graphql",
                            json={"query": doc, "variables": {"q": "miranda v. arizona"}})
        assert resp.status == 200
        hits = (await resp.json())["data"]["search"]
        assert hits[0]["name"] == "Miranda v. Arizona"
        assert hits[0]["matchType"] == "case_name"

        # errors: unknown field, unsupported root, bad json
        resp = await c.post("/graphql",
                            json={"query": "query { search(query: \"x y\") { nope } }"})
        assert resp.status == 400
        assert "unknown field" in (await resp.json())["errors"][0]["message"]
        resp = await c.post("/graphql", json={"query": "query { cases { id } }"})
        assert resp.status == 400
        resp = await c.post("/graphql", data="not json")
        assert resp.status == 400

    loop.run_until_complete(go())


def test_reindex_incremental_endpoint(tmp_path):
    """POST /admin/reindex?mode=incremental picks up a newly stored case
    without a full rebuild and hot-swaps it into the live engine."""
    state = make_state(tmp_path)
    server = ApiServer(state)
    loop = asyncio.new_event_loop()

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        try:
            resp = await c.post("/admin/reindex?mode=bogus")
            assert resp.status == 400

            resp = await c.get("/stats")
            before = (await resp.json())["engine"]["total_cases_indexed"]

            meta = CaseMetadata(
                id=new_case_id(), name="Gideon v. Wainwright",
                citation="372 U.S. 335 (1963)",
                court="Supreme Court of the United States",
                decision_date=dt.date(1963, 3, 18),
            )
            state.storage.store_case_metadata(meta)
            state.storage.store_case_text(
                meta.id, "The right to counsel is fundamental to a fair trial."
            )

            resp = await c.post("/admin/reindex?mode=incremental")
            assert resp.status == 202
            assert (await resp.json())["mode"] == "incremental"
            for _ in range(300):
                await asyncio.sleep(0.1)
                if not server._reindexing:
                    break
            assert not server._reindexing
            resp = await c.get("/stats")
            after = (await resp.json())["engine"]["total_cases_indexed"]
            assert after == before + 1
            resp = await c.post("/search", json={"query": "gideon v. wainwright"})
            data = await resp.json()
            assert data["total_results"] >= 1
            assert (data["results"][0]["case_metadata"]["name"]
                    == "Gideon v. Wainwright")
            # old cases still searchable after the incremental swap
            resp = await c.post("/search", json={"query": "miranda v. arizona"})
            assert ((await resp.json())["results"][0]["case_metadata"]["name"]
                    == "Miranda v. Arizona")
        finally:
            await c.close()

    loop.run_until_complete(go())
    loop.close()
