"""API server tests (aiohttp test client) + batching queue + CLI."""

import asyncio
import datetime as dt
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from trie_semantic_search_tpu.api.batching import BatchingQueue
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
