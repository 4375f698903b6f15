"""CLI driver — the ``legal-search-server`` binary.

Rebuild of ``/root/reference/src/main.rs:43-276`` widened into subcommands
(SURVEY.md §2: "CLI (serve, ingest, build-index, bench) driving JAX runtime
init"):

* ``serve``        — config load → logging → components → health verify →
  optional index rebuild → API server with graceful SIGINT shutdown
  (ref main() flow, main.rs:43-138; the reference's rebuild and shutdown
  were TODO stubs — both are real here)
* ``ingest``       — run the ingestion pipeline from a named source
* ``build-index``  — (re)build + save all frozen index artifacts
  (ref rebuild_indices TODO, main.rs:248-261)
* ``check-health`` — component health probes, exit code 0/1
  (ref --check-health, main.rs:97-99,207-245)
* ``completions``  — trie prefix completions from saved artifacts
* ``search``       — one-shot query from the command line
* ``bench``        — run the benchmark suite (see bench.py)

Shared flags: ``--config/-c``, ``--port/-p`` (CLI > env > file > defaults,
ref config.rs:20-24).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import signal
import sys
from typing import Optional

from .core.config import Config
from .core.logging import init_logging
from .core.types import AppState

_log = logging.getLogger("tss_tpu.cli")


def _load_config(args: argparse.Namespace) -> Config:
    cfg = Config.from_file(args.config)
    if getattr(args, "port", None):
        cfg.server.port = args.port
    return cfg


def _serving_mesh(cfg: Config):
    """Multi-chip serving mesh from config (round-1 VERDICT item 3): when
    the mesh section is enabled and more than one device is visible, the
    corpus shards over the ``data`` axis and the engine's fused step runs
    as ``sharded_fused_topk`` over ICI. Single-chip → None (local paths)."""
    if not cfg.mesh.enabled:
        return None
    import jax

    n = len(jax.devices())
    dp = cfg.mesh.data_parallel or (n // max(1, cfg.mesh.model_parallel))
    if dp <= 1:
        return None
    from .parallel.mesh import make_mesh

    mesh = make_mesh(cfg.mesh)
    _log.info("serving mesh: %s", dict(mesh.shape))
    return mesh


def _build_components(cfg: Config, rebuild: bool = False):
    """ref: initialize_components (main.rs:164-186)."""
    from .index.builder import build_indexes, load_artifacts, save_artifacts
    from .search.engine import SearchEngine
    from .storage.store import StorageManager

    storage = StorageManager(cfg.storage)
    artifacts = None if rebuild else load_artifacts(cfg)
    if artifacts is None:
        _log.info("building index artifacts from storage ...")
        built = build_indexes(storage, cfg)
        save_artifacts(built, cfg, storage=storage)
        trie, vector, columns = built.trie, built.vector, built.columns
    else:
        _log.info("loaded index artifacts from %s", cfg.trie.index_path)
        trie, vector, columns = artifacts
    engine = SearchEngine(
        cfg, storage, trie, vector, columns, mesh=_serving_mesh(cfg)
    )
    # ref: verify_component_health (main.rs:189-204)
    storage.health_check()
    engine.health_check()
    return storage, engine


def cmd_serve(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    init_logging(cfg.logging)
    storage, engine = _build_components(cfg, rebuild=args.rebuild_index)

    from .api.server import ApiServer
    from .core.metrics import MetricsReporter
    from .utils import SystemUtils

    from .core.maintenance import make_backup_task, make_gc_task

    reporter = None
    if cfg.logging.enable_metrics:
        reporter = MetricsReporter(
            interval_seconds=cfg.logging.metrics_interval_seconds,
            extra=lambda: {"rss": SystemUtils.memory_usage()},
        )
        reporter.start()
    maintenance = []
    backup_task = make_backup_task(storage, cfg.storage.backup)
    if backup_task:
        maintenance.append(backup_task)
    gc_task = make_gc_task(
        cfg.performance.gc,
        caches=[engine.query_cache, engine.vector_index.cache],
    )
    if gc_task:
        maintenance.append(gc_task)
    for task in maintenance:
        task.start()
    warmup_thread = None
    if not args.no_warmup:
        # warm in the background so the server binds immediately; early
        # queries just pay jit latency until the buckets are compiled
        # (observed: full warmup over a remote-compile tunnel can take
        # tens of minutes — blocking startup on it kept /health down)
        import threading

        def _warm():
            _log.info("warming up query-path compilations ...")
            engine.warmup()
            _log.info("warmup complete")

        warmup_thread = threading.Thread(target=_warm, name="warmup", daemon=True)
        warmup_thread.start()
    state = AppState(config=cfg, search_engine=engine, storage=storage)
    server = ApiServer(state)

    async def _main() -> None:
        loop = asyncio.get_running_loop()
        stop = asyncio.Event()
        for sig in (signal.SIGINT, signal.SIGTERM):
            loop.add_signal_handler(sig, stop.set)
        serve_task = asyncio.create_task(server.run())
        # ref main.rs:124-131 tokio::select!{ctrl_c | server}
        done, _ = await asyncio.wait(
            [serve_task, asyncio.create_task(stop.wait())],
            return_when=asyncio.FIRST_COMPLETED,
        )
        # graceful shutdown (the reference's TODO, main.rs:264-276)
        _log.info("shutting down: flushing storage, stopping batcher")
        serve_task.cancel()
        if warmup_thread is not None and warmup_thread.is_alive():
            # exiting mid-compile aborts inside the PJRT C++ layer
            # (observed: "terminate called ... FATAL: exception not
            # rethrown" when SIGINT lands during a remote compile); wait
            # for the in-flight device work to drain first
            _log.info("waiting for in-flight warmup compilation ...")
            await asyncio.to_thread(warmup_thread.join, 600)
        await server.batcher.stop()
        if reporter is not None:
            reporter.stop()
        for task in maintenance:
            task.stop()
        storage.flush()
        storage.close()

    asyncio.run(_main())
    return 0


def cmd_ingest(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    init_logging(cfg.logging)
    from .ingest.manager import IngestionManager
    from .ingest.sources import (
        CapDataSource,
        CourtListenerDataSource,
        MockDataSource,
    )
    from .storage.store import StorageManager

    storage = StorageManager(cfg.storage)
    mgr = IngestionManager(cfg, storage)
    mgr.register_source(MockDataSource())
    mgr.register_source(CapDataSource(cfg.ingestion.cap))
    mgr.register_source(CourtListenerDataSource(cfg.ingestion.courtlistener))

    async def _run():
        if args.incremental:
            return await mgr.check_for_updates(args.source, args.limit)
        return await mgr.ingest_bulk(args.source, args.limit)

    job = asyncio.run(_run())
    print(
        json.dumps(
            {
                "job": job.id,
                "status": job.status.value,
                "processed": job.stats.processed if job.stats else 0,
                "skipped": job.stats.skipped_duplicates if job.stats else 0,
                "failed_validation": job.stats.failed_validation if job.stats else 0,
                "error": job.error,
            }
        )
    )
    return 0 if job.error is None else 1


def cmd_build_index(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    init_logging(cfg.logging)
    from .storage.store import StorageManager

    storage = StorageManager(cfg.storage)
    if args.streaming:
        from .index.streaming import StreamingIndexBuilder

        built = StreamingIndexBuilder(
            storage, cfg, work_dir=args.work_dir,
            shard_chunks=args.shard_chunks,
        ).build(resume=not args.no_resume)
        extra = {
            "shards": built.report.shards,
            "resumed_from_row": built.report.resumed_from_row,
            "chunks_per_second": built.report.chunks_per_second,
            "peak_rss_bytes": built.report.peak_rss_bytes,
        }
    else:
        from .index.builder import build_indexes, save_artifacts

        built = build_indexes(
            storage, cfg, tune_recall=args.tune_recall,
            pretrain_steps=args.pretrain_steps,
        )
        save_artifacts(built, cfg, storage=storage)
        extra = {}
    print(
        json.dumps(
            {
                "cases": built.report.cases,
                "content_chunks": built.report.content_chunks,
                "citations": built.report.citations,
                "seconds": round(built.report.seconds, 3),
                "trie_path": cfg.trie.index_path,
                "vector_path": cfg.vector.hnsw.index_path,
                **extra,
            }
        )
    )
    return 0


def cmd_check_health(args: argparse.Namespace) -> int:
    """ref: run_health_checks (main.rs:207-245)."""
    cfg = _load_config(args)
    init_logging(cfg.logging)
    ok = True
    report: dict[str, str] = {}
    try:
        from .storage.store import StorageManager

        storage = StorageManager(cfg.storage)
        storage.health_check()
        report["storage"] = "healthy"
    except Exception as e:
        report["storage"] = f"unhealthy: {e}"
        ok = False
    try:
        _storage, engine = _build_components(cfg)
        engine.health_check()
        report["search_engine"] = "healthy"
    except Exception as e:
        report["search_engine"] = f"unhealthy: {e}"
        ok = False
    print(json.dumps({"status": "healthy" if ok else "unhealthy", **report}))
    return 0 if ok else 1


def cmd_search(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    init_logging(cfg.logging)
    _storage, engine = _build_components(cfg)
    from .search.engine import SearchQuery

    q = SearchQuery(query=args.query, max_results=args.limit)
    results = engine.search_with_params(q)
    print(json.dumps([r.to_json() for r in results], indent=2))
    return 0


def cmd_eval_retrieval(args: argparse.Namespace) -> int:
    """Held-out retrieval-quality eval of the semantic encoder through the
    full engine (models/quality.py): half-sentence + paraphrase probes →
    MRR / recall@k of the source case, plus a random-init-encoder control
    when requested. One JSON object to stdout."""
    cfg = _load_config(args)
    init_logging(cfg.logging)
    storage, engine = _build_components(cfg)
    from .models.quality import (
        build_probes,
        evaluate_embedder_direct,
        evaluate_engine,
    )

    docs: list[tuple[int, list[str]]] = []
    tp = engine._text_processor
    for row, _meta, text in storage.iter_cases_rowid():
        if len(docs) >= args.max_cases:
            break
        if text:
            docs.append(
                (row, tp.extract_sentences(tp.normalize_text(text)))
            )
    probes = build_probes(docs, max_probes=args.probes)
    from .models.quality import evaluate_stages

    out = {
        "probes": len(probes),
        "trained": evaluate_engine(engine, engine.columns, probes),
        # stage-by-stage MRR over the FULL index (exact oracle vs ANN at
        # the tuned nprobe) — locates where engine MRR diverges from the
        # exact ceiling (round-4 VERDICT item 5)
        "stages": evaluate_stages(engine, engine.columns, probes),
    }
    if args.control:
        # random-init control over the SAME probes + a bounded chunk
        # sample — compared LIKE-FOR-LIKE against the trained encoder
        # evaluated in the same direct search space ('trained' above
        # searches the WHOLE index, a much harder task; comparing it to
        # the control directly would misread corpus size as encoder
        # quality)
        from .models.embedder import Embedder

        rnd = Embedder(
            cfg.vector.model,
            tokenizer=engine.vector_index.embedder.tokenizer,
            model_config=engine.vector_index.embedder.model_config,
            seed=1234,
        )
        texts, cases = [], []
        for row, sents in docs[: args.max_cases]:
            for s in sents[:8]:
                texts.append(s)
                cases.append(row)
        out["trained_direct"] = evaluate_embedder_direct(
            engine.vector_index.embedder, texts, cases, probes
        )
        out["random_control"] = evaluate_embedder_direct(
            rnd, texts, cases, probes
        )
        out["comparability_note"] = (
            "compare trained_direct vs random_control (same search "
            "space); 'trained' searches the full index"
        )
    print(json.dumps(out, indent=2))
    return 0


def cmd_completions(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    init_logging(cfg.logging)
    _storage, engine = _build_components(cfg)
    print(json.dumps(engine.trie_index.get_completions(args.prefix, args.limit)))
    return 0


def cmd_loadtest(args: argparse.Namespace) -> int:
    """HTTP load generator against a running server: concurrent POST
    /search with distinct queries, reporting QPS + latency percentiles."""
    import time

    import aiohttp

    async def _run() -> dict:
        base = args.url.rstrip("/")
        url = base + "/search"
        latencies: list[float] = []
        errors = [0]
        by_status: dict[str, int] = {}
        sem = asyncio.Semaphore(args.concurrency)

        async def one(session: aiohttp.ClientSession, i: int) -> None:
            payload = {
                "query": args.query_template.format(i=i),
                "max_results": 5,
            }
            async with sem:
                t0 = time.perf_counter()
                try:
                    async with session.post(url, json=payload) as resp:
                        await resp.read()
                        by_status[str(resp.status)] = (
                            by_status.get(str(resp.status), 0) + 1
                        )
                        if resp.status != 200:
                            errors[0] += 1
                    latencies.append((time.perf_counter() - t0) * 1000)
                except (aiohttp.ClientError, asyncio.TimeoutError):
                    # TimeoutError is NOT a ClientError — without this an
                    # over-deadline request crashes the whole run
                    errors[0] += 1
                    by_status["client_error"] = (
                        by_status.get("client_error", 0) + 1
                    )

        timeout = aiohttp.ClientTimeout(total=args.timeout)
        async with aiohttp.ClientSession(timeout=timeout) as session:
            if args.wait_warm:
                # Gate the measured run on the server reporting a fully
                # warmed compile cache (every serve-time shape compiled) —
                # an un-warmed shape at load is a 504 storm (round-4 TPU
                # loadtest). Warmup over the remote-compile tunnel can take
                # many minutes on first boot; persistent cache makes
                # subsequent boots fast.
                deadline = time.monotonic() + args.wait_warm
                while time.monotonic() < deadline:
                    try:
                        async with session.get(base + "/stats") as resp:
                            st = await resp.json()
                        if st.get("engine", {}).get("is_warm"):
                            break
                    except aiohttp.ClientError:
                        pass
                    await asyncio.sleep(5)
                else:
                    print(
                        "warning: server never reported warm; measuring anyway",
                        file=sys.stderr,
                    )
            # warm pass (fills the query-shape caches on a cold server)
            await asyncio.gather(
                *(one(session, i) for i in range(args.concurrency))
            )
            latencies.clear()
            errors[0] = 0
            by_status.clear()
            t0 = time.perf_counter()
            await asyncio.gather(*(one(session, i) for i in range(args.requests)))
            wall = time.perf_counter() - t0
        latencies.sort()

        def pct(p: float) -> float:
            if not latencies:
                return float("nan")
            return latencies[min(len(latencies) - 1, int(p * len(latencies)))]

        return {
            "requests": args.requests,
            "concurrency": args.concurrency,
            "errors": errors[0],
            "by_status": by_status,
            "wall_s": round(wall, 2),
            "qps": round(args.requests / wall, 1) if wall else None,
            "p50_ms": round(pct(0.5), 1),
            "p95_ms": round(pct(0.95), 1),
            "p99_ms": round(pct(0.99), 1),
        }

    print(json.dumps(asyncio.run(_run())))
    return 0


def cmd_config_dump(args: argparse.Namespace) -> int:
    """Print the effective config (defaults + file + env) as TOML — the
    reference's Config::to_toml surface (config.rs:468-479)."""
    cfg = _load_config(args)
    print(cfg.to_toml())
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import importlib.util
    from pathlib import Path

    bench_path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench", bench_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    mod.main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="legal-search-server",
        description="TPU-native trie + semantic legal search engine",
    )
    p.add_argument("-c", "--config", default="config.toml", help="config file path")
    p.add_argument(
        "--platform", default=None, metavar="NAME",
        help="force the JAX platform (e.g. 'cpu'). Needed instead of "
             "JAX_PLATFORMS when an interpreter-start hook (sitecustomize) "
             "has already pinned a device platform",
    )
    sub = p.add_subparsers(dest="command")

    s = sub.add_parser("serve", help="run the API server")
    s.add_argument("-p", "--port", type=int, help="override server port")
    s.add_argument(
        "--rebuild-index", action="store_true", help="rebuild indexes on startup"
    )
    s.add_argument(
        "--no-warmup", action="store_true",
        help="skip pre-compiling the query path at startup",
    )
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("ingest", help="ingest cases from a source")
    s.add_argument("--source", default=None, help="source name (cap|courtlistener|mock)")
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--incremental", action="store_true")
    s.set_defaults(fn=cmd_ingest)

    s = sub.add_parser("build-index", help="(re)build frozen index artifacts")
    s.add_argument("--tune-recall", type=float, default=None,
                   help="auto-tune nprobe to this recall@10 target")
    s.add_argument("--pretrain-steps", type=int, default=0,
                   help="corpus-contrastive encoder pretraining steps")
    s.add_argument("--streaming", action="store_true",
                   help="checkpointed corpus-scale build (resumable)")
    s.add_argument("--work-dir", default=None,
                   help="streaming build working directory")
    s.add_argument("--shard-chunks", type=int, default=8192,
                   help="chunks per embedding shard / checkpoint interval")
    s.add_argument("--no-resume", action="store_true",
                   help="ignore an existing streaming-build checkpoint")
    s.set_defaults(fn=cmd_build_index)

    s = sub.add_parser("check-health", help="probe component health and exit")
    s.set_defaults(fn=cmd_check_health)

    s = sub.add_parser("search", help="one-shot query")
    s.add_argument("query")
    s.add_argument("--limit", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    s = sub.add_parser(
        "eval-retrieval",
        help="held-out retrieval-quality eval of the semantic encoder",
    )
    s.add_argument("--probes", type=int, default=256)
    s.add_argument("--max-cases", type=int, default=2000)
    s.add_argument("--control", action="store_true",
                   help="also score a random-init encoder control")
    s.set_defaults(fn=cmd_eval_retrieval)

    s = sub.add_parser("completions", help="trie prefix completions")
    s.add_argument("prefix")
    s.add_argument("--limit", type=int, default=10)
    s.set_defaults(fn=cmd_completions)

    s = sub.add_parser("bench", help="run the benchmark suite")
    s.set_defaults(fn=cmd_bench)

    s = sub.add_parser("config-dump", help="print the effective config as TOML")
    s.set_defaults(fn=cmd_config_dump)

    s = sub.add_parser("loadtest", help="HTTP load test against a running server")
    s.add_argument("--url", default="http://127.0.0.1:8080")
    s.add_argument("--requests", type=int, default=500)
    s.add_argument("--concurrency", type=int, default=32)
    s.add_argument("--timeout", type=float, default=120.0)
    s.add_argument("--query-template", default="question of due process number {i}")
    s.add_argument(
        "--wait-warm", type=float, default=0.0, metavar="SECONDS",
        help="poll /stats until engine.is_warm before the measured run "
             "(0 = don't wait)",
    )
    s.set_defaults(fn=cmd_loadtest)

    return p


def main(argv: Optional[list[str]] = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.platform:  # must precede any backend initialisation
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        # A dead TPU relay makes the first device op futex-hang forever
        # (not error). Probe and demote to CPU up front — same spirit as
        # the reference's check-health startup gate (main.rs:207-245):
        # degrade loudly, never hang.
        from .utils import guard_dead_tpu_relay

        if guard_dead_tpu_relay():
            print(
                "warning: TPU relay unreachable — falling back to the CPU "
                "backend", file=sys.stderr,
            )
    from .utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    if not getattr(args, "fn", None):
        parser.print_help()
        return 2
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
