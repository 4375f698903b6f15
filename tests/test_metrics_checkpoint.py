"""Metrics registry/reporter + model checkpointing tests."""

import logging
import time

import jax
import numpy as np
import pytest

from trie_semantic_search_tpu.core.metrics import (
    LatencyHistogram,
    MetricsRegistry,
    MetricsReporter,
)
from trie_semantic_search_tpu.models import minilm
from trie_semantic_search_tpu.models.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)

TINY = minilm.MiniLMConfig(
    vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64, max_position=16,
)


def test_histogram_percentiles():
    h = LatencyHistogram()
    for ms in range(1, 101):
        h.observe(float(ms))
    s = h.summary()
    assert s["count"] == 100
    assert 45 <= s["p50_ms"] <= 56
    assert s["p99_ms"] >= 95
    assert abs(s["mean_ms"] - 50.5) < 1


def test_registry_counters_and_timed():
    r = MetricsRegistry()
    r.inc("queries", 5)
    r.inc("queries")
    with r.timed("op"):
        time.sleep(0.001)
    snap = r.snapshot()
    assert snap["counters"]["queries"] == 6
    assert snap["latency"]["op"]["count"] == 1
    assert snap["latency"]["op"]["p50_ms"] >= 1.0


def test_reporter_logs(caplog):
    r = MetricsRegistry()
    r.inc("x")
    rep = MetricsReporter(interval_seconds=0.05, registry=r,
                          extra=lambda: {"probe": 1})
    with caplog.at_level(logging.INFO, logger="tss_tpu.metrics"):
        rep.start()
        time.sleep(0.15)
        rep.stop()
    assert any("metrics:" in rec.message for rec in caplog.records)


def test_engine_metrics_integration(tmp_config):
    """search_batch feeds the global registry."""
    from trie_semantic_search_tpu.core.metrics import metrics
    before = metrics.snapshot()["counters"].get("queries", 0)
    # engine built in test_search_engine covers the path; here just verify
    # the registry is importable + monotonic (full path covered elsewhere)
    metrics.inc("queries", 0)
    assert metrics.snapshot()["counters"].get("queries", 0) >= before


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    params = minilm.init_params(jax.random.PRNGKey(0), TINY)
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    save_checkpoint(tmp_path, 10, params, opt_state, metadata={"loss": 1.5})
    assert latest_step(tmp_path) == 10

    template = minilm.init_params(jax.random.PRNGKey(1), TINY)
    restored = restore_checkpoint(tmp_path, template, opt.init(template))
    assert restored is not None
    r_params, r_opt, meta = restored
    assert meta["step"] == 10 and meta["loss"] == 1.5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(r_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert r_opt is not None


def test_checkpoint_retention(tmp_path):
    params = minilm.init_params(jax.random.PRNGKey(0), TINY)
    for step in (1, 2, 3, 4):
        save_checkpoint(tmp_path, step, params, keep=2)
    steps = sorted(
        int(p.name.split("_")[1]) for p in tmp_path.iterdir() if p.is_dir()
    )
    assert steps == [3, 4]
    assert latest_step(tmp_path) == 4


def test_restore_missing_returns_none(tmp_path):
    params = minilm.init_params(jax.random.PRNGKey(0), TINY)
    assert restore_checkpoint(tmp_path / "nope", params) is None
    assert latest_step(tmp_path / "nope") is None


def test_periodic_task_runs_and_stops():
    from trie_semantic_search_tpu.core.maintenance import PeriodicTask

    hits = []
    t = PeriodicTask("t", 0.01, lambda: hits.append(1))
    t.start()
    deadline = time.monotonic() + 2.0
    while len(hits) < 2 and time.monotonic() < deadline:
        time.sleep(0.01)
    t.stop()
    n = len(hits)
    assert n >= 2  # ticked at least twice within 2s
    time.sleep(0.05)
    assert len(hits) == n  # stopped


def test_periodic_task_survives_errors():
    from trie_semantic_search_tpu.core.maintenance import PeriodicTask

    def boom():
        raise RuntimeError("x")

    t = PeriodicTask("b", 0.02, boom)
    t.start()
    time.sleep(0.07)
    t.stop()
    assert t.errors >= 1


def test_backup_task(tmp_path):
    from trie_semantic_search_tpu.core.config import StorageConfig
    from trie_semantic_search_tpu.core.maintenance import make_backup_task
    from trie_semantic_search_tpu.storage.store import StorageManager

    cfg = StorageConfig(db_path=str(tmp_path / "x.db"))
    cfg.backup.backup_dir = str(tmp_path / "backups")
    s = StorageManager(cfg)
    task = make_backup_task(s, cfg.backup)
    assert task is not None
    task.fn()  # one tick
    assert list((tmp_path / "backups").glob("*.db"))
    cfg.backup.enabled = False
    assert make_backup_task(s, cfg.backup) is None


def test_gc_task_triggers_on_threshold(monkeypatch):
    from trie_semantic_search_tpu.core.config import GcConfig
    from trie_semantic_search_tpu.core import maintenance

    cleared = []

    class FakeCache:
        def clear(self):
            cleared.append(1)

    monkeypatch.setattr(
        maintenance.SystemUtils, "memory_usage", staticmethod(lambda: 99)
    )
    task = maintenance.make_gc_task(
        GcConfig(memory_threshold_percent=0), caches=[FakeCache()]
    )
    # patch total memory to 100 bytes → pct = 99 >= 0 → fires
    task.fn()
    assert cleared
