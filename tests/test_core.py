"""Tests for core types, config, errors, utils (SURVEY.md §4: unit tests per
module — the reference only tested utils, ``utils.rs:205-228``; we cover the
whole core layer)."""

import datetime as dt
import uuid

import pytest

from trie_semantic_search_tpu.core import config as cfgmod
from trie_semantic_search_tpu.core import errors as errmod
from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import (
    CaseMetadata,
    DocRef,
    Jurisdiction,
    JurisdictionKind,
    SearchConfig,
    new_case_id,
)
from trie_semantic_search_tpu.utils import (
    SystemUtils,
    TextUtils,
    Timer,
    ValidationUtils,
    time_block,
)


# ---------------------------------------------------------------------------
# types
# ---------------------------------------------------------------------------


def test_docref_roundtrip_and_hash():
    r = DocRef(case_id=new_case_id(), paragraph_index=3, char_offset=17)
    r2 = DocRef.from_json(r.to_json())
    assert r == r2
    assert hash(r) == hash(r2)
    assert len({r, r2}) == 1


def test_jurisdiction_variants():
    s = Jurisdiction.state("California")
    assert s.kind == JurisdictionKind.STATE and s.name == "California"
    assert Jurisdiction.from_json(s.to_json()) == s
    assert Jurisdiction.from_json("federal") == Jurisdiction.federal()


def test_case_metadata_roundtrip():
    m = CaseMetadata(
        id=new_case_id(),
        name="Brown v. Board of Education",
        citation="347 U.S. 483 (1954)",
        court="Supreme Court of the United States",
        decision_date=dt.date(1954, 5, 17),
        judges=["Warren"],
        topics=["equal protection"],
        full_text="Separate educational facilities are inherently unequal.",
        word_count=7,
    )
    m2 = CaseMetadata.from_json(m.to_json())
    assert m2.name == m.name
    assert m2.decision_date == m.decision_date
    assert m2.id == m.id
    assert m2.jurisdiction == Jurisdiction.federal()


def test_search_config_defaults():
    # ref lib.rs:135-145
    sc = SearchConfig()
    assert sc.max_results == 10
    assert sc.min_similarity == 0.5
    assert sc.exact_match_weight == 2.0
    assert sc.enable_semantic and sc.enable_prefix


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


def test_config_defaults_match_reference():
    c = Config()
    # ref config.rs:485-493
    assert c.server.host == "127.0.0.1" and c.server.port == 8080
    assert c.server.rate_limit_rpm == 1000
    # ref config.rs:506-512
    assert c.ingestion.batch_size == 100
    assert c.ingestion.max_concurrent_downloads == 5
    assert c.ingestion.max_concurrent_jobs == 10
    assert c.ingestion.rate_limit_delay_ms == 500
    assert c.ingestion.retry_attempts == 3
    # ref config.rs:515-522
    assert c.ingestion.validation.min_text_length == 100
    assert c.ingestion.validation.required_fields == [
        "title",
        "date",
        "court",
        "case_name",
    ]
    # ref config.rs:564-570
    assert c.vector.hnsw.m == 16
    assert c.vector.hnsw.ef_construction == 200
    assert c.vector.hnsw.ef_search == 50
    assert c.vector.hnsw.max_elements == 10_000_000
    # TPU north star: 384-d MiniLM
    assert c.vector.dimension == 384
    assert c.vector.model.batch_size == 32
    assert c.vector.model.max_sequence_length == 512
    # ref config.rs:587-595
    assert c.search.default_max_results == 10
    assert c.search.search_timeout_ms == 5000
    assert c.search.query_cache_size == 10000
    assert c.search.query_cache_ttl_seconds == 3600
    assert c.search.min_query_length == 2
    assert c.search.max_query_length == 1000
    # performance defaults resolve cpu counts
    assert c.performance.worker_threads >= 1
    assert c.performance.cpu_pool_size >= 2 * 1 or c.performance.cpu_pool_size >= 1


def test_config_toml_roundtrip(tmp_path):
    c = Config()
    c.server.port = 9999
    c.vector.dimension = 768
    p = tmp_path / "config.toml"
    c.save_to_file(p)
    c2 = Config.from_file(p)
    assert c2.server.port == 9999
    assert c2.vector.dimension == 768
    assert c2.ingestion.cap.api_url == c.ingestion.cap.api_url


def test_config_missing_file_uses_defaults(tmp_path):
    c = Config.from_file(tmp_path / "nope.toml")
    assert c.server.port == 8080


def test_config_env_overrides(tmp_path, monkeypatch):
    # ref config.rs:395-420
    monkeypatch.setenv("LEGAL_SEARCH_HOST", "0.0.0.0")
    monkeypatch.setenv("LEGAL_SEARCH_PORT", "7777")
    monkeypatch.setenv("LEGAL_SEARCH_API_KEY", "sekrit")
    monkeypatch.setenv("LEGAL_SEARCH_DB_PATH", "/tmp/x.db")
    monkeypatch.setenv("LEGAL_SEARCH_MODEL_PATH", "/tmp/model")
    c = Config.from_file(tmp_path / "nope.toml")
    assert c.server.host == "0.0.0.0"
    assert c.server.port == 7777
    assert c.server.api_key == "sekrit"
    assert c.storage.db_path == "/tmp/x.db"
    assert c.vector.model.model_path == "/tmp/model"


def test_config_env_bad_port(tmp_path, monkeypatch):
    monkeypatch.setenv("LEGAL_SEARCH_PORT", "not-a-port")
    with pytest.raises(errmod.ConfigError):
        Config.from_file(tmp_path / "nope.toml")


def test_config_validation_failures():
    c = Config()
    c.server.port = 0
    with pytest.raises(errmod.ValidationFailed):
        c.validate()
    c = Config()
    c.vector.dimension = 0
    with pytest.raises(errmod.ValidationFailed):
        c.validate()
    c = Config()
    c.search.min_query_length = 2000
    with pytest.raises(errmod.ValidationFailed):
        c.validate()


def test_config_sled_coerced_to_sqlite():
    c = Config()
    c.storage.db_type = "sled"
    c.validate()
    assert c.storage.db_type == "sqlite"


def test_config_parses_reference_style_toml(tmp_path):
    # A reference-shaped TOML file (including HNSW keys) must parse.
    p = tmp_path / "ref.toml"
    p.write_text(
        """
[server]
host = "10.0.0.1"
port = 8081

[vector]
dimension = 768

[vector.hnsw]
m = 32
ef_search = 100

[storage]
db_type = "sled"
""",
        encoding="utf-8",
    )
    c = Config.from_file(p)
    assert c.server.host == "10.0.0.1"
    assert c.vector.hnsw.m == 32
    assert c.vector.hnsw.ef_search == 100
    assert c.storage.db_type == "sqlite"


# ---------------------------------------------------------------------------
# errors
# ---------------------------------------------------------------------------


def test_error_taxonomy_categories_and_recoverability():
    # ref errors.rs:222-232: network/rate-limit/source errors recoverable
    assert errmod.NetworkError("x").is_recoverable()
    assert errmod.RateLimitExceeded("cap").is_recoverable()
    assert errmod.SourceUnavailable("cap", "down").is_recoverable()
    assert errmod.SearchTimeout(5000).is_recoverable()
    assert not errmod.InvalidSearchQuery("q", "too short").is_recoverable()
    assert not errmod.ConfigError("bad").is_recoverable()
    # categories (ref errors.rs:235-273)
    assert errmod.TrieLookupError("q", "d").category == "trie"
    assert errmod.AnnSearchError("d").category == "vector"
    assert errmod.DatabaseError("d").category == "storage"
    assert errmod.InvalidApiRequest("d").category == "api"


def test_error_messages_and_json():
    e = errmod.ValidationFailed(field="server.port", reason="Port cannot be zero")
    assert "server.port" in str(e)
    j = e.to_json()
    assert j["category"] == "validation"
    assert j["field"] == "server.port"
    assert errmod.RateLimitExceeded("cap").recovery_suggestion()


def test_error_macro_helpers():
    e = errmod.internal_error("bad state: {}", 42)
    assert "42" in str(e)
    v = errmod.validation_error("f", "must be {}", "set")
    assert v.fields["field"] == "f"


def test_all_errors_are_search_errors():
    assert len(errmod.ALL_ERRORS) >= 35
    for cls in errmod.ALL_ERRORS:
        assert issubclass(cls, errmod.SearchError)


# ---------------------------------------------------------------------------
# utils (ports of the reference's own tests, utils.rs:205-228)
# ---------------------------------------------------------------------------


def test_text_truncate():
    assert TextUtils.truncate("Hello world", 20) == "Hello world"
    assert TextUtils.truncate("This is a very long text", 10) == "This is..."


def test_format_bytes():
    assert SystemUtils.format_bytes(512) == "512 B"
    assert SystemUtils.format_bytes(1024) == "1.00 KB"
    assert SystemUtils.format_bytes(1048576) == "1.00 MB"


def test_validation_utils():
    assert ValidationUtils.is_valid_search_query("test query", 2, 100)
    assert not ValidationUtils.is_valid_search_query("", 2, 100)
    assert not ValidationUtils.is_valid_search_query("a", 2, 100)
    assert ValidationUtils.is_valid_case_id(str(uuid.uuid4()))
    assert not ValidationUtils.is_valid_case_id("not-a-uuid")
    assert ValidationUtils.is_valid_citation("347 U.S. 483 (1954)")
    assert not ValidationUtils.is_valid_citation("chapter 11")
    assert ValidationUtils.sanitize_filename("a/b c.txt") == "a_b_c.txt"


def test_timer_and_time_block():
    t = Timer("x")
    assert t.elapsed_ms() >= 0
    with time_block("blk") as timer:
        pass
    assert timer.elapsed_ms() >= 0


def test_text_utils_misc():
    assert TextUtils.word_count("a b  c") == 3
    assert TextUtils.extract_preview("one two three four", 2) == "one two..."
    assert TextUtils.extract_preview("one", 5) == "one"
    assert TextUtils.text_hash("abc") == TextUtils.text_hash("abc")
    assert TextUtils.text_hash("abc") != TextUtils.text_hash("abd")
    assert TextUtils.sanitize("a\x00b\tc") == "ab\tc"


def test_system_utils_probes_implemented():
    # The reference left these as TODO (utils.rs:103-112); ours work on Linux.
    assert SystemUtils.memory_usage() is None or SystemUtils.memory_usage() > 0
    assert SystemUtils.uptime() is None or SystemUtils.uptime() > 0
    anon = SystemUtils.anon_memory_usage()
    assert anon is None or 0 < anon <= (SystemUtils.memory_usage() or anon)


def test_madvise_dontneed_memmap_roundtrip(tmp_path):
    """madvise(MADV_DONTNEED) on a MAP_SHARED write memmap must never lose
    data — pages refault from page cache — and must no-op on plain
    arrays (the corpus-scale finalize calls it on every slab)."""
    import numpy as np

    from trie_semantic_search_tpu.utils import madvise_dontneed

    mm = np.lib.format.open_memmap(
        tmp_path / "a.npy", mode="w+", dtype=np.int8, shape=(1 << 20,)
    )
    mm[:] = 7
    assert madvise_dontneed(mm) is True
    assert int(mm[123456]) == 7  # refault: data intact
    mm.flush()
    assert np.load(tmp_path / "a.npy")[999999] == 7
    assert madvise_dontneed(np.zeros(4)) is False
