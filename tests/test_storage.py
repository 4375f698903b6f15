"""Storage tests (ref behaviours: storage.rs CRUD, batch tolerance, health
probe, backups) + device metadata columns."""

import datetime as dt

import numpy as np
import pytest

from trie_semantic_search_tpu.core.config import StorageConfig
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.storage import (
    MetadataColumns,
    StorageManager,
    date_to_int,
    int_to_date,
)


def make_case(name="Test v. Case", court="Supreme Court", date=dt.date(1954, 5, 17)):
    return CaseMetadata(
        id=new_case_id(),
        name=name,
        citation="347 U.S. 483 (1954)",
        court=court,
        decision_date=date,
        full_text="",
        word_count=10,
    )


@pytest.fixture()
def store(tmp_path):
    cfg = StorageConfig(db_path=str(tmp_path / "test.db"))
    cfg.backup.backup_dir = str(tmp_path / "backups")
    with StorageManager(cfg) as s:
        yield s


def test_metadata_roundtrip(store):
    m = make_case()
    store.store_case_metadata(m)
    got = store.get_case_metadata(m.id)
    assert got is not None
    assert got.name == m.name
    assert got.decision_date == m.decision_date
    assert store.get_case_metadata(new_case_id()) is None


def test_text_roundtrip_compressed(store):
    m = make_case()
    text = "The law is the law. " * 500
    store.store_case_text(m.id, text)
    assert store.get_case_text(m.id) == text


def test_text_roundtrip_uncompressed(tmp_path):
    cfg = StorageConfig(db_path=str(tmp_path / "u.db"), enable_compression=False)
    with StorageManager(cfg) as s:
        cid = new_case_id()
        s.store_case_text(cid, "plain text")
        assert s.get_case_text(cid) == "plain text"


def test_exists_delete_list(store):
    m = make_case()
    store.store_case_metadata(m)
    store.store_case_text(m.id, "x")
    assert store.case_exists(m.id)
    assert m.id in store.list_case_ids()
    assert store.delete_case(m.id)
    assert not store.case_exists(m.id)
    assert store.get_case_text(m.id) is None
    assert not store.delete_case(m.id)


def test_batch_store(store):
    cases = [(make_case(name=f"Case {i}"), f"text {i}") for i in range(5)]
    stored, errors = store.store_cases_batch(cases)
    assert stored == 5 and errors == []
    assert len(store.list_case_ids()) == 5


def test_iter_cases(store):
    m = make_case()
    store.store_case_metadata(m)
    store.store_case_text(m.id, "full text here")
    pairs = list(store.iter_cases())
    assert len(pairs) == 1
    assert pairs[0][0].id == m.id and pairs[0][1] == "full text here"


def test_stats(store):
    m = make_case()
    store.store_case_metadata(m)
    store.store_case_text(m.id, "x" * 1000)
    st = store.get_stats()
    assert st.total_cases == 1
    assert st.total_text_entries == 1
    assert st.db_size_bytes > 0
    assert st.compression_enabled


def test_health_check(store):
    store.health_check()  # must not raise


def test_backup_and_retention(store, tmp_path):
    store.store_case_metadata(make_case())
    store.config.backup.max_backups = 2
    paths = [store.create_backup() for _ in range(3)]
    assert all(p is not None for p in paths)
    import sqlite3

    with sqlite3.connect(paths[-1]) as conn:
        n = conn.execute("SELECT COUNT(*) FROM case_metadata").fetchone()[0]
    assert n == 1


def test_memory_db():
    with StorageManager(StorageConfig(db_type="memory")) as s:
        m = make_case()
        s.store_case_metadata(m)
        assert s.case_exists(m.id)
        assert s.create_backup() is None


# ---------------------------------------------------------------------------
# Device metadata columns
# ---------------------------------------------------------------------------


def test_date_int_roundtrip():
    d = dt.date(1966, 6, 13)
    assert int_to_date(date_to_int(d)) == d
    assert int_to_date(date_to_int(None)) is None
    assert date_to_int(dt.date(1970, 1, 1)) == 0


def test_columns_build_and_filters(store):
    cases = [
        make_case(court="Supreme Court", date=dt.date(1954, 5, 17)),
        make_case(court="Ninth Circuit", date=dt.date(1987, 1, 2)),
        make_case(court="Supreme Court", date=dt.date(1966, 6, 13)),
    ]
    for c in cases:
        store.store_case_metadata(c)
    cols = MetadataColumns.build(store.fetch_filter_columns())
    assert len(cols) == 3
    assert cols.court_ids.dtype == np.int32
    # same court string → same id
    sc_rows = [i for i, c in enumerate(cols.case_ids)]
    sc_ids = {cols.court_ids[i] for i in sc_rows}
    assert len(sc_ids) == 2  # two distinct courts
    # court filter encoding
    f = cols.encode_court_filter(["Supreme Court"])
    assert (f >= 0).sum() == 1
    missing = cols.encode_court_filter(["No Such Court"])
    assert missing[0] == -2  # matches nothing
    none_f = cols.encode_court_filter(None)
    assert (none_f == -1).all()
    # date range encoding
    lo, hi = cols.encode_date_range((dt.date(1960, 1, 1), dt.date(1970, 1, 1)))
    in_range = (cols.dates >= lo) & (cols.dates <= hi)
    assert in_range.sum() == 1  # only Miranda 1966
    lo, hi = cols.encode_date_range(None)
    assert ((cols.dates >= lo) & (cols.dates <= hi)).sum() == 3


def test_columns_save_load(store, tmp_path):
    for c in [make_case(), make_case(court="Tax Court")]:
        store.store_case_metadata(c)
    cols = MetadataColumns.build(store.fetch_filter_columns())
    p = tmp_path / "cols.npz"
    cols.save(p)
    loaded = MetadataColumns.load(p)
    assert loaded.case_ids == cols.case_ids
    assert (loaded.court_ids == cols.court_ids).all()
    assert (loaded.dates == cols.dates).all()
    assert loaded.court_vocab == cols.court_vocab


def test_row_of_case(store):
    m = make_case()
    store.store_case_metadata(m)
    cols = MetadataColumns.build(store.fetch_filter_columns())
    assert cols.row_of_case[m.id] == 0
