"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh (SURVEY.md §4: fake meshes so
sharded top-k merge is testable without TPU hardware). The env vars must be
set before JAX initialises its backends, hence the module-level setdefault
here (conftest imports before any test module).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU compiles fast and deterministic in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_config(tmp_path):
    """A Config pointing all paths into a temp dir."""
    from trie_semantic_search_tpu.core.config import Config

    cfg = Config()
    cfg.storage.db_path = str(tmp_path / "legal_search.db")
    cfg.storage.backup.backup_dir = str(tmp_path / "backups")
    cfg.trie.index_path = str(tmp_path / "trie_index")
    cfg.vector.hnsw.index_path = str(tmp_path / "vector_index")
    cfg.ingestion.cap.cache_dir = str(tmp_path / "cap_cache")
    cfg.ingestion.courtlistener.cache_dir = str(tmp_path / "cl_cache")
    cfg.ingestion.cache.disk_cache_path = str(tmp_path / "ingest_cache")
    return cfg


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    return devices
