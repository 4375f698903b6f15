"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh (SURVEY.md §4: fake meshes so
sharded top-k merge is testable without TPU hardware).

This environment's ``sitecustomize`` registers a TPU PJRT plugin at
interpreter startup and pins ``JAX_PLATFORMS`` to it, so env vars set here
would be too late. ``jax.config`` updates still work as long as no backend
has been initialised — force the CPU platform with 8 virtual devices before
any test imports touch ``jax.devices()``.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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
    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    return devices
