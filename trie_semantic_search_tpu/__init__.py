"""trie_semantic_search_tpu — a TPU-native hybrid legal-search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``BraedenCu/trie-semantic-search`` (a Rust trie + semantic legal-search
engine): trie-based lexical search, transformer-embedding semantic search,
hybrid merge with metadata filtering, a CAP/CourtListener ingestion pipeline,
storage, REST API and CLI.

TPU-first architecture:
  * Query batches are the device workload: token paths resolve against a
    flattened CSR array-encoded trie automaton via batched gathers, and
    384-d MiniLM embeddings score against sharded corpus matrices via MXU
    matmuls with on-chip top-k.
  * Indexes are frozen immutable device arrays (atomic swap for updates) —
    no locks on the hot path.
  * Multi-chip scaling uses a ``jax.sharding.Mesh``: corpus shards along the
    ``data`` axis, shard-local top-k merged with XLA collectives over ICI.
"""

__version__ = "0.1.0"

from .core import (  # noqa: F401
    AppState,
    CaseId,
    CaseMetadata,
    Config,
    DocRef,
    Jurisdiction,
    SearchConfig,
    SearchError,
    new_case_id,
)

__all__ = [
    "AppState",
    "CaseId",
    "CaseMetadata",
    "Config",
    "DocRef",
    "Jurisdiction",
    "SearchConfig",
    "SearchError",
    "new_case_id",
    "__version__",
]
