"""Hierarchical configuration system.

TPU-native rebuild of the reference's config module
(``/root/reference/src/config.rs:46-615``): the same nine-section typed tree
(server, ingestion{cap, courtlistener, validation, cache}, text_processing,
trie, vector{model, hnsw→ann}, storage{backup}, search, logging, performance
{gc}) with the same defaults, plus a TPU-specific ``mesh`` section.

Precedence (ref: ``config.rs:20-24``): CLI args > environment variables >
TOML file > defaults. Env overrides (ref: ``config.rs:395-420``):
``LEGAL_SEARCH_HOST/PORT/API_KEY/DB_PATH/MODEL_PATH``.

Parsing uses :mod:`tomllib`; serialisation back to TOML
(ref ``to_toml``/``save_to_file``, ``config.rs:468-479``) is implemented by a
small writer in this module since the stdlib has no TOML emitter.
"""

from __future__ import annotations

import dataclasses
import os
import tomllib
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, Optional

from .errors import ConfigError, ValidationFailed

# ---------------------------------------------------------------------------
# Section dataclasses (defaults mirror config.rs:482-615)
# ---------------------------------------------------------------------------


@dataclass
class ServerConfig:
    """ref: config.rs:69-85"""

    host: str = "127.0.0.1"
    port: int = 8080
    max_payload_size_mb: int = 10
    request_timeout_seconds: int = 30
    enable_cors: bool = True
    api_key: Optional[str] = None
    rate_limit_rpm: int = 1000
    # micro-batcher (TPU-native addition — the reference served each
    # request straight into the engine, api.rs:113-157; on TPU concurrent
    # requests coalesce into one device batch). batch_max should stay on
    # the utils.BATCH_BUCKETS ladder: warmup pre-compiles its bucket.
    batch_max: int = 64
    batch_window_ms: float = 2.0
    batch_inflight: int = 2
    batch_max_pending: int = 256


@dataclass
class CapConfig:
    """ref: config.rs:119-129"""

    api_url: str = "https://api.case.law/v1/"
    api_key: Optional[str] = None
    bulk_data_url: str = "https://bulk.case.law/"
    cache_dir: str = "./data/cap_cache"


@dataclass
class CourtListenerConfig:
    """ref: config.rs:132-140"""

    api_url: str = "https://www.courtlistener.com/api/rest/v3/"
    api_key: Optional[str] = None
    cache_dir: str = "./data/cl_cache"


@dataclass
class ValidationConfig:
    """ref: config.rs:329-343; defaults config.rs:515-522"""

    min_text_length: int = 100
    max_text_length: int = 1_000_000
    required_fields: list[str] = field(
        default_factory=lambda: ["title", "date", "court", "case_name"]
    )
    allow_empty_citations: bool = False
    validate_dates: bool = True
    validate_citations: bool = True


@dataclass
class CacheConfig:
    """ref: config.rs:346-358; defaults config.rs:523-529"""

    enabled: bool = True
    max_memory_entries: int = 100_000
    disk_cache_path: Optional[str] = None
    max_disk_size_mb: int = 1024
    ttl_hours: int = 24


@dataclass
class IngestionConfig:
    """ref: config.rs:88-116; defaults config.rs:494-530"""

    cap: CapConfig = field(default_factory=CapConfig)
    courtlistener: CourtListenerConfig = field(default_factory=CourtListenerConfig)
    batch_size: int = 100
    max_concurrent_downloads: int = 5
    max_concurrent_jobs: int = 10
    rate_limit_delay_ms: int = 500
    max_memory_usage_mb: int = 1024
    retry_attempts: int = 3
    retry_delay_seconds: int = 5
    enable_incremental_updates: bool = True
    update_check_interval_hours: int = 24
    validation: ValidationConfig = field(default_factory=ValidationConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)


@dataclass
class SentenceSplittingConfig:
    """ref: config.rs:168-176"""

    enabled: bool = True
    min_sentence_length: int = 10
    max_sentence_length: int = 1000


@dataclass
class TextProcessingConfig:
    """ref: config.rs:143-165; defaults config.rs:531-546"""

    tokenizer_model_path: str = "./models/tokenizer.json"
    enable_case_folding: bool = True
    enable_unicode_normalization: bool = True
    preserve_legal_citations: bool = True
    max_text_length: int = 1_000_000
    remove_extra_whitespace: bool = True
    normalize_quotes: bool = True
    extract_citations: bool = True
    extract_entities: bool = True
    sentence_splitting: SentenceSplittingConfig = field(
        default_factory=SentenceSplittingConfig
    )


@dataclass
class TrieConfig:
    """ref: config.rs:179-193; defaults config.rs:547-554.

    ``use_fst`` is reinterpreted for TPU: when true the trie is frozen into
    the flattened CSR array automaton (device arrays); when false it stays a
    host-side dict trie (useful for incremental building before a freeze).
    ``enable_memory_mapping`` maps to zero-copy mmap loading of the ``.npz``
    artifact on the host before device upload.
    """

    use_fst: bool = True
    index_case_names: bool = True
    index_citations: bool = True
    max_prefix_length: int = 50
    index_path: str = "./data/trie_index"
    enable_memory_mapping: bool = True
    # TPU-native content-indexing budget: sliding window width and the cap
    # on windows per paragraph (bounds content-trie size; phrase matches
    # up to `content_window` tokens long match anywhere).
    content_window: int = 8
    max_windows_per_paragraph: int = 512
    #: which token positions start a content window: "all" (phrase matches
    #: anywhere; node count grows with every token — viable to ~100k cases),
    #: "phrase_start" (sentence starts + stopword→word boundaries — ~5x
    #: fewer nodes; phrases match when they begin at a natural phrase
    #: boundary — the CAP-scale default for streaming builds), or
    #: "sentence_start" (smallest; prefix-of-sentence matching only).
    content_windowing: str = "all"


@dataclass
class EmbeddingModelConfig:
    """ref: config.rs:211-225; defaults config.rs:556-563.

    ``model_path`` points at a weight checkpoint (orbax/npz/HF safetensors
    dir) instead of ONNX; ``use_gpu`` becomes ``use_accelerator`` semantics
    (TPU if present) but keeps its name for config-file parity.
    """

    model_path: str = "./models/minilm"
    tokenizer_path: str = "./models/tokenizer.json"
    model_type: str = "minilm-l6"
    use_gpu: bool = False
    batch_size: int = 32
    max_sequence_length: int = 512


@dataclass
class AnnConfig:
    """Partitioned/ScaNN-style ANN configuration — the TPU-native replacement
    for the reference's HNSW section (ref: config.rs:228-240; defaults
    config.rs:564-570). The HNSW fields are retained so reference config
    files parse unchanged; the partitioned-scan fields drive the real index.

    Mapping: ``ef_search`` ≈ ``num_probes`` (search breadth),
    ``ef_construction`` ≈ k-means train iterations, ``m`` is unused on TPU
    (no graph links) but validated for parity.
    """

    # Reference-parity HNSW fields
    m: int = 16
    ef_construction: int = 200
    ef_search: int = 50
    max_elements: int = 10_000_000
    index_path: str = "./data/vector_index"
    # TPU partitioned-scan fields
    num_partitions: int = 0  # 0 → auto: ~sqrt(N) rounded to multiple of 8
    num_probes: int = 0  # 0 → auto: max(1, num_partitions // 10)
    quantize_int8: bool = True  # int8 store + f32 rescoring of survivors
    rescore_factor: int = 4  # rescore top (k * factor) candidates in f32
    kmeans_iters: int = 20
    kmeans_sample: int = 200_000  # max points used to train partitions
    #: Bound on total partition slots as a multiple of N: the dense
    #: [P, m, D] device layout sizes m by the LARGEST partition, so one
    #: giant k-means cluster (e.g. a big duplicate-text group) would blow
    #: host+HBM memory quadratically. Capacity caps at
    #: ceil(partition_overalloc * N / P) and overflow rows reassign to
    #: their next-best centroid with free space (balanced IVF).
    partition_overalloc: float = 2.0
    #: Deduplicate exact-duplicate vectors in the k-means TRAINING sample
    #: (assignment still places every copy). MEASURED HARMFUL, default
    #: off: a mega duplicate group's mass is what earns it a centroid;
    #: dedup makes the group homeless, the overflow rebalancer scatters
    #: its copies, and recall collapses for every query near its topic
    #: (bench_results/spill_lab_r05.json: mean@nprobe16 0.52 deduped vs
    #: 0.73 baseline vs 0.78 with pad_replicas). Kept as a knob for
    #: corpora whose duplicates are noise rather than boilerplate.
    kmeans_dedup: bool = False
    #: Fill the dead padding slots of the dense [P, m, D] partition
    #: layout with REPLICAS of rows whose second-choice centroid is that
    #: partition (scattered overflow rows first, then border rows).
    #: Zero extra device memory — the slots exist either way — and each
    #: replica doubles the chance a probe set reaches the row. Search
    #: paths dedup (by row in ann.search, by case in the fused program).
    pad_replicas: bool = True
    #: Centroid choices considered per row by the pad-replica planner.
    replica_choices: int = 8
    #: Worst-probe recall floor for build-time nprobe tuning (round-3
    #: VERDICT item 7): tuning accepts an nprobe only when the MEAN probe
    #: recall reaches the target AND no single probe falls below this.
    #: 0 disables the floor (mean-only tuning, the round-3 behavior that
    #: shipped a 0.90-min tail under a 0.984 mean).
    tune_min_recall: float = 0.95
    #: Run build-time nprobe tuning at finalize. The tuner's exact oracle
    #: brute-scans the whole corpus per probe — a device matmul (seconds
    #: on one chip) but hours on the 1-core CPU fallback at multi-M-chunk
    #: scale, so pipeline-scale harness builds switch it off; serving
    #: artifacts should leave it on (an untuned artifact falls back to
    #: the ~P/10 default_nprobe heuristic at load).
    tune_on_build: bool = True


# Alias for reference-name parity.
HnswConfig = AnnConfig


@dataclass
class VectorConfig:
    """ref: config.rs:196-208; defaults config.rs:555-573.

    ``dimension`` defaults to 384 (MiniLM-L6) rather than the reference's
    768 default, per the BASELINE north star; set 768 for Legal-BERT.
    """

    model: EmbeddingModelConfig = field(default_factory=EmbeddingModelConfig)
    hnsw: AnnConfig = field(default_factory=AnnConfig)
    dimension: int = 384
    similarity_threshold: float = 0.5
    max_ann_results: int = 100
    #: Build-time retrieval-quality gate (round-3 VERDICT item 5): index
    #: finalize probes the finished artifact's encoder against a
    #: random-init control of the same geometry and persists the metrics
    #: in the artifact meta (``quality.json``). "warn" logs when the
    #: trained encoder regresses below ``quality_gate_margin`` x the
    #: control's probe MRR; "refuse" aborts the build instead (a degraded
    #: encoder can never finalize silently); "off" skips the probes.
    quality_gate: str = "warn"
    quality_gate_probes: int = 128
    quality_gate_sample_cases: int = 200
    #: trained MRR must reach this fraction of the random-init control's
    quality_gate_margin: float = 0.8
    #: Sentence pooling for the encoder: "auto" selects mean vs SIF on
    #: probe merit at build time (models/train.select_pooling_guarded);
    #: "mean"/"sif" force one. SIF weights persist with the encoder
    #: artifact — queries must pool the same way the corpus did.
    pooling: str = "auto"
    sif_a: float = 0.1


@dataclass
class BackupConfig:
    """ref: config.rs:258-268; defaults config.rs:580-585"""

    enabled: bool = True
    backup_dir: str = "./backups"
    interval_hours: int = 24
    max_backups: int = 7


@dataclass
class StorageConfig:
    """ref: config.rs:243-255; defaults config.rs:575-586.

    ``db_type`` default becomes "sqlite" (the reference's "sled" has no
    Python analogue); "sled" in a config file is accepted and coerced.
    """

    db_type: str = "sqlite"
    db_path: str = "./data/legal_search.db"
    max_db_size_gb: int = 100
    enable_compression: bool = True
    backup: BackupConfig = field(default_factory=BackupConfig)


@dataclass
class SearchEngineConfig:
    """ref: config.rs:271-287; defaults config.rs:587-595"""

    default_max_results: int = 10
    search_timeout_ms: int = 5000
    #: run the single-program fused device query step (semantic scan +
    #: device filter masks + lexical boost + top-k in one jit program)
    #: instead of the staged path. Semantics parity-tested (incl. MatchType
    #: provenance), and results are bit-identical to the staged path when
    #: ``fused_recall_target >= 1.0``. With the default recall target < 1
    #: the semantic *candidate set* is approximate on TPU (Pallas fused
    #: scan / ``approx_max_k`` partial reductions — candidate recall ≈ the
    #: target, final ordering exact), so results may differ from exact mode
    #: in ~(1-target) of semantic slots. Default ON since round 2 — it is
    #: the measured-fast serving path; set False to serve through the
    #: reference-shaped staged pipeline.
    use_fused_device_path: bool = True
    #: fused-path ANN mode: "auto" picks partitioned probing above ~50k
    #: chunks (work per query independent of N) and the exact brute scan
    #: below; "brute"/"partitioned" force one.
    fused_ann_mode: str = "auto"
    #: device dedup-by-case over-fetch: the fused step examines
    #: k*fused_overfetch chunk candidates so k slots still fill with
    #: distinct cases when one case's chunks crowd the chunk-level top-k.
    fused_overfetch: int = 4
    #: semantic-candidate recall target for the fused brute scan. < 1.0
    #: permits the partial-reduction kernels on TPU (the Pallas fused scan /
    #: approx_max_k — candidate recall ≈ this value, final ordering exact);
    #: 1.0 forces the exact reduction everywhere.
    fused_recall_target: float = 0.97
    #: score-aware fallback for the partitioned probe path: when a served
    #: top-k's score boundary is FLAT (spread ≤ eps·|top1| + 1e-6 — the
    #: measured signature of the tie-audit recall losses: generic queries
    #: whose oracle top-k is a wide exact-score tie scattered across
    #: partitions the centroid ranking never probes), the query re-runs
    #: through the exact layout stream, which reads every partition and
    #: cannot miss tie members. Adds 2 pre-warmed jit programs and costs
    #: one extra device dispatch only on flagged queries.
    fused_flat_escalate: bool = True
    fused_flat_escalate_eps: float = 0.01
    enable_query_cache: bool = True
    query_cache_size: int = 10000
    query_cache_ttl_seconds: int = 3600
    min_query_length: int = 2
    max_query_length: int = 1000


@dataclass
class LoggingConfig:
    """ref: config.rs:290-302; defaults config.rs:596-602"""

    level: str = "info"
    file_path: Optional[str] = None
    json_format: bool = False
    enable_metrics: bool = True
    metrics_interval_seconds: int = 60


@dataclass
class GcConfig:
    """ref: config.rs:318-326; defaults config.rs:607-611"""

    enabled: bool = True
    interval_seconds: int = 300
    memory_threshold_percent: int = 80


@dataclass
class PerformanceConfig:
    """ref: config.rs:305-315; defaults config.rs:603-612"""

    worker_threads: int = 0  # 0 → os.cpu_count()
    cpu_pool_size: int = 0  # 0 → 2 * os.cpu_count()
    enable_memory_pool: bool = True
    gc: GcConfig = field(default_factory=GcConfig)

    def __post_init__(self) -> None:
        ncpu = os.cpu_count() or 1
        if self.worker_threads <= 0:
            self.worker_threads = ncpu
        if self.cpu_pool_size <= 0:
            self.cpu_pool_size = ncpu * 2


@dataclass
class MeshConfig:
    """TPU-specific section (no reference analogue; SURVEY.md §2 notes the
    rebuild "adds mesh/topology section").

    The corpus (embedding shards + postings) is sharded along ``data`` axis
    chips; the encoder runs tensor-parallel along ``model`` when
    ``model_parallel > 1``. Shapes: ``data * model`` must equal the device
    count in use.
    """

    enabled: bool = True
    data_parallel: int = 0  # 0 → all devices
    model_parallel: int = 1
    axis_names: tuple[str, str] = ("data", "model")
    #: pad corpus shards to a multiple of this many rows (MXU tiling)
    shard_row_multiple: int = 1024


@dataclass
class Config:
    """Top-level config (ref: config.rs:46-66) + TPU ``mesh`` section."""

    server: ServerConfig = field(default_factory=ServerConfig)
    ingestion: IngestionConfig = field(default_factory=IngestionConfig)
    text_processing: TextProcessingConfig = field(default_factory=TextProcessingConfig)
    trie: TrieConfig = field(default_factory=TrieConfig)
    vector: VectorConfig = field(default_factory=VectorConfig)
    storage: StorageConfig = field(default_factory=StorageConfig)
    search: SearchEngineConfig = field(default_factory=SearchEngineConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    performance: PerformanceConfig = field(default_factory=PerformanceConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # -- loading ------------------------------------------------------------

    @classmethod
    def load(cls) -> "Config":
        """Load from the default location (ref: config.rs:362-364)."""
        return cls.from_file("config.toml")

    @classmethod
    def from_file(cls, path: str | Path) -> "Config":
        """Load from a TOML file with env overrides + validation
        (ref: config.rs:367-392). Missing file → defaults, like the ref."""
        path = Path(path)
        if not path.exists():
            cfg = cls()
            cfg.apply_env_overrides()
            cfg.validate()
            return cfg
        try:
            content = path.read_bytes()
        except OSError as e:
            raise ConfigError(f"Failed to read config file {path}: {e}") from e
        try:
            raw = tomllib.loads(content.decode("utf-8"))
        except (tomllib.TOMLDecodeError, UnicodeDecodeError) as e:
            raise ConfigError(f"Failed to parse config file {path}: {e}") from e
        cfg = cls.from_dict(raw)
        cfg.apply_env_overrides()
        cfg.validate()
        return cfg

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        return _dataclass_from_dict(cls, raw)

    # -- env overrides (ref: config.rs:395-420) -----------------------------

    def apply_env_overrides(self) -> None:
        env = os.environ
        if "LEGAL_SEARCH_HOST" in env:
            self.server.host = env["LEGAL_SEARCH_HOST"]
        if "LEGAL_SEARCH_PORT" in env:
            try:
                self.server.port = int(env["LEGAL_SEARCH_PORT"])
            except ValueError:
                raise ConfigError("Invalid port number in LEGAL_SEARCH_PORT")
        if "LEGAL_SEARCH_API_KEY" in env:
            self.server.api_key = env["LEGAL_SEARCH_API_KEY"]
        if "LEGAL_SEARCH_DB_PATH" in env:
            self.storage.db_path = env["LEGAL_SEARCH_DB_PATH"]
        if "LEGAL_SEARCH_MODEL_PATH" in env:
            self.vector.model.model_path = env["LEGAL_SEARCH_MODEL_PATH"]

    # -- validation (ref: config.rs:423-465) --------------------------------

    def validate(self) -> None:
        if self.server.port == 0:
            raise ValidationFailed(field="server.port", reason="Port cannot be zero")
        # Unlike the reference we do NOT require model_path to exist: the
        # encoder can run with deterministic random-init weights (the ref's
        # own model path check pointed at a stub anyway, vector.rs:168-181).
        if self.vector.dimension <= 0:
            raise ValidationFailed(
                field="vector.dimension",
                reason="Vector dimension must be greater than zero",
            )
        if self.vector.hnsw.m <= 0:
            raise ValidationFailed(
                field="vector.hnsw.m", reason="HNSW M parameter must be greater than zero"
            )
        if self.search.min_query_length > self.search.max_query_length:
            raise ValidationFailed(
                field="search.min_query_length",
                reason="Minimum query length cannot be greater than maximum",
            )
        if self.mesh.model_parallel <= 0:
            raise ValidationFailed(
                field="mesh.model_parallel", reason="model_parallel must be >= 1"
            )
        if self.vector.pooling not in ("auto", "mean", "sif"):
            raise ValidationFailed(
                field="vector.pooling",
                reason=(
                    f"Unsupported pooling '{self.vector.pooling}'"
                    " (auto|mean|sif)"
                ),
            )
        if self.vector.quality_gate not in ("off", "warn", "refuse"):
            raise ValidationFailed(
                field="vector.quality_gate",
                reason=(
                    f"Unsupported quality_gate '{self.vector.quality_gate}'"
                    " (off|warn|refuse)"
                ),
            )
        if self.search.fused_flat_escalate_eps < 0:
            raise ValidationFailed(
                field="search.fused_flat_escalate_eps",
                reason="Escalation epsilon must be >= 0",
            )
        if self.storage.db_type == "sled":  # reference config files
            self.storage.db_type = "sqlite"
        if self.storage.db_type not in ("sqlite", "memory"):
            raise ValidationFailed(
                field="storage.db_type",
                reason=f"Unsupported db_type '{self.storage.db_type}' (sqlite|memory)",
            )

    # -- serialisation (ref: config.rs:468-479) -----------------------------

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_toml(self) -> str:
        return _to_toml(self.to_dict())

    def save_to_file(self, path: str | Path) -> None:
        Path(path).write_text(self.to_toml(), encoding="utf-8")


# ---------------------------------------------------------------------------
# Generic dict → nested dataclass hydration
# ---------------------------------------------------------------------------


def _dataclass_from_dict(cls: type, raw: dict[str, Any]) -> Any:
    if not isinstance(raw, dict):
        raise ConfigError(f"Expected table for {cls.__name__}, got {type(raw).__name__}")
    kwargs: dict[str, Any] = {}
    field_map = {f.name: f for f in fields(cls)}
    for key, value in raw.items():
        f = field_map.get(key)
        if f is None:
            continue  # ignore unknown keys (forward/backward compat)
        ftype = f.type if isinstance(f.type, type) else _resolve_type(cls, f.name)
        if is_dataclass(ftype) and isinstance(value, dict):
            kwargs[key] = _dataclass_from_dict(ftype, value)
        else:
            kwargs[key] = value
    try:
        return cls(**kwargs)
    except TypeError as e:
        raise ConfigError(f"Bad config for {cls.__name__}: {e}") from e


def _resolve_type(cls: type, name: str) -> type:
    import typing

    hints = typing.get_type_hints(cls)
    t = hints.get(name, str)
    origin = typing.get_origin(t)
    if origin is typing.Union:  # Optional[X]
        args = [a for a in typing.get_args(t) if a is not type(None)]
        t = args[0] if args else str
    return t if isinstance(t, type) else str


# ---------------------------------------------------------------------------
# Minimal TOML writer (stdlib has no emitter)
# ---------------------------------------------------------------------------


def _toml_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise ConfigError(f"Cannot serialise {type(v).__name__} to TOML")


def _to_toml(d: dict[str, Any], prefix: str = "") -> str:
    lines: list[str] = []
    tables: list[tuple[str, dict[str, Any]]] = []
    for k, v in d.items():
        if isinstance(v, dict):
            tables.append((k, v))
        elif v is None:
            continue  # TOML has no null; omitted keys fall back to defaults
        else:
            lines.append(f"{k} = {_toml_value(v)}")
    out = ""
    if prefix and (lines or not tables):
        out += f"[{prefix}]\n"
    out += "\n".join(lines)
    if lines:
        out += "\n"
    for k, v in tables:
        sub = f"{prefix}.{k}" if prefix else k
        out += "\n" + _to_toml(v, sub)
    return out
