"""CAP-scale streaming-build driver (round-1 VERDICT item 6 done-criterion).

Generates a synthetic legal corpus at reference scale (the reference claims
6.5M cases, /root/reference/README.md:11,25 — its index build was never
wired) and drives :class:`index.streaming.StreamingIndexBuilder` over it:

  python scripts/capbuild.py gen   --cases 25000 --work /tmp/capbuild
  python scripts/capbuild.py build --work /tmp/capbuild [--no-resume]

``gen`` writes cases straight into the sqlite store (ingest-path parity is
covered by tests/test_scale_e2e.py; this driver measures the BUILD).
``build`` streams storage → tokenize → bucketed TPU encode → shard append
with per-shard crash-safe checkpoints, then prints one JSON report line:
cases, chunks, shards, chunks/s, peak RSS. Kill it mid-run (SIGKILL) and
re-run to exercise resume — finished shards are not re-embedded and the
report records ``resumed_from_row``.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime as dt
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import (
    enable_persistent_compile_cache,
    guard_dead_tpu_relay,
)

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)
enable_persistent_compile_cache()

TOPICS = [
    "due process", "equal protection", "freedom of speech",
    "search and seizure", "right to counsel", "double jeopardy",
    "eminent domain", "commerce clause", "habeas corpus", "qualified immunity",
    "sovereign immunity", "strict scrutiny", "probable cause",
    "cruel and unusual punishment", "establishment clause", "takings clause",
]
COURTS = [
    "Supreme Court of the United States",
    "United States Court of Appeals for the First Circuit",
    "United States Court of Appeals for the Second Circuit",
    "United States Court of Appeals for the Ninth Circuit",
    "Supreme Court of California",
    "New York Court of Appeals",
    "Supreme Judicial Court of Massachusetts",
    "Texas Court of Criminal Appeals",
]
VERBS = ["held", "concluded", "determined", "reasoned", "found", "ruled"]
OUTCOMES = ["affirmed", "reversed", "vacated", "remanded", "dismissed"]
DOCTRINES = [
    "incorporation", "preemption", "severability", "standing", "mootness",
    "ripeness", "abstention", "exhaustion", "deference", "proportionality",
]


def _sentences(rng, i: int, n: int) -> list[str]:
    t = TOPICS[i % len(TOPICS)]
    t2 = TOPICS[(i * 7 + 3) % len(TOPICS)]
    d = DOCTRINES[i % len(DOCTRINES)]
    out = [
        f"This case number {i} presents a question of {t} under the "
        f"{d} framework.",
        f"The court below {VERBS[i % len(VERBS)]} against the petitioner "
        f"on {t} grounds.",
    ]
    for j in range(n - 3):
        v = VERBS[(i + j) % len(VERBS)]
        out.append(
            f"In reaching part {j} of its analysis the court {v} that the "
            f"{t if j % 2 else t2} claim turns on {d} principles and the "
            f"record developed at trial number {int(rng.integers(0, 9999))}."
        )
    out.append(
        f"The judgment is {OUTCOMES[i % len(OUTCOMES)]} and the case is "
        f"remanded for further proceedings consistent with this opinion."
    )
    return out


def cmd_gen(args) -> None:
    import numpy as np

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
    from trie_semantic_search_tpu.storage.store import StorageManager

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    cfg = Config()
    cfg.storage.db_path = str(work / "db.sqlite")
    cfg.storage.backup.enabled = False
    storage = StorageManager(cfg.storage)
    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    batch: list[tuple[CaseMetadata, str]] = []
    total = 0
    for i in range(args.cases):
        year = 1850 + (i * 13) % 175
        meta = CaseMetadata(
            id=new_case_id(),
            name=f"Petitioner{i} v. Respondent{i % 4093}",
            citation=f"{100 + i % 500} U.S. {i % 900 + 1} ({year})",
            court=COURTS[i % len(COURTS)],
            decision_date=dt.date(year, 1 + i % 12, 1 + i % 28),
        )
        n_sent = int(rng.integers(args.min_sentences, args.max_sentences + 1))
        batch.append((meta, " ".join(_sentences(rng, i, n_sent))))
        if len(batch) >= 1000:
            stored, errors = storage.store_cases_batch(batch)
            assert not errors, errors[:3]
            total += stored
            batch = []
            if total % 5000 == 0:
                rate = total / (time.perf_counter() - t0)
                print(f"gen: {total}/{args.cases} cases ({rate:.0f}/s)",
                      file=sys.stderr)
    if batch:
        stored, _ = storage.store_cases_batch(batch)
        total += stored
    storage.close()
    print(json.dumps({
        "stage": "gen", "cases": total,
        "seconds": round(time.perf_counter() - t0, 1),
        "db_bytes": (work / "db.sqlite").stat().st_size,
    }))


def make_harness_embedder(storage, config, mode: str = "hash"):
    """FINALIZE-SCALE HARNESS embedder: embeds each chunk as the MEAN of
    its word-embedding-table rows (a seeded random projection of the
    token bag) — the transformer stack is bypassed entirely.

    Purpose: measure the BUILD PIPELINE (streaming RSS, external-sort
    trie finalize, slab-wise ANN build, artifact sizes/load) at corpus
    scales where the real encode stage needs the TPU — that stage was
    measured separately at ~1,160 chunks/s/chip in the round-3 CAP build
    (bench_results/capbuild_r03.json) and is embarrassingly parallel
    across chips. NOT a product encoder; builds made with it are
    harness artifacts (quality gate runs and records that honestly).

    Two modes, identical geometry (token-bag mean of a seeded random
    table), different tokenisation cost:

    * ``hash`` — WordPiece over a corpus-trained 8k vocab. Faithful to
      the product tokenizer but ~1.3 ms/chunk of pure Python: profiled
      at ~75% of the per-chunk budget (~980 chunks/s steady state).
    * ``fnv``  — whitespace words hashed with crc32 into an 8k-row
      table; no vocab training, ~30 us/chunk. Same pipeline stress
      (embed-stage output shape/rate, shard IO, finalize inputs), ~4x
      the streaming rate — used for the 1M-case wall-clock-bounded
      scale run."""
    import numpy as np

    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.minilm import MiniLMConfig
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )

    if mode == "fnv":
        import zlib

        rows, dim = 8192, config.vector.dimension
        wordtab = np.random.default_rng(7).standard_normal(
            (rows, dim), np.float32
        )
        # minimal real tokenizer so the artifact's saved encoder keeps
        # the product shape (never used on the embed path below)
        tok = WordPieceTokenizer(
            {w: i for i, w in enumerate(
                ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "court"]
            )}
        )
        tiny = MiniLMConfig(
            vocab_size=max(len(tok), 128),
            hidden_size=dim, num_layers=1, num_heads=4,
            intermediate_size=128, max_position=64,
        )

        class _FnvBagEmbedder(Embedder):
            def _embed_chunk(self, texts):  # type: ignore[override]
                out = np.zeros((len(texts), dim), np.float32)
                for i, t in enumerate(texts):
                    words = t.lower().split()[:64]
                    if not words:
                        out[i, 0] = 1.0
                        continue
                    idx = np.fromiter(
                        (zlib.crc32(w.encode()) % rows for w in words),
                        np.int64, len(words),
                    )
                    out[i] = wordtab[idx].mean(0)
                out /= np.maximum(
                    np.linalg.norm(out, axis=1, keepdims=True), 1e-12
                )
                return out

        return _FnvBagEmbedder(
            config.vector.model, tokenizer=tok, model_config=tiny
        )

    def sample_gen():
        for i, (_row, _m, text) in enumerate(storage.iter_cases_rowid()):
            if i >= 10_000:
                return
            if text:
                yield text

    vocab = train_wordpiece_vocab(sample_gen(), vocab_size=8192)
    tok = WordPieceTokenizer(vocab)
    tiny = MiniLMConfig(
        vocab_size=max(len(tok), 128),
        hidden_size=config.vector.dimension, num_layers=1, num_heads=4,
        intermediate_size=128, max_position=64,
    )

    class _BowProjectionEmbedder(Embedder):
        def _embed_chunk(self, texts):  # type: ignore[override]
            enc = [self.tokenizer.encode(t, 64) for t in texts]
            L = max(max(int(np.sum(m)) for _, m in enc), 1)
            ids = np.zeros((len(texts), L), np.int64)
            msk = np.zeros((len(texts), L), np.float32)
            for i, (a, m) in enumerate(enc):
                n = int(np.sum(m))
                ids[i, :n] = a[:n]
                msk[i, :n] = 1.0
            v = (self._wordtab[ids] * msk[:, :, None]).sum(1)
            v /= np.maximum(msk.sum(1, keepdims=True), 1.0)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            return v.astype(np.float32)

    emb = _BowProjectionEmbedder(
        config.vector.model, tokenizer=tok, model_config=tiny
    )
    emb._wordtab = np.asarray(
        emb.params["embeddings"]["word"], np.float32
    )
    return emb


def cmd_build(args) -> None:
    import logging

    # surface the builder's INFO stream (shard checkpoints, pretrain
    # guardrail decision, tuned nprobe) on stderr
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    if args.cpu:  # dev/CI: virtual CPU backend (must precede backend init)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.index.streaming import StreamingIndexBuilder
    from trie_semantic_search_tpu.storage.store import StorageManager

    work = Path(args.work)
    cfg = Config()
    cfg.storage.db_path = str(work / "db.sqlite")
    cfg.storage.backup.enabled = False
    cfg.trie.index_path = str(work / "trie")
    cfg.trie.content_windowing = "phrase_start"
    cfg.vector.hnsw.index_path = str(work / "vec")
    cfg.vector.hnsw.num_partitions = args.partitions
    if args.no_tune:
        cfg.vector.hnsw.tune_on_build = False
    storage = StorageManager(cfg.storage)
    embedder = (
        make_harness_embedder(storage, cfg, mode=args.embedder)
        if args.embedder in ("hash", "fnv") else None
    )
    builder = StreamingIndexBuilder(
        storage, cfg, embedder=embedder, work_dir=work / "stream",
        shard_chunks=args.shard_chunks,
        max_chunks_per_case=args.max_chunks_per_case,
        max_cases=args.max_cases,
    )
    built = builder.build(resume=not args.no_resume)
    r = built.report
    # reload-downtime measurement (round-3 VERDICT weak item 6): time a
    # cold load of the artifacts just written
    import gc
    import time as _t

    from trie_semantic_search_tpu.index.builder import load_artifacts

    # drop the build's own index references first: at 10M chunks the
    # frozen arrays are ~14 GB — holding them (host memmaps or HBM)
    # while load_artifacts materialises a second full copy would double
    # the peak footprint the build is measured on
    del built, builder
    gc.collect()
    t0 = _t.perf_counter()
    load_error = None
    try:
        loaded = load_artifacts(cfg)
        assert loaded is not None
    except Exception as e:  # the build itself succeeded — record that,
        load_error = f"{type(e).__name__}: {e}"  # and the reload failure
    load_s = _t.perf_counter() - t0
    artifact_bytes = sum(
        f.stat().st_size
        for d in (work / "trie", work / "vec")
        for f in d.rglob("*") if f.is_file()
    )
    print(json.dumps({
        "stage": "build",
        "embedder": args.embedder,
        **{k: getattr(r, k) for k in (
            "cases", "content_chunks", "citations", "shards",
            "resumed_from_row", "chunks_per_second", "peak_rss_bytes",
            "peak_anon_rss_bytes",
        )},
        "artifact_load_seconds": round(load_s, 1),
        **({"artifact_load_error": load_error} if load_error else {}),
        "artifact_bytes": artifact_bytes,
        "seconds": round(r.seconds, 1),
    }))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--cases", type=int, default=25_000)
    g.add_argument("--min-sentences", type=int, default=16)
    g.add_argument("--max-sentences", type=int, default=24)
    g.add_argument("--work", required=True)
    g.set_defaults(fn=cmd_gen)
    b = sub.add_parser("build")
    b.add_argument("--work", required=True)
    b.add_argument("--shard-chunks", type=int, default=32_768)
    b.add_argument("--partitions", type=int, default=512)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--cpu", action="store_true")
    b.add_argument(
        "--max-cases", type=int, default=0,
        help="0 = whole corpus; >0 stops streaming after that many cases",
    )
    b.add_argument(
        "--max-chunks-per-case", type=int, default=64,
        help="cap content chunks per case (bounds total chunk count "
             "independently of the generated corpus's sentence counts)",
    )
    b.add_argument(
        "--no-tune", action="store_true",
        help="skip build-time nprobe tuning (its exact oracle brute-scans "
             "the corpus per probe: seconds on a chip, hours on the "
             "1-core CPU fallback at multi-M-chunk scale)",
    )
    b.add_argument(
        "--embedder", choices=("model", "hash", "fnv"), default="model",
        help="'hash'/'fnv' = finalize-scale harness: BoW-projection "
             "embeds (see make_harness_embedder) to measure the build "
             "pipeline at corpus scales where real encode needs the "
             "TPU; 'fnv' skips WordPiece for ~4x the streaming rate",
    )
    b.set_defaults(fn=cmd_build)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
