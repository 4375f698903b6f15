"""Rebuild a built artifact's ANN with the pad-replica layout, re-tune,
and atomically swap it in — NO re-embedding (reads the streaming build's
frozen ``vectors_f32.npy`` and reuses the trained centroids).

  python scripts/r5_replica_rebuild.py --work /root/capbuild_flagship

Stages:
  1. load the old ANN dir's centroids (+ tuned nprobe for reference)
  2. ``build_streaming(vectors, reuse_centroids=...)`` with the round-5
     defaults (pad_replicas on) — same partitioning, replicated layout
  3. re-tune nprobe with the case-level tuner on query-shaped probes
     (bounded at --max-nprobe: every sweep point is a full probe pass,
     and this must run on the 1-core CPU host when the relay is down)
  4. back up ``vec/ann.mmap`` -> ``ann.mmap.prev`` and save the new dir

Prints one JSON report line; serving picks up the new layout on next
load. Run detached — ~2-4 h on the CPU host at 5M chunks.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--partitions", type=int, default=4096)
    ap.add_argument("--max-nprobe", type=int, default=128)
    ap.add_argument("--min-recall", type=float, default=0.95)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    import numpy as np

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.index.ann import PartitionedANN
    from trie_semantic_search_tpu.index.tuning import (
        build_probe_embeddings,
        tune_nprobe_case_recall,
    )
    from trie_semantic_search_tpu.index.vector import VectorIndex
    from trie_semantic_search_tpu.storage.store import StorageManager
    from trie_semantic_search_tpu.text.processor import TextProcessor

    work = Path(args.work)
    ann_dir = work / "vec" / "ann.mmap"
    vectors = np.load(work / "stream" / "vectors_f32.npy", mmap_mode="r")
    with np.load(work / "vec" / "refs.npz", allow_pickle=False) as z:
        refs = np.asarray(z["refs"], np.int32)
    assert len(refs) == len(vectors), (len(refs), len(vectors))
    centroids = np.load(ann_dir / "centroids.npy")
    old_meta = json.loads((ann_dir / "meta.json").read_text())
    print(f"corpus {vectors.shape}, centroids {centroids.shape}, "
          f"old tuned nprobe {old_meta.get('num_probes')}", file=sys.stderr)

    cfg = Config()
    cfg.vector.hnsw.num_partitions = args.partitions
    t0 = time.perf_counter()
    ann = PartitionedANN(cfg.vector.hnsw)
    ann.build_streaming(vectors, reuse_centroids=centroids)
    build_s = time.perf_counter() - t0
    rows = np.asarray(ann.part_rows)
    n_rep = int((rows >= 0).sum()) - len(vectors)
    print(f"rebuilt in {build_s:.0f}s: {n_rep} replicas "
          f"({100.0 * n_rep / len(vectors):.1f}% of rows)", file=sys.stderr)

    # query-shaped probes through the artifact's own trained encoder
    # (builder._load_encoder reconstructs the exact build-time model; the
    # old ANN itself is NOT loaded — only the encoder + tokenizer)
    from trie_semantic_search_tpu.index.builder import _load_encoder

    cfg.storage.db_path = str(work / "db.sqlite")
    cfg.storage.backup.enabled = False
    cfg.vector.hnsw.index_path = str(work / "vec")
    storage = StorageManager(cfg.storage)
    embedder = _load_encoder(cfg, work / "vec")
    assert embedder is not None
    vector = VectorIndex(cfg.vector, embedder=embedder)
    probes = build_probe_embeddings(
        storage, TextProcessor(cfg.text_processing),
        lambda texts: vector.generate_embeddings(texts),
    )
    assert probes is not None
    t1 = time.perf_counter()
    nprobe = tune_nprobe_case_recall(
        ann, refs[:, 0], vectors, probes, k=10,
        target_recall=0.95, max_nprobe=args.max_nprobe,
        min_recall=args.min_recall,
    )
    tune_s = time.perf_counter() - t1
    print(f"tuned nprobe={nprobe} in {tune_s:.0f}s", file=sys.stderr)

    prev = ann_dir.with_name("ann.mmap.prev")
    if prev.exists():
        import shutil

        shutil.rmtree(prev)
    ann_dir.rename(prev)
    try:
        ann.save_dir(ann_dir)
    except BaseException:
        if not ann_dir.exists():  # roll the old artifact back in place
            prev.rename(ann_dir)
        raise
    print(json.dumps({
        "stage": "replica_rebuild",
        "chunks": int(len(vectors)),
        "partitions": int(centroids.shape[0]),
        "replicas": n_rep,
        "replica_pct": round(100.0 * n_rep / len(vectors), 1),
        "tuned_nprobe": int(nprobe),
        "old_nprobe": int(old_meta.get("num_probes", 0)),
        "build_seconds": round(build_s, 1),
        "tune_seconds": round(tune_s, 1),
    }))


if __name__ == "__main__":
    main()
