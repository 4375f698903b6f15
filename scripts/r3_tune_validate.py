"""Validate the serving-grade tuner (index/tuning.py) at CAP scale.

Loads the 5M-chunk artifacts, generates the same query-shaped probes the
streaming finalize would (build_probe_embeddings over the stored corpus),
runs tune_nprobe_case_recall, and persists the chosen value into the
artifact via ann.save. Prints one JSON line.

  python scripts/r3_tune_validate.py --work /tmp/capbuild3 --cpu [--no-save]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/capbuild3")
    ap.add_argument("--target-recall", type=float, default=0.95)
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    import numpy as np

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.index.builder import load_artifacts
    from trie_semantic_search_tpu.index.tuning import (
        build_probe_embeddings,
        tune_nprobe_case_recall,
    )
    from trie_semantic_search_tpu.storage.store import StorageManager
    from trie_semantic_search_tpu.text.processor import TextProcessor

    work = Path(args.work)
    cfg = Config()
    cfg.storage.db_path = str(work / "db.sqlite")
    cfg.storage.backup.enabled = False
    cfg.trie.index_path = str(work / "trie")
    cfg.trie.content_windowing = "phrase_start"
    cfg.vector.hnsw.index_path = str(work / "vec")

    t0 = time.perf_counter()
    storage = StorageManager(cfg.storage)
    artifacts = load_artifacts(cfg)
    assert artifacts is not None
    _trie, vector, _columns = artifacts
    print(f"loaded in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    probes = build_probe_embeddings(
        storage, TextProcessor(cfg.text_processing),
        lambda texts: vector.generate_embeddings(texts),
    )
    assert probes is not None, "no probes generated"
    print(f"{len(probes)} probe embeddings", file=sys.stderr)

    t0 = time.perf_counter()
    nprobe = tune_nprobe_case_recall(
        vector.ann, np.asarray(vector.refs)[:, 0], vector.vectors,
        probes, k=10, target_recall=args.target_recall,
    )
    tune_s = time.perf_counter() - t0
    print(f"tuned nprobe={nprobe} in {tune_s:.0f}s", file=sys.stderr)

    if not args.no_save:
        t0 = time.perf_counter()
        vector.ann.save(work / "vec" / "ann.npz")
        print(f"re-saved in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
    print(json.dumps({
        "nprobe": nprobe,
        "probes": int(len(probes)),
        "target_recall": args.target_recall,
        "tune_seconds": round(tune_s, 1),
        "saved": not args.no_save,
    }))


if __name__ == "__main__":
    main()
