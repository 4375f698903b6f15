"""Re-tune and persist nprobe for an already-built PartitionedANN artifact.

The streaming finalize tunes nprobe (index/streaming.py:339-359) but the
round-3 build saved its artifact before ``PartitionedANN.save`` learned to
persist ``config.num_probes`` — so a fresh load regressed to the
default_nprobe heuristic (~P/10 = 488 at P=4888, a ~10x over-probe).
This loads the artifact, re-runs the tuner on a held-out corpus sample,
and re-saves with the tuned value in the npz meta.

  python scripts/r3_retune_nprobe.py --work /tmp/capbuild3 --cpu
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/capbuild3")
    ap.add_argument("--sample", type=int, default=64)
    ap.add_argument("--target-recall", type=float, default=0.95)
    ap.add_argument("--set", type=int, default=0, dest="set_nprobe",
                    help="persist this nprobe directly (skip tuning) — "
                         "e.g. the value picked by r3_nprobe_sweep.py "
                         "against serving-level recall")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from trie_semantic_search_tpu.index.ann import PartitionedANN

    work = Path(args.work)
    ann_path = work / "vec" / "ann.npz"
    t0 = time.perf_counter()
    ann = PartitionedANN.load(ann_path)
    print(f"loaded {ann.num_vectors} vectors, "
          f"P={int(ann.centroids.shape[0])}, "
          f"persisted num_probes={ann.config.num_probes} "
          f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    if args.set_nprobe:
        nprobe = args.set_nprobe
        ann.config.num_probes = nprobe
        print(f"setting nprobe={nprobe} (no tuning)", file=sys.stderr)
    else:
        vectors = np.load(work / "vec" / "vectors.npy", mmap_mode="r")
        rng = np.random.default_rng(0)
        rows = np.sort(rng.choice(ann.num_vectors,
                                  min(args.sample, ann.num_vectors),
                                  replace=False))
        sample = np.asarray(vectors[rows], np.float32)
        t0 = time.perf_counter()
        nprobe = ann.tune_nprobe(sample, k=10,
                                 target_recall=args.target_recall)
        print(f"tuned nprobe={nprobe} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
    t0 = time.perf_counter()
    ann.save(ann_path)
    print(f"re-saved {ann_path} in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    print(json.dumps({"nprobe": nprobe,
                      "partitions": int(ann.centroids.shape[0]),
                      "num_vectors": ann.num_vectors}))


if __name__ == "__main__":
    main()
