"""Profile the serving batch path stage-by-stage on a built artifact.

Round-5 loadtest triage: product QPS plateaus near ~300 while the fused
kernel does 20k — this measures where a 64-query batch's wall time goes
(embed | device | host hydration) and cProfiles the hydration loop, so
the fix targets the measured hot spot instead of a guess.

Usage: python scripts/r5_hydration_profile.py --config /root/capbuild_r5/lt_config_c.toml
"""

from __future__ import annotations

import argparse
import cProfile
import io
import json
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import (
    enable_persistent_compile_cache,
    guard_dead_tpu_relay,
)

if guard_dead_tpu_relay():
    print("warning: TPU relay unreachable - CPU backend", file=sys.stderr)
enable_persistent_compile_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from trie_semantic_search_tpu.cli import _build_components, _load_config
    from trie_semantic_search_tpu.core import metrics
    from trie_semantic_search_tpu.search.engine import SearchQuery

    class _A:
        config = args.config
        platform = None
        rebuild_index = False

    cfg = _load_config(_A())
    storage, engine = _build_components(cfg, rebuild=False)

    topics = [
        "due process", "equal protection", "search and seizure",
        "freedom of speech", "habeas corpus", "double jeopardy",
    ]

    def make_queries(tag: str) -> list[SearchQuery]:
        return [
            SearchQuery(query=f"question of {topics[i % 6]} {tag} {i}")
            for i in range(args.batch)
        ]

    # warm the shapes (compiles)
    t0 = time.perf_counter()
    engine._execute_batch(make_queries("warm"))
    print(f"warm batch: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # measured: distinct queries per iter (no query-cache shortcut)
    stage = {"embed": [], "device": [], "total": []}
    for it in range(args.iters):
        qs = make_queries(f"m{it}")
        reg = metrics.metrics  # process-wide registry singleton
        before = {
            k: reg.histogram(k).total_ms
            for k in ("fused_embed", "fused_device")
        }
        t0 = time.perf_counter()
        engine._execute_batch(qs)
        stage["total"].append(time.perf_counter() - t0)
        stage["embed"].append(
            reg.histogram("fused_embed").total_ms - before["fused_embed"]
        )
        stage["device"].append(
            reg.histogram("fused_device").total_ms - before["fused_device"]
        )

    import numpy as np

    med = {k: float(np.median(v)) for k, v in stage.items()}
    med["embed"] /= 1000.0  # metrics record ms
    med["device"] /= 1000.0
    med["hydrate"] = med["total"] - med["embed"] - med["device"]

    # cProfile one full batch to attribute the hydration time
    qs = make_queries("prof")
    pr = cProfile.Profile()
    pr.enable()
    engine._execute_batch(qs)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(24)
    print(s.getvalue(), file=sys.stderr)

    print(json.dumps({
        "batch": args.batch,
        "iters": args.iters,
        "median_s": {k: round(v, 4) for k, v in med.items()},
        "qps_equiv": round(args.batch / med["total"], 1),
    }))


if __name__ == "__main__":
    main()
