"""Make retrieval_r03.json an apples-to-apples comparison.

r3_serve_bench's quality stage compares the TRAINED encoder through the
full engine (searching ALL cases) against a RANDOM-encoder control that
ranks only the ~400 probed cases' chunks — different search spaces, so
the numbers cannot be read against each other. This appends the missing
like-for-like cells to the record:

* ``trained_direct``  — the trained encoder evaluated EXACTLY like the
  random control (same docs, same probes, same direct ranking);
* ``pair_ranking``    — full-matrix InfoNCE accuracy on held-out
  (first-half, second-half) sentence pairs for both encoders: the
  directest "learned sentence semantics vs random projection" signal.

  python scripts/r3_quality_direct.py --work /tmp/capbuild3 --cpu
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
    ap.add_argument("--record", default="bench_results/retrieval_r03.json")
    ap.add_argument("--probes", type=int, default=192)
    ap.add_argument("--max-cases", type=int, default=400)
    ap.add_argument("--pairs", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.index.builder import _load_encoder
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.quality import (
        build_probes,
        evaluate_embedder_direct,
        pair_ranking_accuracy,
    )
    from trie_semantic_search_tpu.storage.store import StorageManager
    from trie_semantic_search_tpu.text.processor import TextProcessor

    work = Path(args.work)
    cfg = Config()
    cfg.storage.db_path = str(work / "db.sqlite")
    cfg.storage.backup.enabled = False
    storage = StorageManager(cfg.storage)
    tp = TextProcessor(cfg.text_processing)

    cfg.vector.hnsw.index_path = str(work / "vec")
    t0 = time.perf_counter()
    trained = _load_encoder(cfg, work / "vec")
    assert trained is not None, "no encoder at " + str(work / "vec")
    rnd = Embedder(
        cfg.vector.model,
        tokenizer=trained.tokenizer,
        model_config=trained.model_config,
        seed=1234,
    )
    print(f"encoders up in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    # same docs/probes as the serve-bench quality stage (same iteration
    # order and seeds -> identical probe set)
    docs = []
    for row, _meta, text in storage.iter_cases_rowid():
        if len(docs) >= args.max_cases:
            break
        if text:
            docs.append((row, tp.extract_sentences(tp.normalize_text(text))))
    probes = build_probes(docs, max_probes=args.probes)
    texts, case_rows = [], []
    for row, sents in docs:
        for s in sents[:8]:
            texts.append(s)
            case_rows.append(row)
    print(f"{len(probes)} probes, {len(texts)} corpus texts", file=sys.stderr)

    trained_direct = evaluate_embedder_direct(
        trained, texts, case_rows, probes
    )
    print(f"trained_direct: {trained_direct.get('all')}", file=sys.stderr)

    # held-out sentence-half pairs for pair ranking (sentences NOT used
    # as probes: take from the tail of each doc's sentence list)
    rng = np.random.default_rng(11)
    pairs = []
    for _row, sents in docs:
        for s in sents[8:12]:
            w = s.split()
            if len(w) >= 12:
                pairs.append((" ".join(w[: len(w) // 2]),
                              " ".join(w[len(w) // 2 :])))
    rng.shuffle(pairs)
    pairs = pairs[: args.pairs]
    pr_trained = pair_ranking_accuracy(trained, pairs)
    pr_random = pair_ranking_accuracy(rnd, pairs)
    print(f"pair_ranking: trained={pr_trained:.4f} random={pr_random:.4f}",
          file=sys.stderr)

    rec_path = Path(args.record)
    rec = json.loads(rec_path.read_text()) if rec_path.exists() else {}
    rec["trained_direct"] = trained_direct
    rec["pair_ranking"] = {
        "pairs": len(pairs),
        "trained": round(pr_trained, 4),
        "random_control": round(pr_random, 4),
        "note": "full-matrix InfoNCE accuracy on held-out sentence-half "
                "pairs (chance = 1/pairs)",
    }
    rec["comparability_note"] = (
        "'trained' (engine) searches ALL cases in the built index; "
        "'random_control' and 'trained_direct' rank only the probed "
        "cases' chunks — compare trained_direct vs random_control "
        "(same search space), and read the engine row as "
        "retrieval-at-corpus-scale where template near-duplicates bound "
        "the achievable source-case rank"
    )
    rec_path.write_text(json.dumps(rec, indent=1))
    print(json.dumps({
        "trained_direct_mrr": trained_direct["all"]["mrr"],
        "pair_ranking_trained": round(pr_trained, 4),
        "pair_ranking_random": round(pr_random, 4),
    }))


if __name__ == "__main__":
    main()
