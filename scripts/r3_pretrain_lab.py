"""Encoder-pretraining lab: measure retrieval quality vs training config.

Round-3 diagnosis: the 5M CAP build's encoder (300 InfoNCE steps over
2000 sampled cases) scored BELOW its random init on the like-for-like
direct-retrieval eval (MRR 0.19 trained vs 0.40 random) and barely above
chance on held-out pair ranking. Hypothesis: template-heavy corpora put
semantically-identical items in every batch (16 topic templates, batch
32), so most in-batch "negatives" are false — the InfoNCE task degrades
the encoder away from its (bag-of-words-ish) random-projection init.

Each config: pretrain from the SAME init on the same sampled docs, then
evaluate (a) held-out pair-ranking accuracy, (b) direct case-retrieval
MRR/recall on quality.py probes, vs the random-init control. One JSONL
line per config.

  python scripts/r3_pretrain_lab.py --db /tmp/capbuild3/db.sqlite --cpu \
      --out bench_results/pretrain_lab_r03.jsonl
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

CONFIGS = [
    # name, steps, lr, temperature, batch_size, fn_jaccard, scrub_digits
    ("random_init", 0, 2e-4, 0.05, 32, 0.0, False),
    ("build_default_300", 300, 2e-4, 0.05, 32, 0.0, False),
    ("fnmask_300", 300, 2e-4, 0.05, 32, 0.5, False),
    ("scrub_fnmask_300", 300, 2e-4, 0.05, 32, 0.5, True),
    ("scrub_300", 300, 2e-4, 0.05, 32, 0.0, True),
    ("scrub_fnmask_1500", 1500, 2e-4, 0.05, 32, 0.5, True),
    ("longer_1500", 1500, 2e-4, 0.05, 32, 0.0, False),
    ("soft_temp_0.15", 1500, 2e-4, 0.15, 32, 0.0, False),
    ("low_lr_5e-5", 1500, 5e-5, 0.05, 32, 0.0, False),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/tmp/capbuild3/db.sqlite")
    ap.add_argument("--out", default="bench_results/pretrain_lab_r03.jsonl")
    ap.add_argument("--sample-cases", type=int, default=2000)
    ap.add_argument("--eval-cases", type=int, default=400)
    ap.add_argument("--probes", type=int, default=192)
    ap.add_argument("--only", default=None,
                    help="comma-separated config names to run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from trie_semantic_search_tpu.core.config import Config
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.quality import (
        build_probes,
        evaluate_embedder_direct,
        pair_ranking_accuracy,
    )
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )
    from trie_semantic_search_tpu.models.train import (
        TrainConfig,
        pretrain_encoder,
    )
    from trie_semantic_search_tpu.storage.store import StorageManager
    from trie_semantic_search_tpu.text.processor import TextProcessor

    cfg = Config()
    cfg.storage.db_path = args.db
    cfg.storage.backup.enabled = False
    storage = StorageManager(cfg.storage)
    tp = TextProcessor(cfg.text_processing)

    # training docs: same sampling the streaming build uses
    train_docs, eval_docs = [], []
    for i, (row, _m, text) in enumerate(storage.iter_cases_rowid()):
        if not text:
            continue
        sents = tp.extract_sentences(tp.normalize_text(text))
        if i < args.sample_cases:
            train_docs.append(sents)
        if len(eval_docs) < args.eval_cases:
            eval_docs.append((row, sents))
        if i >= args.sample_cases and len(eval_docs) >= args.eval_cases:
            break
    print(f"{len(train_docs)} train docs, {len(eval_docs)} eval docs",
          file=sys.stderr)

    def sample_gen():
        for sents in train_docs:
            yield " ".join(sents)

    vocab = train_wordpiece_vocab(sample_gen(), vocab_size=8192)
    tokenizer = WordPieceTokenizer(vocab)

    probes = build_probes(eval_docs, max_probes=args.probes)
    texts, case_rows = [], []
    for row, sents in eval_docs:
        for s in sents[:8]:
            texts.append(s)
            case_rows.append(row)

    # held-out pairs (sentence halves from eval docs, not train docs)
    rng = np.random.default_rng(11)
    pairs = []
    for _row, sents in eval_docs:
        for s in sents[8:12]:
            w = s.split()
            if len(w) >= 12:
                pairs.append((" ".join(w[: len(w) // 2]),
                              " ".join(w[len(w) // 2 :])))
    rng.shuffle(pairs)
    pairs = pairs[:128]
    print(f"{len(probes)} probes, {len(pairs)} held-out pairs",
          file=sys.stderr)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    names = set(args.only.split(",")) if args.only else None
    for name, steps, lr, temp, bs, fnj, scrub in CONFIGS:
        if names and name not in names:
            continue
        t0 = time.perf_counter()
        emb = Embedder(cfg.vector.model, tokenizer=tokenizer, seed=0)
        rep = {}
        if steps:
            rep = pretrain_encoder(
                emb, train_docs, steps=steps, batch_size=bs,
                max_len=min(64, cfg.vector.model.max_sequence_length),
                train_config=TrainConfig(
                    total_steps=steps, learning_rate=lr, temperature=temp,
                ),
                false_negative_jaccard=fnj,
                scrub_digits=scrub,
            )
        direct = evaluate_embedder_direct(emb, texts, case_rows, probes)
        pr = pair_ranking_accuracy(emb, pairs)
        rec = {
            "config": name,
            "steps": steps,
            "learning_rate": lr,
            "temperature": temp,
            "batch_size": bs,
            "false_negative_jaccard": fnj,
            "scrub_digits": scrub,
            "train_report": {k: rep.get(k) for k in
                             ("final_loss", "final_accuracy", "pairs")},
            "pair_ranking_acc": round(pr, 4),
            "direct_all": direct.get("all"),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
