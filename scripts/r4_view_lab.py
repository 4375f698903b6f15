"""Round-4 augmentation-view pretraining lab (VERDICT round-3 item 6).

Round 3's adjacent-sentence InfoNCE always DEGRADED retrieval below the
random init on template-heavy corpora (false in-batch negatives). This
lab measures the fix the verdict suggests: positives = two independently
augmented views of the SAME sentence (synonym swap + stopword drop +
digit scrub, models.train.mine_view_pairs) — the positive relation is
unambiguous by construction.

Configs:
  * plain          — random init, the control every row must beat
  * views_full     — 300 view-pair steps, full TRAIN_SYNONYMS lexicon
  * views_disjoint — same, with every synonym edge that also appears in
                     the EVALUATION lexicon (models.quality.SYNONYMS)
                     removed, so the paraphrase-probe result cannot be
                     explained by shared entries
  * adjacent       — the round-3 recipe at the same step count (context)

One JSON line per config to stdout (append to
bench_results/view_lab_r04.jsonl). CPU-feasible: ~45 min per trained row.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

guard_dead_tpu_relay()

import numpy as np  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=300)
    ap.add_argument("--probes", type=int, default=160)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--configs", default="plain,views_full,views_disjoint,adjacent")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from capbuild import _sentences

    from trie_semantic_search_tpu.models import train as T
    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.quality import (
        SYNONYMS as EVAL_SYNONYMS,
        build_probes,
        evaluate_embedder_direct,
        pair_ranking_accuracy,
    )
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )

    rng = np.random.default_rng(42)
    docs_rows = []
    for i in range(args.cases):
        n = int(rng.integers(16, 25))
        docs_rows.append((i, _sentences(rng, i, n)))
    docs = [sents for _, sents in docs_rows]

    texts: list[str] = []
    rows: list[int] = []
    for i, sents in docs_rows:
        for s in sents[:8]:
            texts.append(s)
            rows.append(i)

    all_texts = [s for sents in docs for s in sents]
    vocab = train_wordpiece_vocab(all_texts, vocab_size=8192)
    tok = WordPieceTokenizer(vocab)
    probes = build_probes(docs_rows, max_probes=args.probes)

    # held-out pair-ranking set (paraphrase pairs from the EVAL recipe)
    heldout = [(s, p) for s in all_texts[:4096:7]
               if (p := _eval_para(s, EVAL_SYNONYMS)) is not None][:64]

    # overlap diagnostics: how much of the train lexicon the eval dict shares
    eval_edges = {(a, b) for a, b in EVAL_SYNONYMS.items()}
    train_edges = {(w, r) for w, rs in T.TRAIN_SYNONYMS.items() for r in rs}
    shared = {
        (w, r) for (w, r) in train_edges
        if EVAL_SYNONYMS.get(w) == r or EVAL_SYNONYMS.get(r) == w
    }
    disjoint_syn = {
        w: [r for r in rs if (w, r) not in shared]
        for w, rs in T.TRAIN_SYNONYMS.items()
    }
    disjoint_syn = {w: rs for w, rs in disjoint_syn.items() if rs}
    print(
        f"lexicon: {len(train_edges)} train edges, {len(eval_edges)} eval "
        f"edges, {len(shared)} shared (removed in views_disjoint)",
        file=sys.stderr,
    )

    def run(name: str) -> None:
        emb = Embedder(tokenizer=tok)  # fresh random init each config
        t0 = time.perf_counter()
        rep: dict = {}
        if name != "plain":
            if name == "adjacent":
                pairs = T.mine_pairs(docs, scrub_digits=True)
            else:
                syn = None if name == "views_full" else disjoint_syn
                pairs = T.mine_view_pairs(docs, synonyms=syn)
            rep = _train(T, emb, pairs, args.steps)
        direct = evaluate_embedder_direct(emb, texts, rows, probes)
        acc = pair_ranking_accuracy(emb, heldout)
        out = {
            "config": name, "steps": rep.get("steps", 0),
            "train_report": rep or None,
            "pair_ranking_acc": round(acc, 4),
            "direct_all": direct["all"],
            "direct_paraphrase": direct.get("paraphrase"),
            "direct_half": direct.get("half"),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(out), flush=True)

    for name in args.configs.split(","):
        run(name)


def _eval_para(sentence: str, synonyms) -> str | None:
    rng = np.random.default_rng(abs(hash(sentence)) % 2**31)
    words = sentence.split()
    out, swapped = [], 0
    for w in words:
        lw = w.lower().strip(".,;:()")
        if lw in synonyms:
            out.append(synonyms[lw])
            swapped += 1
        else:
            out.append(w)
    return " ".join(out) if swapped else None


def _train(T, emb, pairs, steps) -> dict:
    """The pretrain_encoder loop body over explicit pairs."""
    import jax
    from functools import partial

    cfg = T.TrainConfig(total_steps=steps)
    optimizer = T.make_optimizer(cfg)
    opt_state = optimizer.init(emb.params)
    step_fn = jax.jit(partial(
        T.train_step, model_config=emb.model_config,
        optimizer=optimizer, temperature=cfg.temperature,
    ))
    it = T.batches_from_pairs(
        pairs, emb.tokenizer, 32, 64, false_negative_jaccard=0.5
    )
    params = emb.params
    last_loss = last_acc = float("nan")
    for step in range(steps):
        batch = next(it)
        params, opt_state, loss, acc = step_fn(params, opt_state, batch)
        if (step + 1) % 50 == 0:
            last_loss, last_acc = float(loss), float(acc)
            print(f"step {step+1}/{steps}: loss={last_loss:.4f} "
                  f"acc={last_acc:.3f}", file=sys.stderr, flush=True)
    emb.params = params
    return {"steps": steps, "pairs": len(pairs),
            "final_loss": last_loss, "final_accuracy": last_acc}


if __name__ == "__main__":
    main()
