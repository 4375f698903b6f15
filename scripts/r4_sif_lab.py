"""Round-4 pooling lab (VERDICT round-3 item 6): can train-free
SIF-weighted pooling beat the plain-mean random-projection control on
paraphrase/half-sentence probes?

Measures, over a CAP-style synthetic corpus (the same generator the
capbuild driver uses), direct-retrieval MRR/recall@k for:

  * plain        — random-init MiniLM, masked mean pooling (the round-3
                   control cell: the bar VERDICT item 6 asks us to beat)
  * sif          — same params, SIF-weighted pooling (a sweep over ``a``)

One JSON line per configuration to stdout; run with the repo root on
PYTHONPATH. CPU-friendly: no training, only embed passes.
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
    ap.add_argument("--cases", type=int, default=400)
    ap.add_argument("--probes", type=int, default=192)
    ap.add_argument("--chunks-per-case", type=int, default=8)
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from capbuild import _sentences  # the CAP-style corpus generator

    from trie_semantic_search_tpu.models.embedder import Embedder
    from trie_semantic_search_tpu.models.minilm import (
        count_token_ids,
        sif_weights_from_counts,
    )
    from trie_semantic_search_tpu.models.quality import (
        build_probes,
        evaluate_embedder_direct,
    )
    from trie_semantic_search_tpu.models.tokenizer import (
        WordPieceTokenizer,
        train_wordpiece_vocab,
    )

    rng = np.random.default_rng(42)
    docs = []
    for i in range(args.cases):
        n = int(rng.integers(16, 25))
        docs.append((i, _sentences(rng, i, n)))

    texts: list[str] = []
    rows: list[int] = []
    for i, sents in docs:
        for s in sents[: args.chunks_per_case]:
            texts.append(s)
            rows.append(i)
    all_texts = [s for _, sents in docs for s in sents]

    vocab = train_wordpiece_vocab(all_texts, vocab_size=8192)
    tok = WordPieceTokenizer(vocab)
    emb = Embedder(tokenizer=tok)
    probes = build_probes(docs, max_probes=args.probes)
    print(
        f"corpus: {args.cases} cases, {len(texts)} eval chunks, "
        f"{len(probes)} probes, vocab {len(tok)}", file=sys.stderr,
    )

    counts = count_token_ids(tok, all_texts, vocab_size=max(len(tok), 128))

    def run(name: str, tw) -> dict:
        emb.set_token_weights(tw)
        t0 = time.perf_counter()
        r = evaluate_embedder_direct(emb, texts, rows, probes)
        out = {
            "config": name,
            **{k: r[k] for k in sorted(r)},
            "seconds": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(out), flush=True)
        return out

    # -- case-level document frequency: how many CASES contain the token
    V = max(len(tok), 128)
    df = np.zeros(V, np.int64)
    for _, sents in docs:
        ids = set()
        for s in sents:
            a, m = tok.encode(s, 512)
            n = int(np.sum(m))
            ids.update(int(x) for x in a[:n])
        for x in ids:
            df[x] += 1
    idf = np.log((1.0 + len(docs)) / (1.0 + df)).astype(np.float32)

    def pc_variant(name: str, tw, n_pc: int) -> None:
        """Common-component removal: strip the corpus embedding matrix's
        top principal directions (the shared template mass) from both
        corpus and query vectors, then re-normalise."""
        emb.set_token_weights(tw)
        t0 = time.perf_counter()
        from trie_semantic_search_tpu.models.quality import Probe  # noqa

        corpus = emb.embed(texts).embedding.astype(np.float32)
        _, _, vt = np.linalg.svd(corpus, full_matrices=False)
        comp = vt[:n_pc]  # [C, D]

        def strip(x):
            x = x - (x @ comp.T) @ comp
            return x / np.maximum(
                np.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )

        corpus_s = strip(corpus)
        cases = np.asarray(rows)
        ranks: dict[str, list[float]] = {}
        q = emb.embed([p.query for p in probes]).embedding.astype(np.float32)
        q = strip(q)
        scores = q @ corpus_s.T
        for row, p in zip(scores, probes):
            order = np.argsort(-row, kind="stable")
            seen: list[int] = []
            rank = 0.0
            for idx in order:
                c = int(cases[idx])
                if c in seen:
                    continue
                seen.append(c)
                if c == p.target_case_row:
                    rank = 1.0 / len(seen)
                    break
                if len(seen) >= 10:
                    break
            ranks.setdefault(p.kind, []).append(rank)
            ranks.setdefault("all", []).append(rank)
        out = {"config": name, "n_pc": n_pc}
        for kind, rr in ranks.items():
            a = np.asarray(rr, np.float64)
            out[kind] = {
                "n": int(len(a)), "mrr": round(float(a.mean()), 4),
                "recall_at_1": round(float((a >= 1.0).mean()), 4),
                "recall_at_10": round(float((a > 0).mean()), 4),
            }
        out["seconds"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)

    run("plain", None)
    run("sif_a0.1", sif_weights_from_counts(counts, a=0.1))
    run("sif_a0.01", sif_weights_from_counts(counts, a=1e-2))
    run("idf", idf)
    run("idf_sq", idf * idf)
    for n_pc in (1, 2, 4, 8):
        pc_variant(f"plain_pc{n_pc}", None, n_pc)
    pc_variant("idf_pc2", idf, 2)
    pc_variant("idf_pc4", idf, 4)


if __name__ == "__main__":
    main()
