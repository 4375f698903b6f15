"""Simple demo — BASELINE config 1 (ref: /root/reference/examples/
simple_demo.rs:17-177): store + text-process three landmark SCOTUS cases,
build the case-name/citation tries, run exact + prefix lookups, print stats,
retrieve a case by id.

Run: python examples/simple_demo.py
"""

from __future__ import annotations

import datetime as dt
import tempfile

from trie_semantic_search_tpu.core.config import Config
from trie_semantic_search_tpu.core.types import CaseMetadata, new_case_id
from trie_semantic_search_tpu.index.trie import TrieIndex
from trie_semantic_search_tpu.storage.columns import MetadataColumns
from trie_semantic_search_tpu.storage.store import StorageManager
from trie_semantic_search_tpu.text.processor import TextProcessor

CASES = [
    (
        "Brown v. Board of Education",
        "347 U.S. 483 (1954)",
        dt.date(1954, 5, 17),
        "We conclude that in the field of public education the doctrine of "
        "separate but equal has no place. Separate educational facilities "
        "are inherently unequal.",
    ),
    (
        "Miranda v. Arizona",
        "384 U.S. 436 (1966)",
        dt.date(1966, 6, 13),
        "The person in custody must, prior to interrogation, be clearly "
        "informed that he has the right to remain silent.",
    ),
    (
        "Roe v. Wade",
        "410 U.S. 113 (1973)",
        dt.date(1973, 1, 22),
        "This right of privacy is broad enough to encompass a woman's "
        "decision whether or not to terminate her pregnancy.",
    ),
]


def main() -> None:
    from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

    if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
        print("warning: TPU relay unreachable - running on CPU backend")
    cfg = Config()
    with tempfile.TemporaryDirectory() as tmp:
        cfg.storage.db_path = f"{tmp}/demo.db"
        storage = StorageManager(cfg.storage)
        tp = TextProcessor(cfg.text_processing)

        print("=== storing and processing 3 landmark cases ===")
        for name, citation, date, text in CASES:
            meta = CaseMetadata(
                id=new_case_id(), name=name, citation=citation,
                court="Supreme Court of the United States", decision_date=date,
            )
            processed = tp.process_text(text)
            meta.word_count = processed.stats.word_count
            storage.store_case_metadata(meta)
            storage.store_case_text(meta.id, text)
            print(
                f"  {name}: {processed.stats.word_count} words, "
                f"{len(processed.citations)} citations, "
                f"{len(processed.legal_terms)} legal terms"
            )

        print("\n=== building case-name + citation tries ===")
        columns = MetadataColumns.build(storage.fetch_filter_columns())
        trie = TrieIndex(cfg.trie)
        for meta, text in storage.iter_cases():
            row = columns.row_of_case[meta.id]
            trie.insert_case_name(meta.name, row)
            trie.insert_citation(meta.citation, row)
        trie.freeze()
        stats = trie.get_stats()
        print(f"  name trie: {stats['name']['nodes']} nodes")
        print(f"  citation trie: {stats['citation']['nodes']} nodes")

        print("\n=== exact lookups (batched device walk) ===")
        for q in ("miranda v. arizona", "347 U.S. 483 (1954)", "roe v. wade"):
            res = trie.search(q)
            hits = [columns.case_ids[r] for r, _ in res.exact_matches]
            names = [storage.get_case_metadata(h).name for h in hits]
            print(f"  {q!r} -> {names}")

        print("\n=== prefix completions ===")
        for prefix in ("brown", "miranda v."):
            print(f"  {prefix!r} -> {trie.get_completions(prefix)}")

        print("\n=== storage stats + retrieval by id ===")
        st = storage.get_stats()
        print(f"  {st.total_cases} cases, {st.db_size_bytes} bytes on disk")
        first_id = storage.list_case_ids()[0]
        meta = storage.get_case_metadata(first_id)
        print(f"  fetched by id: {meta.name} ({meta.citation})")


if __name__ == "__main__":
    main()
