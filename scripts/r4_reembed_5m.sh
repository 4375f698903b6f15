#!/usr/bin/env bash
# Re-embed the round-3 flagship 250k-case / 5M-chunk corpus with the
# guarded encoder pipeline (round-3 VERDICT item 1).
#
# The round-3 artifact served a quality-degraded encoder (probe MRR 0.013
# vs 0.40 for its own random-init control). This rebuild runs the full
# round-4 pipeline: pooling selection on probe merit (mean vs SIF),
# guarded view-pair pretraining (keeps init if training degrades), the
# min-recall-floor nprobe tuner, and the build-time quality gate (the
# artifact cannot finalize silently degraded).
#
# RESUMABLE: the streaming builder checkpoints per shard — SIGKILL or a
# device OOM mid-run loses at most one shard; re-running this script
# resumes from the manifest with zero completed chunks re-embedded.
# At the round-3 TPU embed rate (~1,160 chunks/s) the streaming phase is
# ~72 min; on the 1-core CPU fallback it is ~15 h (still resumable in
# slices). Run it at first TPU availability.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/root/capbuild_r3}
test -f "$WORK/db.sqlite" || { echo "no corpus db at $WORK"; exit 1; }

# fresh artifact dirs: this is a RE-embed, not a resume of the degraded
# round-3 artifact (which no longer exists); the stream/ dir carries the
# resumable state for THIS rebuild
python scripts/capbuild.py build --work "$WORK" --partitions 4888 \
  | tee -a "$WORK/reembed_report.jsonl"

# prove served quality through the real engine (like-for-like cells)
cat > "$WORK/eval_config.toml" <<EOF
[storage]
db_path = "$WORK/db.sqlite"
[trie]
index_path = "$WORK/trie"
[vector.hnsw]
index_path = "$WORK/vec"
num_partitions = 4888
EOF
python -m trie_semantic_search_tpu.cli -c "$WORK/eval_config.toml" \
  eval-retrieval --control --probes 192 --max-cases 400 \
  > bench_results/retrieval_r04_5m.json
echo "done: bench_results/retrieval_r04_5m.json"
