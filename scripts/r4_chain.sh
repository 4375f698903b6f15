#!/usr/bin/env bash
# Round-4 serialized job chain (1 CPU core; relay down all round).
#
# Runs the two remaining verdict deliverables back to back so a dying
# session cannot orphan them:
#   1. wait for the in-flight 25k-case REAL-encoder re-embed build
#      (/root/r4_embed, launched detached) to finish;
#   2. engine-level retrieval eval on it -> bench_results/retrieval_r04.json
#      (round-3 VERDICT item 1: trained artifact must match/beat the
#      random-init control through the real engine);
#   3. 1M-case / ~10M-chunk finalize-scale harness build (fnv embedder)
#      with a deliberate mid-stream SIGKILL + resume (crash-resume
#      exercised) -> bench_results/scalebuild_r04.json (VERDICT item 4).
#
# Launch detached:  setsid nohup bash scripts/r4_chain.sh \
#                     > /tmp/r4_chain.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

EMBED_WORK=/root/r4_embed
SCALE_WORK=/root/r4_scale

log() { echo "[chain $(date +%H:%M:%S)] $*"; }

# ---- 1. wait for the re-embed build ------------------------------------
if [ -f /tmp/r4_build.pid ]; then
    PID=$(cat /tmp/r4_build.pid)
    while kill -0 "$PID" 2>/dev/null; do sleep 30; done
    log "re-embed build (pid $PID) exited"
fi
if ! grep -q '"stage": "build"' /tmp/r4_build.log 2>/dev/null; then
    log "re-embed build produced no report - relaunching once (resume)"
    # P=128: the exhaustive assignment matmul measured ~22 GFLOP/s on
    # this contended core — P=512 would be ~74 min of finalize for no
    # quality gain the tuner can't recover via nprobe
    python scripts/capbuild.py build --work "$EMBED_WORK" --partitions 128 \
        --max-cases 12500 \
        >> /tmp/r4_build.log 2>> /tmp/r4_build_err.log
fi
log "re-embed report: $(tail -1 /tmp/r4_build.log)"

# ---- 2. engine-level retrieval eval ------------------------------------
cat > "$EMBED_WORK/eval_config.toml" <<EOF
[storage]
db_path = "$EMBED_WORK/db.sqlite"
[trie]
index_path = "$EMBED_WORK/trie"
[vector.hnsw]
index_path = "$EMBED_WORK/vec"
num_partitions = 128
EOF
if timeout 5400 python -m trie_semantic_search_tpu.cli \
        -c "$EMBED_WORK/eval_config.toml" \
        eval-retrieval --control --probes 192 --max-cases 400 \
        > /tmp/retrieval_r04.json 2> /tmp/retrieval_r04_err.log; then
    cp /tmp/retrieval_r04.json bench_results/retrieval_r04.json
    log "retrieval_r04.json written"
else
    log "eval-retrieval FAILED (see /tmp/retrieval_r04_err.log)"
fi

# ---- 2b. serve-path record: timed load, latency, recall vs oracle ------
timeout 1800 python scripts/r3_serve_bench.py --work "$EMBED_WORK" \
    --out bench_results/servebench_r04.json --skip-quality \
    > /tmp/servebench_r04.log 2>&1 \
    && log "servebench_r04.json written" \
    || log "servebench FAILED (see /tmp/servebench_r04.log)"

# ---- 3. 1M-case scale build (fnv harness) ------------------------------
# fresh stream: the 27 shards in stream/ were embedded with the slower
# wordpiece harness mode (evidence snapshot: scalestream_wp_r04.json);
# mixing embedders inside one artifact would make recall math meaningless.
#
# Wall-clock-bounded finalize sizing for the 1-core CPU fallback: the
# dominant finalize costs are the exhaustive centroid-assignment matmul
# (O(N*P*D) — seconds on one chip's MXU, hours on this core at serving
# P) and the nprobe tuner's exact oracle (O(N*probes*D)). So: cap chunks
# at 3/case (1M cases -> ~3M chunks), P=32, tuner off (--no-tune). The
# CASES axis (4x round-3's 250k), streaming RSS, external-sort trie
# finalize, artifact assembly/save/load and crash-resume are all still
# exercised at full 1M-case scale.
rm -rf "$SCALE_WORK/stream" "$SCALE_WORK/trie" "$SCALE_WORK/vec"
SCALE_FLAGS="--embedder fnv --partitions 32 --max-chunks-per-case 3 --no-tune"
log "scale build: first slice (will be SIGKILLed to exercise resume)"
timeout -s KILL 240 python scripts/capbuild.py build --work "$SCALE_WORK" \
    $SCALE_FLAGS \
    > /tmp/r4_scale_build.log 2> /tmp/r4_scale_build_err.log
log "first slice exited (expected 137); resuming to completion"
if python scripts/capbuild.py build --work "$SCALE_WORK" \
        $SCALE_FLAGS \
        >> /tmp/r4_scale_build.log 2>> /tmp/r4_scale_build_err.log; then
    grep '"stage": "build"' /tmp/r4_scale_build.log | tail -1 \
        > bench_results/scalebuild_r04.json
    log "scalebuild_r04.json written"
else
    log "scale build FAILED (see /tmp/r4_scale_build_err.log)"
fi
log "chain done"
