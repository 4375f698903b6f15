#!/usr/bin/env bash
# Round-5 TPU capture chain — runs the whole ROADMAP.md priority queue
# serially (one process may hold the TPU at a time) the moment the relay
# is up. The host restart wiped /root/capbuild_r3 (the round-3/4 corpus
# dbs live outside the repo), so stage 3 REGENERATES a corpus and stage 4
# rebuilds the serving artifact with the REAL guarded encoder on the
# chip — the first real-encoder TPU build since round 3.
#
#   1. bench.py                 -> bench_results/bench_tpu_r04.json
#      (round-3 weak #1: the driver-captured BENCH_r03/r04 were CPU
#       fallbacks; this is the CAP-scale 5.24M-chunk headline)
#   2. r4_fusion_profile.py     -> bench_results/fusion_r04_tpu.json
#   3. capbuild gen 50k cases   -> /root/capbuild_r5 (sqlite, CPU-only)
#   4. capbuild build (model embedder, TPU encode ~1.16k chunks/s,
#      tuner ON)                -> artifact + build report
#   5. eval-retrieval --control -> bench_results/retrieval_r04_tpu.json
#   6. cli serve + cli loadtest -> bench_results/loadtest_r04_tpu.json
#      (the TPU-backed HTTP loadtest the verdict said was never recorded)
#
# Every stage has its own timeout; a timed-out (SIGTERM'd) TPU holder
# needs the 60 s relay-settle before the next client starts, else the
# next client futex-hangs forever (ops notes in CLAUDE.md).
#
# Launch detached:  setsid nohup bash scripts/r5_chain.sh \
#                     > /tmp/r5_chain.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_r5
mkdir -p bench_results

stamp() { echo "[chain $(date +%H:%M:%S)] $*"; }

# settle <exit_code>: if the previous TPU holder was killed (timeout ->
# 124, or any signal death >= 128), wait out the relay-settle window.
settle() {
    local rc=$1
    if [ "$rc" -ge 124 ]; then
        stamp "previous stage rc=$rc (killed) - 70 s relay settle"
        sleep 70
    fi
}

stamp "stage 1: CAP-scale TPU headline bench"
timeout 1500 python bench.py \
    > bench_results/bench_tpu_r04.json 2> /tmp/bench_tpu_r04_err.log
rc=$?
stamp "bench rc=$rc: $(cat bench_results/bench_tpu_r04.json 2>/dev/null)"
settle $rc

stamp "stage 2: MXU fusion profile"
timeout 700 python scripts/r4_fusion_profile.py \
    > bench_results/fusion_r04_tpu.json 2> /tmp/fusion_tpu_err.log
rc=$?
stamp "fusion rc=$rc"
settle $rc

stamp "stage 3: regenerate corpus (50k cases, CPU-only sqlite)"
if [ ! -f "$WORK/db.sqlite" ]; then
    JAX_PLATFORMS=cpu timeout 900 python scripts/capbuild.py gen \
        --cases 50000 --work "$WORK" 2> /tmp/r5_gen_err.log
    stamp "gen rc=$? $(tail -c 200 /tmp/r5_gen_err.log 2>/dev/null)"
fi

stamp "stage 4: real-encoder TPU build (resumable)"
timeout 2400 python scripts/capbuild.py build \
    --work "$WORK" --partitions 1024 \
    > "$WORK/build_report.json" 2> /tmp/r5_build_err.log
rc=$?
stamp "build rc=$rc: $(cat "$WORK/build_report.json" 2>/dev/null)"
settle $rc
[ "$rc" -ne 0 ] && { stamp "build failed - stopping before eval"; exit 1; }

cat > "$WORK/eval_config.toml" <<EOF
[storage]
db_path = "$WORK/db.sqlite"
[trie]
index_path = "$WORK/trie"
[vector.hnsw]
index_path = "$WORK/vec"
num_partitions = 1024
EOF

stamp "stage 5: engine-level retrieval eval (trained vs control)"
timeout 1200 python -m trie_semantic_search_tpu.cli \
    -c "$WORK/eval_config.toml" \
    eval-retrieval --control --probes 192 --max-cases 400 \
    > bench_results/retrieval_r04_tpu.json 2> /tmp/r4t_eval_err.log
rc=$?
stamp "eval rc=$rc: $(head -c 300 bench_results/retrieval_r04_tpu.json 2>/dev/null)"
settle $rc

stamp "stage 6: TPU-backed HTTP loadtest"
python -m trie_semantic_search_tpu.cli -c "$WORK/eval_config.toml" \
    serve --port 8808 > /tmp/r5_serve.log 2>&1 &
echo $! > /tmp/r5_serve.pid
for i in $(seq 1 180); do  # wait for the background jit warmup: queries
    # racing a cold compile 504 at the 5 s search budget (verify skill)
    grep -q "warmup complete" /tmp/r5_serve.log 2>/dev/null && break
    sleep 5
done
timeout 900 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:8808 --requests 1000 --concurrency 32 \
    > bench_results/loadtest_r04_tpu.json 2> /tmp/r4t_loadtest_err.log
rc=$?
stamp "loadtest rc=$rc: $(head -c 300 bench_results/loadtest_r04_tpu.json 2>/dev/null)"
kill -INT "$(cat /tmp/r5_serve.pid)" 2>/dev/null  # graceful: drains in-flight compile
sleep 70  # server held the TPU; settle before the driver's bench
stamp "chain complete - chip free"
