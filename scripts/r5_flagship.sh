#!/usr/bin/env bash
# Round-5 flagship chain — rebuilds the wiped >=5M-chunk real-encoder
# artifact on the TPU and captures every evidence record the round-4
# VERDICT asked for, serially (one TPU holder at a time):
#
#   0. wait for stage A (the 500k-artifact loadtest, port 8808) to free
#      the chip
#   1. bench.py                  -> bench_results/bench_tpu_r05.json
#      (validates the new dual-operating-point headline format early)
#   2. capbuild gen 250k cases   -> /root/capbuild_flagship (CPU sqlite)
#   3. capbuild build (model embedder, P=4096, tuner ON, resumable,
#      watchdogged)              -> ~5M-chunk artifact + build report
#   4. eval-retrieval --control  -> bench_results/retrieval_r05.json
#   5. recall sweep + tie audit  -> bench_results/tunefloor_r05.json
#   6. cli serve + cli loadtest  -> bench_results/loadtest_r05_flagship.json
#
# Launch detached:  setsid nohup bash scripts/r5_flagship.sh \
#                     > /tmp/r5_flagship.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_flagship
P=4096
mkdir -p bench_results "$WORK"

stamp() { echo "[flag $(date +%H:%M:%S)] $*"; }

wait_tpu() {  # throwaway-process device probe; retries until sane
    for _ in $(seq 1 90); do
        if timeout 120 python scripts/tpu_probe.py > /dev/null 2>&1; then
            sleep 5
            return 0
        fi
        stamp "device probe failed/hung - 60 s wait"
        sleep 60
    done
    stamp "device never became sane; giving up"
    return 1
}

cpu_jiffies() {  # utime+stime of a pid (0 if gone)
    awk '{print $14 + $15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

stamp "stage 0: waiting for stage A to free the chip"
for _ in $(seq 1 720); do  # up to 6 h
    if [ -f /tmp/r5_serve_a.pid ] && kill -0 "$(cat /tmp/r5_serve_a.pid)" \
            2>/dev/null; then
        sleep 30
    else
        break
    fi
done
sleep 30

stamp "stage 1: headline bench (new dual-operating-point format)"
wait_tpu || exit 1
timeout 2700 python bench.py \
    > bench_results/bench_tpu_r05.json 2> /tmp/r5f_bench_err.log
rc=$?
stamp "bench rc=$rc: $(cat bench_results/bench_tpu_r05.json 2>/dev/null)"
[ $rc -ge 124 ] && sleep 75

stamp "stage 2: gen 250k-case corpus (CPU-only sqlite)"
if [ ! -f "$WORK/db.sqlite" ]; then
    JAX_PLATFORMS=cpu timeout 3600 python scripts/capbuild.py gen \
        --cases 250000 --work "$WORK" 2> /tmp/r5f_gen_err.log
    stamp "gen rc=$? $(tail -c 200 /tmp/r5f_gen_err.log 2>/dev/null)"
fi

run_build() {  # one watchdogged build attempt; returns the build's rc
    setsid timeout 16000 python scripts/capbuild.py build \
        --work "$WORK" --partitions $P \
        > "$WORK/build_report.json" 2>> /tmp/r5f_build_err.log &
    local pid
    pid=$!
    echo $pid > /tmp/r5f_build.pid
    # hang watchdog: a live build either grows its stderr (one shard log
    # per ~32k chunks) or accrues CPU (finalize's long silent lexsort);
    # a futex-hung client does neither
    local last_sig="" idle=0
    while kill -0 $pid 2>/dev/null; do
        sleep 60
        local sig
        sig="$(stat -c %s /tmp/r5f_build_err.log 2>/dev/null):$(cpu_jiffies $pid)"
        if [ "$sig" = "$last_sig" ]; then
            idle=$((idle + 60))
        else
            idle=0
            last_sig="$sig"
        fi
        if [ $idle -ge 900 ]; then
            stamp "watchdog: no stderr growth AND no CPU for ${idle}s - hung"
            # $pid is a setsid leader => also the pgid; GNU timeout cannot
            # forward SIGKILL to the python child in its own group, so
            # kill the whole group and verify nothing survives
            kill -9 -- -$pid 2>/dev/null
            wait $pid 2>/dev/null
            for _ in $(seq 1 10); do
                pgrep -g $pid > /dev/null 2>&1 || break
                sleep 3
            done
            sleep 75
            return 99
        fi
    done
    wait $pid
    return $?
}

stamp "stage 3: real-encoder TPU build (250k cases, P=$P, resumable)"
: > /tmp/r5f_build_err.log
attempt=0
rc=99
while [ $attempt -lt 4 ] && [ $rc -ne 0 ]; do
    attempt=$((attempt + 1))
    wait_tpu || exit 1
    stamp "build attempt $attempt"
    run_build
    rc=$?
    stamp "build attempt $attempt rc=$rc"
    [ $rc -ge 124 ] && [ $rc -ne 99 ] && sleep 75
done
stamp "build rc=$rc: $(cat "$WORK/build_report.json" 2>/dev/null)"
[ $rc -ne 0 ] && { stamp "build failed - stopping before eval"; exit 1; }

cat > "$WORK/eval_config.toml" <<EOF
[storage]
db_path = "$WORK/db.sqlite"
[trie]
index_path = "$WORK/trie"
[vector.hnsw]
index_path = "$WORK/vec"
num_partitions = $P
EOF

stamp "stage 4: engine-level retrieval eval (trained vs control)"
wait_tpu || exit 1
timeout 3600 python -m trie_semantic_search_tpu.cli \
    -c "$WORK/eval_config.toml" \
    eval-retrieval --control --probes 192 --max-cases 400 \
    > bench_results/retrieval_r05.json 2> /tmp/r5f_eval_err.log
rc=$?
stamp "eval rc=$rc: $(head -c 400 bench_results/retrieval_r05.json 2>/dev/null)"
[ $rc -ge 124 ] && sleep 75

stamp "stage 5: recall sweep + per-probe tie audit"
wait_tpu || exit 1
timeout 3600 python scripts/r4_recall_sweep.py \
    --work "$WORK" --floor 0.95 \
    > bench_results/tunefloor_r05.json 2> /tmp/r5f_sweep_err.log
rc=$?
stamp "sweep rc=$rc: $(head -c 300 bench_results/tunefloor_r05.json 2>/dev/null)"
[ $rc -ge 124 ] && sleep 75

stamp "stage 6: flagship TPU-backed HTTP loadtest"
wait_tpu || exit 1
setsid python -m trie_semantic_search_tpu.cli -c "$WORK/eval_config.toml" \
    serve -p 8809 > /tmp/r5f_serve.log 2>&1 &
SERVE=$!
echo $SERVE > /tmp/r5f_serve.pid
timeout 4500 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:8809 --requests 1000 --concurrency 32 \
    --wait-warm 3000 \
    > bench_results/loadtest_r05_flagship.json 2> /tmp/r5f_lt_err.log
rc=$?
stamp "loadtest rc=$rc: $(cat bench_results/loadtest_r05_flagship.json 2>/dev/null)"
kill -INT $SERVE 2>/dev/null
for _ in $(seq 1 120); do
    kill -0 $SERVE 2>/dev/null || break
    sleep 5
done
if kill -0 $SERVE 2>/dev/null; then
    stamp "server ignored SIGINT for 600 s; killing its group"
    kill -9 -- -$SERVE 2>/dev/null
    sleep 75
fi
sleep 10
stamp "chain complete - chip free"
