#!/usr/bin/env bash
# Round-5 chain, part B — the artifact stages (build → eval → loadtest)
# after r5_chain.sh captured the headline + fusion records. Split out
# because the first chain's build futex-hung at its first device op
# (started 21 s after the previous TPU client exited — the <60 s relay
# pathology CLAUDE.md documents; threads parked in futex_do_wait with
# zero CPU). This part:
#   * probes jax.devices() in a throwaway process before EVERY TPU
#     stage and enforces a 75 s settle after any kill,
#   * watchdogs the build: if it accrues no progress marker within
#     10 min it is declared hung, killed, settled, and retried once
#     (the streaming build is resumable, so a retry loses nothing),
#   * sizes the build to the 1-core host's tokenize rate:
#     25k cases (~0.5M chunks, 2x the round-4 quality-proof scale).
#
# Launch detached:  setsid nohup bash scripts/r5_chain_b.sh \
#                     > /tmp/r5_chain_b.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_r5
P=512
mkdir -p bench_results

stamp() { echo "[chainB $(date +%H:%M:%S)] $*"; }

wait_tpu() {  # throwaway-process device probe; retries until sane
    for _ in $(seq 1 15); do
        if timeout 90 python -c "import jax; jax.devices()" \
                > /dev/null 2>&1; then
            sleep 5
            return 0
        fi
        stamp "device probe failed/hung - 60 s wait"
        sleep 60
    done
    stamp "device never became sane; giving up"
    return 1
}

run_build() {  # one watchdogged build attempt; returns the build's rc
    : > /tmp/r5_build_err.log
    setsid timeout 2400 python scripts/capbuild.py build \
        --work "$WORK" --partitions $P --max-cases 25000 \
        > "$WORK/build_report.json" 2>> /tmp/r5_build_err.log &
    local pid=$!
    echo $pid > /tmp/r5_build.pid
    # hang watchdog: the builder logs shard checkpoints to stderr and
    # creates $WORK/stream within the first minutes; a futex-hung client
    # shows neither and accrues no CPU
    local waited=0
    while kill -0 $pid 2>/dev/null; do
        sleep 30
        waited=$((waited + 30))
        if [ $waited -ge 600 ] && [ ! -d "$WORK/stream" ]; then
            stamp "watchdog: no stream dir after ${waited}s - hung; killing"
            # $pid is a setsid leader, so it is also the pgid: kill the
            # whole group (GNU timeout cannot forward SIGKILL to the
            # python child it runs in its own group — a bare kill -9 $pid
            # orphans the futex-hung python still holding the TPU)
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

stamp "stage 4: real-encoder TPU build (25k cases, P=$P, resumable)"
wait_tpu || exit 1
run_build
rc=$?
if [ $rc -eq 99 ]; then
    stamp "retrying the build once after the hang"
    wait_tpu || exit 1
    run_build
    rc=$?
fi
stamp "build rc=$rc: $(cat "$WORK/build_report.json" 2>/dev/null)"
[ $rc -ge 124 ] && sleep 75
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

stamp "stage 5: engine-level retrieval eval (trained vs control)"
wait_tpu || exit 1
timeout 1500 python -m trie_semantic_search_tpu.cli \
    -c "$WORK/eval_config.toml" \
    eval-retrieval --control --probes 192 --max-cases 400 \
    > bench_results/retrieval_r04_tpu.json 2> /tmp/r4t_eval_err.log
rc=$?
stamp "eval rc=$rc: $(head -c 300 bench_results/retrieval_r04_tpu.json 2>/dev/null)"
[ $rc -ge 124 ] && sleep 75

stamp "stage 6: TPU-backed HTTP loadtest"
wait_tpu || exit 1
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
kill -INT "$(cat /tmp/r5_serve.pid)" 2>/dev/null  # graceful: drains compile
sleep 75  # server held the TPU; settle before the driver's bench
stamp "chain B complete - chip free"
