#!/usr/bin/env bash
# Round-5 stage A2 — loadtest iteration with the rate limiter raised for
# the load-generation client (the A1 run's only errors were 429s from the
# server's own per-client RPM limiter — reference-parity behaviour, but
# it caps any single-host loadtest at rate_limit_rpm). Sweeps concurrency
# 32 / 64 / 128 to find the product-surface throughput ceiling.
#
# Launch detached:  setsid nohup bash scripts/r5_loadtest_b.sh \
#                     > /tmp/r5_lt_b.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_r5
mkdir -p bench_results

stamp() { echo "[ltD $(date +%H:%M:%S)] $*"; }

wait_tpu() {
    for _ in $(seq 1 15); do
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

stamp "serving the 500k-chunk artifact (rate limiter raised)"
wait_tpu || exit 1
setsid python -m trie_semantic_search_tpu.cli -c "$WORK/lt_config_c.toml" \
    serve > /tmp/r5_serve_d.log 2>&1 &
SERVE=$!
echo $SERVE > /tmp/r5_serve_d.pid

stamp "loadtest c=32 (waits for warm up to 2400 s)"
timeout 3600 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:8808 --requests 1000 --concurrency 32 \
    --wait-warm 2400 --query-template 'question of due process round {i}' \
    > bench_results/loadtest_r05_tpu_c32.json 2> /tmp/r5_lt_err.log
stamp "c=32 rc=$?: $(cat bench_results/loadtest_r05_tpu_c32.json 2>/dev/null)"

stamp "loadtest c=64"
timeout 900 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:8808 --requests 4000 --concurrency 128 \
    --query-template 'matter of equal protection appeal {i}' \
    > bench_results/loadtest_r05_tpu_c128b.json 2>> /tmp/r5_lt_err.log
stamp "c=128 rc=$?: $(cat bench_results/loadtest_r05_tpu_c128b.json 2>/dev/null)"

stamp "loadtest c=128"
timeout 900 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:8808 --requests 4000 --concurrency 256 \
    --query-template 'issue of search and seizure motion {i}' \
    > bench_results/loadtest_r05_tpu_c256.json 2>> /tmp/r5_lt_err.log
stamp "c=256 rc=$?: $(cat bench_results/loadtest_r05_tpu_c256.json 2>/dev/null)"

stamp "graceful shutdown"
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
stamp "done - chip free"
