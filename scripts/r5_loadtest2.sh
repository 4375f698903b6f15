#!/usr/bin/env bash
# Round-5 follow-up loadtest chain: serve the flagship 5M-chunk artifact
# with a production-tuned config (budget 15 s to ride out rare multi-second
# relay stalls; rate limiter lifted for the generator; batcher shapes kept
# on the already-cached ladder) and measure the product surface at higher
# concurrency:
#
#   A. loadtest c=64,  2000 req -> bench_results/loadtest_r05_c64.json
#   B. loadtest c=192, 4000 req -> bench_results/loadtest_r05_c192.json
#   C. /stats capture           -> bench_results/servestats_r05.json
#
# jax_log_compiles is on (utils.enable_persistent_compile_cache), so any
# mid-run stall caused by a fresh compile is now attributable from
# /tmp/r5_lt2_serve.log.
#
# Launch detached:  setsid nohup bash scripts/r5_loadtest2.sh \
#                     > /tmp/r5_lt2.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_flagship
PORT=8811
stamp() { echo "[lt2 $(date +%H:%M:%S)] $*"; }

wait_tpu() {
    for _ in $(seq 1 10); do
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

cat > "$WORK/serve_config.toml" <<EOF
[storage]
db_path = "$WORK/db.sqlite"
[trie]
index_path = "$WORK/trie"
[vector.hnsw]
index_path = "$WORK/vec"
num_partitions = 4096
[server]
rate_limit_rpm = 10000000
batch_max_pending = 1024
[search]
search_timeout_ms = 15000
EOF

stamp "stage 0: device probe"
wait_tpu || exit 1

stamp "stage 1: serve flagship artifact on :$PORT"
setsid python -m trie_semantic_search_tpu.cli -c "$WORK/serve_config.toml" \
    serve -p $PORT > /tmp/r5_lt2_serve.log 2>&1 &
SERVE=$!
echo $SERVE > /tmp/r5_lt2_serve.pid

stamp "stage 2: loadtest c=64 (waits for warm)"
timeout 3000 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:$PORT --requests 2000 --concurrency 64 \
    --timeout 30 --wait-warm 2400 \
    > bench_results/loadtest_r05_c64.json 2> /tmp/r5_lt2_err.log
stamp "c=64 rc=$?: $(cat bench_results/loadtest_r05_c64.json 2>/dev/null)"

stamp "stage 3: loadtest c=192"
timeout 900 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:$PORT --requests 4000 --concurrency 192 \
    --timeout 30 \
    > bench_results/loadtest_r05_c192.json 2>> /tmp/r5_lt2_err.log
stamp "c=192 rc=$?: $(cat bench_results/loadtest_r05_c192.json 2>/dev/null)"

stamp "stage 4: /stats capture"
timeout 60 python - <<'EOF' > bench_results/servestats_r05.json 2>> /tmp/r5_lt2_err.log
import json, urllib.request
with urllib.request.urlopen("http://127.0.0.1:8811/stats", timeout=30) as r:
    print(json.dumps(json.load(r), indent=2))
EOF
stamp "stats rc=$?"

kill -INT $SERVE 2>/dev/null
for _ in $(seq 1 60); do
    kill -0 $SERVE 2>/dev/null || break
    sleep 5
done
if kill -0 $SERVE 2>/dev/null; then
    stamp "server ignored SIGINT; killing its group"
    kill -9 -- -$SERVE 2>/dev/null
    sleep 75
fi
sleep 10
stamp "chain complete - chip free"
