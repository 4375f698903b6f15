#!/usr/bin/env bash
# Round-5 chain D: TPU work queued behind the 10M-chunk scale build.
#
#   0. wait for the 10M build (single TPU holder) to exit + settle + probe
#   1. bench.py with the batch-aware dual-mode headline (commit c1b8d44)
#        -> bench_results/bench_tpu_r05b.json
#   2. product-surface loadtest of the stream mode: serve the flagship
#      5M-chunk artifact with batch_max=256 — at P=4096/nprobe~32 the
#      break-even B*nprobe >= P*ceil(B/256) crosses at Bp=128, so
#      high-concurrency HTTP batches serve through the layout-brute
#      stream, and 256-query batches also cut the ~2 tunnel RTTs/batch
#      to 1/4 of the batch_max=64 runs
#        -> bench_results/loadtest_r05_stream_c192.json / _c256.json
#        -> bench_results/servestats_r05b.json
#   3. chain C stage 1: pad-replica rebuild + retune of the flagship
#      artifact (reuses centroids + stored embeddings; no re-embedding)
#        -> bench_results/replica_rebuild_r05.json
#   4. chain C stage 2: recall sweep + per-probe tie audit over the
#      replicated layout -> bench_results/tunefloor_r05b.json
#
# Every stage is timeout-bounded so the TPU is ALWAYS released; watchdog
# kills use the whole process group (ADVICE r4).
#
# Launch detached:  setsid nohup bash scripts/r5_chain_d.sh \
#                     > /tmp/r5_chain_d.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_flagship
PORT=8812
mkdir -p bench_results

stamp() { echo "[d $(date +%H:%M:%S)] $*"; }

# ---- stage 0: wait for the 10M build to release the chip ----
BUILD_PID=$(cat /tmp/r5_10m_build.pid 2>/dev/null || echo "")
if [ -n "$BUILD_PID" ]; then
    while kill -0 "$BUILD_PID" 2>/dev/null; do sleep 20; done
fi
stamp "10M build exited; 75 s settle"
sleep 75
for i in $(seq 1 20); do
    if timeout 120 python scripts/tpu_probe.py > /dev/null 2>&1; then
        break
    fi
    stamp "device probe failed/hung - 60 s wait"
    sleep 60
done
stamp "TPU probe ok"

# ---- stage 1: dual-mode bench headline ----
setsid timeout 3600 python bench.py \
    > bench_results/bench_tpu_r05b.json 2> /tmp/r5_bench_d_err.log
rc=$?
stamp "bench rc=$rc: $(cat bench_results/bench_tpu_r05b.json 2>/dev/null)"
[ $rc -ne 0 ] && tail -5 /tmp/r5_bench_d_err.log

# ---- stage 2: stream-mode loadtest over the flagship artifact ----
cat > "$WORK/serve_stream.toml" <<EOF
[storage]
db_path = "$WORK/db.sqlite"
[trie]
index_path = "$WORK/trie"
[vector.hnsw]
index_path = "$WORK/vec"
num_partitions = 4096
[server]
rate_limit_rpm = 10000000
batch_max = 256
batch_max_pending = 1024
[search]
search_timeout_ms = 15000
EOF
stamp "stage 2: serve flagship artifact on :$PORT (batch_max=256)"
setsid python -m trie_semantic_search_tpu.cli -c "$WORK/serve_stream.toml" \
    serve -p $PORT > /tmp/r5_chain_d_serve.log 2>&1 &
SERVE=$!
echo $SERVE > /tmp/r5_chain_d_serve.pid

stamp "stage 2a: loadtest c=192 (waits for warm)"
timeout 4800 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:$PORT --requests 4000 --concurrency 192 \
    --timeout 30 --wait-warm 4200 \
    > bench_results/loadtest_r05_stream_c192.json 2> /tmp/r5_chain_d_lt_err.log
stamp "c=192 rc=$?: $(cat bench_results/loadtest_r05_stream_c192.json 2>/dev/null)"

stamp "stage 2b: loadtest c=256"
timeout 900 python -m trie_semantic_search_tpu.cli loadtest \
    --url http://127.0.0.1:$PORT --requests 4000 --concurrency 256 \
    --timeout 30 \
    > bench_results/loadtest_r05_stream_c256.json 2>> /tmp/r5_chain_d_lt_err.log
stamp "c=256 rc=$?: $(cat bench_results/loadtest_r05_stream_c256.json 2>/dev/null)"

stamp "stage 2c: /stats capture"
timeout 60 python - <<'EOF' > bench_results/servestats_r05b.json 2>> /tmp/r5_chain_d_lt_err.log
import json, urllib.request
with urllib.request.urlopen("http://127.0.0.1:8812/stats", timeout=30) as r:
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

# ---- stage 3: flagship pad-replica rebuild + retune ----
setsid timeout 14400 python scripts/r5_replica_rebuild.py --work "$WORK" \
    > bench_results/replica_rebuild_r05.json 2> /tmp/r5_rebuild_err.log
rc=$?
stamp "rebuild rc=$rc: $(cat bench_results/replica_rebuild_r05.json 2>/dev/null)"
[ $rc -ne 0 ] && { tail -5 /tmp/r5_rebuild_err.log; exit 1; }

# ---- stage 4: recall sweep + tie audit over the replicated layout ----
setsid timeout 10800 python scripts/r4_recall_sweep.py \
    --work "$WORK" --floor 0.95 \
    > bench_results/tunefloor_r05b.json 2> /tmp/r5_sweep_b_err.log
rc=$?
stamp "sweep rc=$rc: $(head -c 400 bench_results/tunefloor_r05b.json 2>/dev/null)"
stamp "chain D complete - TPU free"
