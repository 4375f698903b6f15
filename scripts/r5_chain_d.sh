#!/usr/bin/env bash
# Round-5 chain D: TPU work queued behind the 10M-chunk scale build.
#
#   0. wait for the 10M build (single TPU holder) to exit + settle + probe
#   1. bench.py with the batch-aware dual-mode headline (commit c1b8d44)
#        -> bench_results/bench_tpu_r05b.json
#   2. chain C stage 1: pad-replica rebuild + retune of the flagship
#      artifact (reuses centroids + stored embeddings; no re-embedding)
#        -> bench_results/replica_rebuild_r05.json
#   3. chain C stage 2: recall sweep + per-probe tie audit over the
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

# ---- stage 2: flagship pad-replica rebuild + retune ----
setsid timeout 14400 python scripts/r5_replica_rebuild.py --work "$WORK" \
    > bench_results/replica_rebuild_r05.json 2> /tmp/r5_rebuild_err.log
rc=$?
stamp "rebuild rc=$rc: $(cat bench_results/replica_rebuild_r05.json 2>/dev/null)"
[ $rc -ne 0 ] && { tail -5 /tmp/r5_rebuild_err.log; exit 1; }

# ---- stage 3: recall sweep + tie audit over the replicated layout ----
setsid timeout 10800 python scripts/r4_recall_sweep.py \
    --work "$WORK" --floor 0.95 \
    > bench_results/tunefloor_r05b.json 2> /tmp/r5_sweep_b_err.log
rc=$?
stamp "sweep rc=$rc: $(head -c 400 bench_results/tunefloor_r05b.json 2>/dev/null)"
stamp "chain D complete - TPU free"
