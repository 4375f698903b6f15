#!/usr/bin/env bash
# Round-5 chain C: prove the pad-replica layout at flagship scale.
#
#   1. rebuild the 5M-chunk artifact's ANN with pad replicas (reuses the
#      trained centroids + stored embeddings; no re-embedding) and re-tune
#        -> bench_results/replica_rebuild_r05.json
#   2. recall sweep + per-probe tie audit over the swapped-in layout
#        -> bench_results/tunefloor_r05b.json  (compare tunefloor_r05.json)
#
# Both stages run fine on the 1-core CPU host (relay-guarded); when the
# TPU relay is back, the bench/loadtest stages run separately.
#
# Launch detached:  setsid nohup bash scripts/r5_chain_c.sh \
#                     > /tmp/r5_chain_c.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_flagship
mkdir -p bench_results

stamp() { echo "[c $(date +%H:%M:%S)] $*"; }

stamp "stage 1: replica rebuild + retune"
timeout 28800 python scripts/r5_replica_rebuild.py --work "$WORK" \
    > bench_results/replica_rebuild_r05.json 2> /tmp/r5_rebuild_err.log
rc=$?
stamp "rebuild rc=$rc: $(cat bench_results/replica_rebuild_r05.json 2>/dev/null)"
[ $rc -ne 0 ] && { tail -5 /tmp/r5_rebuild_err.log; exit 1; }

stamp "stage 2: recall sweep + tie audit over the replicated layout"
timeout 21600 python scripts/r4_recall_sweep.py \
    --work "$WORK" --floor 0.95 \
    > bench_results/tunefloor_r05b.json 2> /tmp/r5_sweep_b_err.log
rc=$?
stamp "sweep rc=$rc: $(head -c 400 bench_results/tunefloor_r05b.json 2>/dev/null)"
stamp "chain C complete"
