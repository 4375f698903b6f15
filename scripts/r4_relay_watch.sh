#!/usr/bin/env bash
# Poll the TPU relay (port 8093, dead since the round-3 device-OOM) and,
# the moment it answers, re-capture the two TPU-gated round-4 records:
#   * bench.py CAP-scale headline  -> bench_results/bench_tpu_r04.json
#     (round-3 weak #1: BENCH_r03 was a CPU fallback)
#   * encode+scan fusion profile   -> bench_results/fusion_r04_tpu.json
# Then exits (one shot - the driver's end-of-round bench.py needs the
# chip free; only one process may hold the TPU at a time).
#
# Launch detached:  setsid nohup bash scripts/r4_relay_watch.sh \
#                     > /tmp/r4_relay_watch.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
        echo "[watch $(date +%H:%M:%S)] relay UP - capturing TPU records"
        sleep 60  # per ops notes: a client started <60s after a relay
                  # event can futex-hang; settle first
        timeout 3600 python bench.py \
            > bench_results/bench_tpu_r04.json \
            2> /tmp/bench_tpu_r04_err.log \
            && echo "[watch] bench captured: $(cat bench_results/bench_tpu_r04.json)"
        timeout 1800 python scripts/r4_fusion_profile.py \
            > bench_results/fusion_r04_tpu.json \
            2> /tmp/fusion_tpu_err.log \
            && echo "[watch] fusion profile captured"
        exit 0
    fi
    sleep 600
done
