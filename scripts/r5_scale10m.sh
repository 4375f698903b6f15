#!/usr/bin/env bash
# Round-5 scale proof — a >=10M-chunk build exercising the external-sort
# memmap finalize (round-4 VERDICT item 4) with an EXTERNAL RSS sampler
# (the builder samples its own RSS only at shard checkpoints, which can
# miss the finalize peak — the criterion is peak RSS < ~15 GB at 10M
# chunks with a measured 65M-chunk projection).
#
# fnv harness embedder (the scale axis under test is the index pipeline,
# not the encoder); jax stages (kmeans/assign/quantize) use the TPU when
# the relay is up. Resumable; safe to re-launch.
#
# Launch detached:  setsid nohup bash scripts/r5_scale10m.sh \
#                     > /tmp/r5_10m.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_10m
mkdir -p bench_results "$WORK"

stamp() { echo "[10m $(date +%H:%M:%S)] $*"; }

wait_tpu() {
    for _ in $(seq 1 20); do
        if timeout 120 python scripts/tpu_probe.py > /dev/null 2>&1; then
            sleep 5
            return 0
        fi
        stamp "device probe failed/hung - 60 s wait"
        sleep 60
    done
    return 1
}

stamp "gen 500k cases (CPU sqlite; ~20 chunks/case -> ~10M chunks)"
if [ ! -f "$WORK/db.sqlite" ]; then
    JAX_PLATFORMS=cpu timeout 7200 python scripts/capbuild.py gen \
        --cases 500000 --work "$WORK" 2> /tmp/r5_10m_gen_err.log
    stamp "gen rc=$? $(tail -c 200 /tmp/r5_10m_gen_err.log 2>/dev/null)"
fi

stamp "build (fnv embedder, P=8192, no-tune, resumable)"
wait_tpu || stamp "no TPU - jax stages fall back to 1-core CPU"
: > /tmp/r5_10m_build_err.log
setsid timeout 21000 python scripts/capbuild.py build \
    --work "$WORK" --partitions 8192 --embedder fnv --no-tune \
    > "$WORK/build_report.json" 2>> /tmp/r5_10m_build_err.log &
PID=$!
echo $PID > /tmp/r5_10m_build.pid

# external RSS sampler: peak VmRSS over the build's WHOLE life
PEAK=0
while kill -0 $PID 2>/dev/null; do
    RSS=$(awk '/VmRSS/ {print $2}' /proc/$PID/status 2>/dev/null || echo 0)
    [ "${RSS:-0}" -gt "$PEAK" ] && PEAK=$RSS
    sleep 10
done
wait $PID
rc=$?
stamp "build rc=$rc external peak rss ${PEAK} kB"
python3 - "$PEAK" "$rc" <<'EOF'
import json, sys
from pathlib import Path

peak_kb, rc = int(sys.argv[1]), int(sys.argv[2])
rec = {"stage": "scale10m", "build_rc": rc,
       "external_peak_rss_bytes": peak_kb * 1024}
rep = Path("/root/capbuild_10m/build_report.json")
if rep.exists():
    try:
        rec["build_report"] = json.loads(rep.read_text())
        chunks = rec["build_report"]["content_chunks"]
        # linear-in-corpus components only; the merge block is O(1)
        rec["projection_65m_chunks"] = {
            "assumption": "peak RSS linear in chunks (upper bound: the "
            "external-sort finalize is O(block), so the true scaling of "
            "the finalize term is sub-linear)",
            "projected_peak_rss_gb": round(
                peak_kb * 1024 * (65_000_000 / max(chunks, 1)) / 2**30, 2
            ),
        }
    except Exception as e:
        rec["report_error"] = str(e)
Path("bench_results/scalebuild_r05_10m.json").write_text(
    json.dumps(rec, indent=1)
)
print(json.dumps(rec)[:400])
EOF
stamp "record written to bench_results/scalebuild_r05_10m.json"
