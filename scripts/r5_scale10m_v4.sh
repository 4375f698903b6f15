#!/usr/bin/env bash
# Round-5 scale proof, take 4 — RESUME of take 3 (scripts/r5_scale10m_v3.sh),
# which timed out (rc=124) still inside ANN finalize pass 1 after:
#   * k-means training spent 9.5 min in the fused [524288, 8192] Lloyd
#     step (~28 s/iteration on the chip), and
#   * assignment spent ~17 s/slab in lax.top_k over the P=8192 axis,
# with external anon RSS peaking at 16.85 GB. Fixed at the root this take:
#   * kmeans._lloyd_blocked — blocked scan, same math, seconds;
#   * kmeans._topc — k rounds of masked argmax instead of top_k;
#   * build_streaming(device_resident=False) — a no-tune build never
#     transfers ~14 GB into HBM just to save (the save adopts the emit
#     dir); capbuild drops the build's references before the reload check
#     so only ONE full copy ever exists;
#   * streaming store-fill completion marker — the resume skips the
#     15 GB vectors_f32.npy re-copy.
# The corpus db + 306 shards + trie checkpoint + spill runs all survive
# in /root/capbuild_10m, so this take is finalize-only (~30 min).
#
# Criterion (round-4 VERDICT item 4): >=10M-chunk build completing under
# ~15 GB peak RSS with a measured 65M-chunk projection.
#
# Launch detached:  setsid nohup bash scripts/r5_scale10m_v4.sh \
#                     > /tmp/r5_10m_v4.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_10m
TRACE=/tmp/r5_10m_v4_trace.log
mkdir -p bench_results
# build must EXIT by this time so the relay is free for the driver bench
DEADLINE=$(( $(date +%s) + 5400 ))

stamp() { echo "[10m-v4 $(date +%H:%M:%S)] $*"; }

wait_tpu() {
    # a probe the 120 s timeout kills mid-device-op poisons the relay for
    # ~60 s — 150 s spacing keeps each retry clear of the window (CLAUDE.md)
    for _ in $(seq 1 8); do
        if timeout 120 python scripts/tpu_probe.py > /dev/null 2>&1; then
            sleep 5
            return 0
        fi
        stamp "device probe failed/hung - 150 s settle"
        sleep 150
    done
    return 1
}

if [ ! -f "$WORK/db.sqlite" ]; then
    stamp "FATAL: no corpus db at $WORK - run r5_scale10m_v3.sh first"
    exit 1
fi

stamp "resume build (fnv, P=8192, no-tune, memmap-emit, host-deferred)"
wait_tpu || stamp "no TPU - jax stages fall back to 1-core CPU"
BUDGET=$(( DEADLINE - $(date +%s) ))
[ "$BUDGET" -lt 600 ] && BUDGET=600
stamp "build timeout budget ${BUDGET}s"
: > /tmp/r5_10m_v4_err.log
: > "$TRACE"
setsid timeout "$BUDGET" python scripts/capbuild.py build \
    --work "$WORK" --partitions 8192 --embedder fnv --no-tune \
    > "$WORK/build_report.json" 2>> /tmp/r5_10m_v4_err.log &
WRAP=$!
echo $WRAP > /tmp/r5_10m_v4.pid

# resolve the python child of setsid->timeout (retry while it spawns)
CPID=""
for _ in $(seq 1 30); do
    CPID=$(pgrep -P "$WRAP" 2>/dev/null | head -1)
    [ -n "$CPID" ] && break
    sleep 1
done
stamp "wrapper=$WRAP python=$CPID"

# timestamped RSS/anon trace (take 3 only kept peaks — when the anon
# number is over budget we need to know WHICH phase produced it)
PEAK_RSS=0; PEAK_ANON=0
while kill -0 "$WRAP" 2>/dev/null; do
    if [ -n "$CPID" ] && [ -r "/proc/$CPID/status" ]; then
        RSS=$(awk '/^VmRSS/ {print $2}' /proc/$CPID/status 2>/dev/null || echo 0)
        ANON=$(awk '/^RssAnon/ {print $2}' /proc/$CPID/status 2>/dev/null || echo 0)
        echo "$(date +%s) ${RSS:-0} ${ANON:-0}" >> "$TRACE"
        [ "${RSS:-0}" -gt "$PEAK_RSS" ] && PEAK_RSS=$RSS
        [ "${ANON:-0}" -gt "$PEAK_ANON" ] && PEAK_ANON=$ANON
    fi
    # hard-deadline watchdog: kill the whole process group (ADVICE r4:
    # GNU timeout can't forward SIGKILL to its grandchildren) if the
    # wrapper somehow outlives its budget
    if [ "$(date +%s)" -gt $(( DEADLINE + 120 )) ]; then
        stamp "deadline watchdog: killing process group $WRAP"
        kill -9 -- "-$WRAP" 2>/dev/null
        sleep 2
        pgrep -g "$WRAP" > /dev/null 2>&1 && stamp "WARN: survivors in pgroup"
        break
    fi
    sleep 5
done
wait "$WRAP"
rc=$?
stamp "build rc=$rc external peak rss ${PEAK_RSS} kB anon ${PEAK_ANON} kB"

python3 - "$PEAK_RSS" "$PEAK_ANON" "$rc" <<'EOF'
import json, sys
from pathlib import Path

peak_kb, anon_kb, rc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rec = {"stage": "scale10m_v4", "build_rc": rc,
       "external_peak_rss_bytes": peak_kb * 1024,
       "external_peak_anon_rss_bytes": anon_kb * 1024,
       "sampler": "python child VmRSS/RssAnon every 5 s, timestamped "
                  "trace in /tmp/r5_10m_v4_trace.log",
       "resumed_from": "take 3 (rc=124 in ANN pass 1; shards + trie "
                       "checkpoint + spill runs + vector store reused)"}
rep = Path("/root/capbuild_10m/build_report.json")
if rep.exists():
    try:
        rec["build_report"] = json.loads(rep.read_text())
        chunks = rec["build_report"]["content_chunks"]
        rec["projection_65m_chunks"] = {
            "assumption": "anon RSS ~ O(slab)+O(assign arrays): the "
            "madvise-evicted memmap passes do not scale with corpus; the "
            "linear anon terms left are the [N] assign + [N, C] replica-"
            "choice arrays (~2.3 GB at 65M with C=8) and the trie CSR",
            "projected_peak_rss_gb": round(
                peak_kb * 1024 * (65_000_000 / max(chunks, 1)) / 2**30, 2
            ),
            "projected_peak_anon_gb": round(
                anon_kb * 1024 * (65_000_000 / max(chunks, 1)) / 2**30, 2
            ),
        }
    except Exception as e:
        rec["report_error"] = str(e)
Path("bench_results/scalebuild_r05_10m_v2.json").write_text(
    json.dumps(rec, indent=1)
)
print(json.dumps(rec)[:500])
EOF
stamp "record written to bench_results/scalebuild_r05_10m_v2.json"
