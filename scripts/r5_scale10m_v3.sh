#!/usr/bin/env bash
# Round-5 scale proof, take 3 — the host restart (2026-08-19 ~21:38) wiped
# /root/capbuild_10m, so take 2 (finalize re-run over existing shards)
# lost its input. This take regenerates the corpus AND runs the full
# >=10M-chunk build through the memmap-emit finalize (commit c67c6b3),
# with take 2's fixed external RSS sampler (python child, not the
# `timeout` wrapper) and an ABSOLUTE DEADLINE: the build is SIGTERMed
# early enough that the TPU is free before the driver's round-end bench
# (single-holder relay; a lingering holder blocks bench forever).
#
# Criterion (round-4 VERDICT item 4): >=10M-chunk build completing under
# ~15 GB peak RSS with a measured 65M-chunk projection.
#
# Launch detached:  setsid nohup bash scripts/r5_scale10m_v3.sh \
#                     > /tmp/r5_10m_v3.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_10m
mkdir -p bench_results "$WORK"
# build must EXIT by this time so the relay is free for the driver bench
DEADLINE=$(( $(date +%s) + 6000 ))

stamp() { echo "[10m-v3 $(date +%H:%M:%S)] $*"; }

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
    stamp "gen 500k cases (CPU sqlite; ~20 chunks/case -> ~10M chunks)"
    JAX_PLATFORMS=cpu timeout 3600 python scripts/capbuild.py gen \
        --cases 500000 --work "$WORK" 2> /tmp/r5_10m_gen_err.log
    stamp "gen rc=$? $(tail -c 200 /tmp/r5_10m_gen_err.log 2>/dev/null)"
fi

stamp "build (fnv, P=8192, no-tune, memmap-emit finalize, resumable)"
wait_tpu || stamp "no TPU - jax stages fall back to 1-core CPU"
BUDGET=$(( DEADLINE - $(date +%s) ))
[ "$BUDGET" -lt 600 ] && BUDGET=600
stamp "build timeout budget ${BUDGET}s"
: > /tmp/r5_10m_v3_err.log
setsid timeout "$BUDGET" python scripts/capbuild.py build \
    --work "$WORK" --partitions 8192 --embedder fnv --no-tune \
    > "$WORK/build_report.json" 2>> /tmp/r5_10m_v3_err.log &
WRAP=$!
echo $WRAP > /tmp/r5_10m_v3.pid

# resolve the python child of setsid->timeout (retry while it spawns)
CPID=""
for _ in $(seq 1 30); do
    CPID=$(pgrep -P "$WRAP" 2>/dev/null | head -1)
    [ -n "$CPID" ] && break
    sleep 1
done
stamp "wrapper=$WRAP python=$CPID"

PEAK_RSS=0; PEAK_ANON=0
while kill -0 "$WRAP" 2>/dev/null; do
    if [ -n "$CPID" ] && [ -r "/proc/$CPID/status" ]; then
        RSS=$(awk '/^VmRSS/ {print $2}' /proc/$CPID/status 2>/dev/null || echo 0)
        ANON=$(awk '/^RssAnon/ {print $2}' /proc/$CPID/status 2>/dev/null || echo 0)
        [ "${RSS:-0}" -gt "$PEAK_RSS" ] && PEAK_RSS=$RSS
        [ "${ANON:-0}" -gt "$PEAK_ANON" ] && PEAK_ANON=$ANON
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
rec = {"stage": "scale10m_v3", "build_rc": rc,
       "external_peak_rss_bytes": peak_kb * 1024,
       "external_peak_anon_rss_bytes": anon_kb * 1024,
       "sampler": "python child VmRSS/RssAnon every 5 s (take-1 sampled "
                  "the timeout wrapper)"}
rep = Path("/root/capbuild_10m/build_report.json")
if rep.exists():
    try:
        rec["build_report"] = json.loads(rep.read_text())
        chunks = rec["build_report"]["content_chunks"]
        rec["projection_65m_chunks"] = {
            "assumption": "anon RSS ~ O(slab)+O(assign arrays): the "
            "madvise-evicted memmap passes do not scale with corpus; the "
            "linear anon terms left are the [N] assign + [N, C] replica-"
            "choice arrays (~0.9 GB at 65M) and the trie CSR",
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
