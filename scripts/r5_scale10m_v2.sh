#!/usr/bin/env bash
# Round-5 scale proof, take 2 — the >=10M-chunk finalize re-run over the
# already-embedded /root/capbuild_10m shards, now with:
#   * the ANN memmap-emit finalize (build_streaming(emit_dir=...)) — the
#     ~17 GB of anon int8 blocks + bf16 rescore copy fill disk-backed
#     files that save_dir ADOPTS with a rename,
#   * madvise(MADV_DONTNEED) slab eviction on every corpus-scale memmap
#     pass (ANN input, emit outputs, vector-store fill + save copy),
#   * a FIXED external RSS sampler: take 1 sampled the `timeout` wrapper
#     (1.8 MB) instead of the python build (round-5 session note); this
#     one resolves the python child and tracks VmRSS + RssAnon + VmHWM.
#
# Criterion (round-4 VERDICT item 4): >=10M-chunk build completing under
# ~15 GB peak RSS with a measured 65M-chunk projection.
#
# Launch detached:  setsid nohup bash scripts/r5_scale10m_v2.sh \
#                     > /tmp/r5_10m_v2.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=/root/capbuild_10m
mkdir -p bench_results

stamp() { echo "[10m-v2 $(date +%H:%M:%S)] $*"; }

wait_tpu() {
    # NOTE: a probe the 120 s timeout SIGTERMs mid-device-op poisons the
    # relay for ~60 s (CLAUDE.md) — retrying at exactly 60 s re-poisons
    # forever. 150 s spacing keeps each retry clear of the window.
    for _ in $(seq 1 12); do
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
    stamp "no corpus db at $WORK - gen first (see r5_scale10m.sh)"; exit 1
fi

# force the finalize to re-run over the existing shards: drop the old
# artifact dirs (they are the OUTPUT under test), keep db + stream shards
rm -rf "$WORK/trie" "$WORK/vec"

stamp "build (resume over existing shards; fnv, P=8192, no-tune)"
wait_tpu || stamp "no TPU - jax stages fall back to 1-core CPU"
: > /tmp/r5_10m_v2_err.log
setsid timeout 21000 python scripts/capbuild.py build \
    --work "$WORK" --partitions 8192 --embedder fnv --no-tune \
    > "$WORK/build_report.json" 2>> /tmp/r5_10m_v2_err.log &
WRAP=$!
echo $WRAP > /tmp/r5_10m_v2.pid

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
HWM=$(awk '/^VmHWM/ {print $2}' /proc/$CPID/status 2>/dev/null || echo 0)
stamp "build rc=$rc external peak rss ${PEAK_RSS} kB anon ${PEAK_ANON} kB"

python3 - "$PEAK_RSS" "$PEAK_ANON" "$rc" <<'EOF'
import json, sys
from pathlib import Path

peak_kb, anon_kb, rc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rec = {"stage": "scale10m_v2", "build_rc": rc,
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
