#!/bin/bash
# Scale-capture wrapper (r15 VERDICT items 3+4): runs Bench under the
# pinned heap protocol WITH system telemetry alongside, so a poisoned
# run (whole-run uniform ~2x slowdown — the BENCH_r15_sf1_full run-2
# shape) can be attributed from the capture itself instead of
# hypothesized afterwards:
#
#   - vmstat 1  -> $OUT/vmstat.log   (r/b queues, si/so swap, us/sy/id/wa/st
#                                     CPU split — kernel page-fault storms
#                                     show as sy spikes, co-tenancy as st,
#                                     memory pressure as si/so)
#   - /proc/self-style JVM GC attribution comes from the bench's own
#     BENCH_RUN_START/END stderr markers (wall-clock ISO timestamps,
#     matched against vmstat's -t timestamps)
#
# Usage: tools/bench_capture.sh <sfDir> <outDir> [runs=3] [mem=96g]
# Writes: $OUT/bench_stdout.log, bench_stderr.log, vmstat.log,
#         bench_full.json (copied from target/)
set -uo pipefail
cd "$(dirname "$0")/.."

SF="${1:?usage: bench_capture.sh <sfDir> <outDir> [runs] [mem]}"
OUT="${2:?usage: bench_capture.sh <sfDir> <outDir> [runs] [mem]}"
RUNS="${3:-3}"
MEM="${4:-96g}"
mkdir -p "$OUT"

vmstat -t 1 > "$OUT/vmstat.log" 2>&1 &
VMPID=$!
trap 'kill $VMPID 2>/dev/null' EXIT

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_RUNS="$RUNS" SPARK_DRIVER_MEM="$MEM" \
  tools/run.sh graft.Bench \
  > "$OUT/bench_stdout.log" 2> "$OUT/bench_stderr.log"
RC=$?
kill $VMPID 2>/dev/null

cp target/bench_full.json "$OUT/bench_full.json" 2>/dev/null
grep -E "BENCH_RUN_(START|END)|BENCH_POISON" "$OUT/bench_stderr.log" || true
echo "bench rc=$RC; artifacts in $OUT"
exit $RC
