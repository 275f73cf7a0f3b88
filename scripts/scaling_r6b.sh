#!/bin/bash
# Round-6 scaling continuation: 6 more pinned 2v8 pairs appended to
# SCALING_r6.jsonl (same methodology as scripts/scaling_r6.sh — fixed
# state partitions, same absolute heap, GC threads proportional to cores,
# interleaved samples, warmup ON). The first 3 pairs landed in a noisy
# window (2-core walls fell monotonically 285->253->223 s across samples);
# 9 total pairs gives the same sample size round 5 used for its medians.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r6.jsonl}
SP=${SP:-24}

run() {
  local tag="$1" heap="$2" cpus="$3"; shift 3
  echo "=== $tag heap=$heap cpus=$cpus $(date +%T) ===" >&2
  SPARK_DRIVER_MEM=$heap \
  JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
  taskset -c 0-$(( cpus - 1 )) \
  scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs 320000 \
    --events-per-conv 100 --work "$WORK" --files-per-trigger 16 \
    --state-partitions "$SP" --shuffle $(( 3 * cpus )) "$@" \
    2>/dev/null | grep '^{"bench"' \
    | sed "s/^{/{\"tag\":\"$tag\",\"pinned\":1,/" | tee -a "$OUT"
}

for s in 4 5 6 7 8 9; do
  run I6-2v8-warm 14g 2
  run I6-2v8-warm 14g 8
done
echo "r6b scaling done $(date +%T)" >&2
