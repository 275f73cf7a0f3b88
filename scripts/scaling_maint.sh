#!/bin/bash
# Round-5 maintenance-tax measurement: same 8-core criterion shape as
# scaling_r5b.sh but 4 batches (fpt=8) so inline maintenance fires 3x
# with --maintenance-every 1. ON/OFF interleaved, host otherwise quiet.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r5_maint.jsonl}
SP=${SP:-24}

run() {
  local tag="$1"; shift 1
  echo "=== $tag $(date +%T) ===" >&2
  SPARK_DRIVER_MEM=14g \
  JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=8" \
  taskset -c 0-7 \
  scripts/run.sh graft.ScalingBench --cpus 8 --convs 320000 \
    --events-per-conv 100 --work "$WORK" --files-per-trigger 8 \
    --state-partitions "$SP" --shuffle 24 "$@" \
    2>/dev/null | grep '^{"bench"' \
    | sed "s/^{/{\"tag\":\"$tag\",\"pinned\":1,/" | tee -a "$OUT"
}

for s in 1 2; do
  run maintOFF-8
  run maintON-8 --maintenance-every 1
done
echo "maint scaling done $(date +%T)" >&2
