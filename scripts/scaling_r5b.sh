#!/bin/bash
# Round-5 extra criterion samples (tag I5b): post-write-stats build,
# warmup ON, same methodology as scaling_r5.sh pair I5. Run with the host
# otherwise QUIET (sample 1 of pair I5 was contaminated by concurrent
# builds and is excluded from medians — noted in BENCH.md).
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r5.jsonl}
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

for s in 1 2 3; do
  run I5b-2v8-stats 14g 2
  run I5b-2v8-stats 14g 8
done
echo "r5b scaling done $(date +%T)" >&2
