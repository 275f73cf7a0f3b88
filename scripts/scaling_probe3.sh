#!/bin/bash
# Probe 3: locate the wall. (a) dedup-OFF pairs at proportional resources —
# if those scale, the stateful dedup stage is the non-scaler; if they are
# flat too, the box saturates below 8 threads for this dataflow.
# (b) a 2-core dedup-ON point — if 2 cores matches 8/32-core wall, the
# limit is serial; if it is ~4x slower, saturation sits between 2 and 8.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
CONVS=${CONVS:-160000}
EPC=${EPC:-100}
OUT=${OUT:-SCALING_probe3.jsonl}

run() { # run <tag> <cpus> <extra...>
  local tag="$1"; shift
  local cpus="$1"; shift
  local heap=$(( cpus * 7 / 8 )); [ "$heap" -lt 4 ] && heap=4
  echo "=== probe3 $tag cpus=$cpus heap=${heap}g $(date +%T) ===" >&2
  SPARK_DRIVER_MEM=${heap}g \
  JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
  scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs "$CONVS" \
    --events-per-conv "$EPC" --work "$WORK" \
    --state-partitions $(( 3 * cpus )) --shuffle $(( 3 * cpus )) "$@" \
    2>/dev/null | grep '^{"bench"' | sed "s/^{/{\"tag\":\"$tag\",/" \
    | tee -a "$OUT"
}

run nodedup 8  --no-dedup
run nodedup 32 --no-dedup
run nodedup 8  --no-dedup
run nodedup 32 --no-dedup
run dedup-2core 2
echo "probe3 done $(date +%T)" >&2
