#!/bin/bash
# Round-4 scaling evidence (north rule: throughput at N vs 4N cores,
# efficiency >= 0.8), with the round-3 ADVICE finding fixed: state-store
# partition count is now a CONSTANT across levels (24 = 3x the 4N level) —
# a real N->4N resize cannot change it (Spark locks it into the checkpoint)
# — instead of the 3*cpus round-3 pairs used. Apply shuffle partitions
# still track the level (that IS resizable per batch).
#
#   pair I (the criterion pair): 2 vs 8 pinned cores, 32M events
#     (2 x 16M batches), dedup ON with the interval-compressed state.
#   pair H (A/B + the ADVICE re-run): same shape, dedup ON with the hash
#     state (dropDuplicatesWithinWatermark) at the SAME fixed partitions.
#   pair O (anchor): same shape, dedup OFF — the round-3 apply-stage
#     baseline re-measured under the fixed-partition config.
#
# Both levels get the same absolute heap (state is cluster-total, round-3
# methodology), GC threads proportional to cores, taskset pinning.
# >=2 interleaved samples per level. One JSON line per run.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r4.jsonl}
SP=${SP:-24}

run() { # run <tag> <heap> <cpus> <extra...>
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

# unpinned 32-core run first: generates the 32M-event input at full
# parallelism (a pinned 2-core generation would waste an hour) and anchors
# the single-VM ceiling for context
run GEN-32-interval 28g 32

for s in 1 2; do
  run I-2v8-interval 14g 2
  run I-2v8-interval 14g 8
done
for s in 1 2; do
  run H-2v8-hash 14g 2 --dedup-impl hash
  run H-2v8-hash 14g 8 --dedup-impl hash
done
run O-2v8-nodedup 14g 2 --no-dedup
run O-2v8-nodedup 14g 8 --no-dedup
echo "r4 scaling done $(date +%T)" >&2
