#!/bin/bash
# Pair F: the APPLY STAGE at N vs 4N cores (the stage the north star's
# >=0.8 criterion names). Trusted-transport mode (dedup OFF — provably
# safe for lsn-ordered transports: idempotent LWW + the per-event
# lsn > endLsn filter absorb redelivery, PipelineSpec), 32M events in
# 2 micro-batches, pinned true-N-CPU levels, equal heap.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r3.jsonl}
SAMPLES=${SAMPLES:-2}
for s in $(seq 1 "$SAMPLES"); do
  for cpus in 2 8; do
    echo "=== F-2v8-32M-apply s=$s cpus=$cpus $(date +%T) ===" >&2
    SPARK_DRIVER_MEM=14g \
    JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
    taskset -c 0-$(( cpus - 1 )) \
    scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs 320000 \
      --events-per-conv 100 --work "$WORK" \
      --state-partitions $(( 3 * cpus )) --shuffle $(( 3 * cpus )) \
      --no-dedup 2>/dev/null | grep '^{"bench"' \
      | sed "s/^{/{\"tag\":\"F-2v8-32M-apply\",\"pinned\":1,\"sample\":$s,/" \
      | tee -a "$OUT"
  done
done
echo "pairF done $(date +%T)" >&2
