#!/bin/bash
# Pair D: the N -> 4N criterion pair at production batch shape.
# 2 vs 8 cores (pinned, true N-CPU hosts), 64M events in 2 micro-batches
# of 32M — at 10^10-event scale batches are large, so the per-batch serial
# floor (~12.5 s: planning, state commit coordination, snapshot IO) is
# amortized by work, not measured as if it were per-event cost. Equal
# 28 GiB heap at both levels because dedup state (~10 GB at 32M keys) is
# cluster-total: a 2-core cluster holds the same state bytes as an 8-core
# one. GC threads follow cores (JVM ergonomics on a real N-core host).
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r3.jsonl}
SAMPLES=${SAMPLES:-3}

for s in $(seq 1 "$SAMPLES"); do
  for cpus in 2 8; do
    echo "=== D-2v8-64M s=$s cpus=$cpus $(date +%T) ===" >&2
    SPARK_DRIVER_MEM=28g \
    JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
    taskset -c 0-$(( cpus - 1 )) \
    scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs 640000 \
      --events-per-conv 100 --work "$WORK" \
      --state-partitions $(( 3 * cpus )) --shuffle $(( 3 * cpus )) \
      2>/dev/null | grep '^{"bench"' \
      | sed "s/^{/{\"tag\":\"D-2v8-64M\",\"pinned\":1,\"sample\":$s,/" \
      | tee -a "$OUT"
  done
done
echo "pairD done $(date +%T)" >&2
