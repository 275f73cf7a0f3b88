#!/bin/bash
# Pair E: the N -> 4N criterion pair at the largest batch shape a 2-core
# node can genuinely run with in-heap state. 32M events in 2 micro-batches
# of 16M (~5 GB dedup state): big enough to amortize the per-batch serial
# floor, small enough that 2 GC threads can service the live set (the 64M
# variant put the 2-core level at 50% of wall in GC — reported in
# BENCH.md, config abandoned as unrepresentative). Equal 14 GiB heap both
# levels (state is cluster-total); GC threads = cores; pinned.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r3.jsonl}
SAMPLES=${SAMPLES:-2}
for s in $(seq 1 "$SAMPLES"); do
  for cpus in 2 8; do
    echo "=== E-2v8-32M s=$s cpus=$cpus $(date +%T) ===" >&2
    SPARK_DRIVER_MEM=14g \
    JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
    taskset -c 0-$(( cpus - 1 )) \
    scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs 320000 \
      --events-per-conv 100 --work "$WORK" \
      --state-partitions $(( 3 * cpus )) --shuffle $(( 3 * cpus )) \
      2>/dev/null | grep '^{"bench"' \
      | sed "s/^{/{\"tag\":\"E-2v8-32M\",\"pinned\":1,\"sample\":$s,/" \
      | tee -a "$OUT"
  done
done
echo "pairE done $(date +%T)" >&2
