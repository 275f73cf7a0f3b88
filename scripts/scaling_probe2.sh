#!/bin/bash
# Probe 2: cluster-faithful resource scaling. A real N -> 4N executor
# resize multiplies heap, GC threads and memory channels by 4; a single
# JVM does not. So each level gets heap and ParallelGC threads
# PROPORTIONAL to its core count (what per-executor JVMs would have), and
# levels run interleaved x3 to beat the 3x host noise. GC logs land in
# /tmp/gc-<cpus>-<sample>.log for pause-time attribution.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
CONVS=${CONVS:-160000}
EPC=${EPC:-100}
OUT=${OUT:-SCALING_probe2.jsonl}
LEVELS=${LEVELS:-"8 32"}
SAMPLES=${SAMPLES:-3}
FPT=${FPT:-16}

for s in $(seq 1 "$SAMPLES"); do
  for cpus in $LEVELS; do
    heap=$(( cpus * 7 / 8 ))g   # 7 GiB per 8 cores, like a real executor
    echo "=== probe2 s=$s cpus=$cpus heap=$heap $(date +%T) ===" >&2
    SPARK_DRIVER_MEM=$heap \
    JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus -Xlog:gc:/tmp/gc-$cpus-$s.log" \
    scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs "$CONVS" \
      --events-per-conv "$EPC" --work "$WORK" \
      --state-partitions $(( 3 * cpus )) --shuffle $(( 3 * cpus )) \
      --files-per-trigger "$FPT" 2>/dev/null \
      | grep '^{"bench"' | sed "s/^{/{\"sample\":$s,/" | tee -a "$OUT"
  done
done
echo "probe2 done $(date +%T)" >&2
