#!/bin/bash
# Probe 4: CPU-pinned levels. local[N] caps task slots but the JVM's other
# threads (GC, JIT, netty, shuffle IO, state maintenance) still run on all
# 32 host cores — inflating the small level's throughput vs a real N-core
# executor host. taskset -c 0..N-1 makes level N an honest N-CPU machine.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
CONVS=${CONVS:-160000}
EPC=${EPC:-100}
OUT=${OUT:-SCALING_probe4.jsonl}
SAMPLES=${SAMPLES:-2}
EXTRA=${EXTRA:-}

for s in $(seq 1 "$SAMPLES"); do
  for cpus in 8 32; do
    heap=$(( cpus * 7 / 8 ))g
    echo "=== probe4 s=$s cpus=$cpus pinned heap=$heap $(date +%T) ===" >&2
    SPARK_DRIVER_MEM=$heap \
    JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
    taskset -c 0-$(( cpus - 1 )) \
    scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs "$CONVS" \
      --events-per-conv "$EPC" --work "$WORK" \
      --state-partitions $(( 3 * cpus )) --shuffle $(( 3 * cpus )) $EXTRA \
      2>/dev/null | grep '^{"bench"' | sed "s/^{/{\"sample\":$s,\"pinned\":true,/" \
      | tee -a "$OUT"
  done
done
echo "probe4 done $(date +%T)" >&2
