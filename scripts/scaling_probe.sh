#!/bin/bash
# Round-3 exploratory probe for the dedup-ON scaling gap: 16M events,
# dedup ON, several (cpus, state-partitions, files-per-trigger) configs,
# levels interleaved to spread host noise. Appends JSON lines to $OUT.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
CONVS=${CONVS:-160000}
EPC=${EPC:-100}
OUT=${OUT:-SCALING_probe.jsonl}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-28g}
# Pin GC threads equal at every level: otherwise ParallelGC sizes its own
# thread pool from the machine's 32 cores and competes with task threads
# differently per level.
export JAVA_EXTRA=${JAVA_EXTRA:--XX:+UseParallelGC -XX:ParallelGCThreads=8}

run() { # run <tag> <cpus> <extra args...>
  local tag="$1"; shift
  local cpus="$1"; shift
  echo "=== $tag cpus=$cpus $* $(date +%T) ===" >&2
  scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs "$CONVS" \
    --events-per-conv "$EPC" --work "$WORK" "$@" 2>/dev/null \
    | grep '^{"bench"' | sed "s/^{/{\"tag\":\"$tag\",/" | tee -a "$OUT"
}

# A: round-2 shape (state partitions follow cpus) — the baseline to beat
run A-coupled 8  --state-partitions 24 --shuffle 24
run A-coupled 32 --state-partitions 96 --shuffle 96
# B: state partitions fixed at 96 for both levels (deployment-realistic)
run B-fixed96 8  --state-partitions 96
run B-fixed96 32 --state-partitions 96
# C: smaller batches (fpt=4 -> 8 batches): watermark advances more often,
# state map stays ~1/4 the size
run C-fpt4 8  --state-partitions 96 --files-per-trigger 4
run C-fpt4 32 --state-partitions 96 --files-per-trigger 4
# D: the 4 -> 16 pair (leaves GC/OS headroom at the top level)
run D-4v16 4  --state-partitions 96
run D-4v16 16 --state-partitions 96
echo "probe done $(date +%T)" >&2
