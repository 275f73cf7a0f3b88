#!/bin/bash
# Round-6 scaling evidence. Identical pinned 2v8 methodology to rounds 4-5
# (fixed state partitions across levels, same absolute heap, GC threads
# proportional to cores, interleaved samples, warmup ON), re-run on this
# round's build so the criterion is evidenced against HEAD, plus:
#
#   SHIFT20 (task 6, measured not extrapolated): byte-stride WALs
#     (--lsn-stride 64) at the DEFAULT shift 14 vs --dedup-impl interval:20
#     (2^20 lsns per 128 KiB bitmap bucket). Same 8M events, same stride:
#     the per-batch progress entries record stateMemMB for both, and the
#     content hash must match between the two runs (shift changes state
#     layout, never output). BENCH.md previously EXTRAPOLATED ~1.9 GB per
#     10^12-byte window at shift 20 — this records it.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
OUT=${OUT:-SCALING_r6.jsonl}
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
# parallelism and anchors the single-VM ceiling
run GEN-32-interval 28g 32

for s in 1 2 3; do
  run I6-2v8-warm 14g 2
  run I6-2v8-warm 14g 8
done

# shift sizing A/B at byte stride (8M events): state size is the metric,
# content hash must be identical across the two shifts
run SHIFT20-s14 14g 8 --convs 80000 --lsn-stride 64
run SHIFT20-s20 14g 8 --convs 80000 --lsn-stride 64 --dedup-impl interval:20
echo "r6 scaling done $(date +%T)" >&2
