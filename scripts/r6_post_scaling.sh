#!/bin/bash
# Round-6 post-scaling measurements, run sequentially in the quiet window
# after scripts/scaling_r6b.sh finishes:
#  1) task 5: cdc_decimal_ledger k=3 A/B, HEAD vs round-4 commit 8e7cf35
#     (worktree /tmp/graft-r4, same host, same hour, SPARK_GRAFT_BENCH_ONLY)
#  2) adaptive-container A/B: re-run the stride-64 shift 14/20 pair on the
#     round-6 sparse/dense container — state should collapse to the dense
#     floor at BOTH shifts, content hash unchanged vs SHIFT20-* tags
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== decimal ledger A/B $(date +%T) ===" >&2
for side in HEAD R4; do
  dir=$([ $side = HEAD ] && echo /root/repo || echo /tmp/graft-r4)
  ( cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_BENCH_K=3 SPARK_GRAFT_BENCH_ONLY=cdc_decimal_ledger \
      scripts/run.sh graft.Bench 2>/dev/null | grep '^{"metric"' \
      | sed "s/^{/{\"side\":\"$side\",/" )
done | tee DECIMAL_AB_r6.jsonl

WORK=/dev/shm/graft-scaling
run() {
  local tag="$1" cpus="$2"; shift 2
  SPARK_DRIVER_MEM=14g \
  JAVA_EXTRA="-XX:+UseParallelGC -XX:ParallelGCThreads=$cpus" \
  taskset -c 0-$(( cpus - 1 )) \
  scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs 80000 \
    --events-per-conv 100 --work "$WORK" --files-per-trigger 16 \
    --state-partitions 24 --shuffle $(( 3 * cpus )) --lsn-stride 64 "$@" \
    2>/dev/null | grep '^{"bench"' \
    | sed "s/^{/{\"tag\":\"$tag\",\"pinned\":1,/" | tee -a SCALING_r6.jsonl
}
echo "=== adaptive container stride-64 A/B $(date +%T) ===" >&2
run ADAPT-s14 8
run ADAPT-s20 8 --dedup-impl interval:20
echo "r6 post-scaling done $(date +%T)" >&2
