#!/bin/bash
# Sequential scaling matrix: identical 64M-event input, local[8] vs
# local[32], RocksDB state store (default). Appends one JSON line per run
# to SCALING_r2.jsonl. Work dirs + spark.local.dir on tmpfs so the single
# virtio disk doesn't add 2x variance (BENCH.md).
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/dev/shm/graft-scaling}
CONVS=${CONVS:-640000}
EPC=${EPC:-100}
OUT=${OUT:-SCALING_r2.jsonl}
export SPARK_DRIVER_MEM=28g
for cpus in "$@"; do
  extra=""
  case "$cpus" in
    *:hdfs) cpus="${cpus%%:*}"; extra="--hdfs-state" ;;
  esac
  echo "=== cpus=$cpus $extra $(date +%T) ===" >&2
  scripts/run.sh graft.ScalingBench --cpus "$cpus" --convs "$CONVS" \
    --events-per-conv "$EPC" --work "$WORK" $extra 2>/dev/null \
    | grep '^{"bench"' | tee -a "$OUT"
done
