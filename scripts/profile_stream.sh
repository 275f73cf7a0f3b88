#!/bin/bash
# Sample the micro-batch thread of a running ScalingBench with jstack to
# attribute the per-batch serial floor (driver-side time that doesn't
# consume task slots). Run DURING a bench; prints a frame histogram.
#   scripts/profile_stream.sh <seconds> [interval]
set -uo pipefail
DUR=${1:-60}
IVL=${2:-1}
OUT=${OUT:-/tmp/stream-profile.txt}
: > "$OUT"
END=$(( $(date +%s) + DUR ))
while [ "$(date +%s)" -lt "$END" ]; do
  PID=$(pgrep -f "graft.ScalingBench" | head -1 || true)
  [ -z "$PID" ] && { sleep 1; continue; }
  jstack "$PID" 2>/dev/null | awk '
    /"stream execution thread|"spark-listener|"MicroBatchExecution/ {inblk=1; name=$0; depth=0; next}
    inblk && /^\s*at / {depth++; if (depth<=6) print name "|" $2}
    inblk && /^$/ {inblk=0}
  ' >> "$OUT"
  sleep "$IVL"
done
echo "== top frames on the stream-execution thread =="
grep 'stream execution' "$OUT" | cut -d'|' -f2 | sort | uniq -c | sort -rn | head -40
