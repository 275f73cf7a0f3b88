#!/bin/bash
# Run a graft main class directly against the compiled classes + Spark jars,
# bypassing sbt startup (and sbt's project lock). Mirrors build.sbt's
# JDK-17 module options.
#   scripts/run.sh graft.CdcRunner --work /tmp/x --fresh
set -euo pipefail
cd "$(dirname "$0")/.."
CLASS="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# Throughput GC by default: G1's concurrent cycles cost ~2.6x wall on this
# allocation-heavy workload (measured in BENCH.md); override via JAVA_EXTRA.
exec java $OPENS ${JAVA_EXTRA:--XX:+UseParallelGC} \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLASS" "$@"
