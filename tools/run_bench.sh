#!/bin/bash
# Run graft.Bench outside sbt (classes must already be compiled by sbt).
# Usage: tools/run_bench.sh <sf-dir> <out-json> [query names...]
# With query names, only those queries are benched (no probes/composed).
set -euo pipefail
SF_DIR="$1"; OUT="$2"; shift 2
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_OUT="$OUT" \
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" graft.Bench "$@"
