#!/bin/bash
# Direct-java launcher for graft mains (bypasses sbt — one JVM, no sbt
# server contention). Usage: tools/run_main.sh graft.tools.SweepOnce 32 1000000
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN=$1; shift
exec env MALLOC_ARENA_MAX=4 java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-56g}" -XX:+UseParallelGC \
  $SPARK_GRAFT_JVM_EXTRA \
  -cp "$CP" "$MAIN" "$@"
