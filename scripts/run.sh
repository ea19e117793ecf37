#!/usr/bin/env bash
# Direct-JVM runner for graft mains (quieter + faster than `sbt runMain`
# once `sbt compile` has produced target/scala-2.13/classes).
#   scripts/run.sh graft.Verify /root/testdata/sf0.01 /tmp/out
# Env: SPARK_GRAFT_ONLY, SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
  -cp "$CP" "$@" 2>/tmp/graft_run_stderr.log
