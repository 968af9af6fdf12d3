#!/bin/bash
# Launch a graft main against compiled classes with the exact JVM options
# build.sbt gives forked runs (JDK-17 add-opens, 1g code cache, the
# GCLockerRetryAllocationCount=64 fix from the r14 sf10 probe). Used for
# scale drills/benches where sbt's own JVM + lock would get in the way.
#
# Usage: SPARK_DRIVER_MEM=48g tools/scale_run.sh graft.Bench [args...]
set -euo pipefail
MEM="${SPARK_DRIVER_MEM:-8g}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  -Xmx"$MEM" -XX:ReservedCodeCacheSize=1g \
  -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $OPENS "$@"
