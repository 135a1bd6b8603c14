#!/bin/bash
# Run a graft main directly against compiled classes (no sbt lock): mirrors
# build.sbt's forked-JVM flags. usage: scripts/run_main.sh <MainClass> [args...]
set -u
MEM=${SPARK_DRIVER_MEM:-8g}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx$MEM \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
