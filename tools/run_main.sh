#!/bin/bash
# Run a graft main without sbt (no build-lock contention with interactive
# sbt). Usage: tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS (default 32)
set -e
MAIN=$1; shift
# snapshot the classes dir: a concurrent `sbt compile` replacing class
# files under a RUNNING JVM throws NoClassDefFoundError on any anonfun
# not yet loaded (bit the round-14 sf10 dump three times)
SNAP=$(mktemp -d /tmp/graft_classes_XXXX)
trap "rm -rf $SNAP" EXIT
cp -r /root/repo/target/scala-2.13/classes "$SNAP/classes"
CP="$SNAP/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$MAIN" "$@"
