#!/bin/bash
# Same-box A/B bench runner (round-18): run graft.Bench in dev mode (explicit
# keys) from an arbitrary CLASSES dir, so base (worktree) and new (repo) builds
# interleave in the same window. Usage:
#   tools/ab_bench.sh <classesDir> <sfDir> <key...>
# Env: SPARK_DRIVER_MEM (default 48g), SPARK_GRAFT_CPUS (default 32).
# Prints the bench's full JSON line (dev mode) on stdout.
set -e
CLASSES=$1; SF=$2; shift 2
SNAP=$(mktemp -d /tmp/graft_ab_XXXX)
trap "rm -rf $SNAP" EXIT
cp -r "$CLASSES" "$SNAP/classes"
CP="$SNAP/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-1} \
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-48g} -cp "$CP" graft.Bench "$@"
