#!/bin/bash
# Run a graft main class outside sbt (no project lock — lets probes run
# while sbt compiles). Mirrors build.sbt's fork JVM options exactly.
# usage: tools/run-graft.sh <mainClass> [args...]
# env: SPARK_DRIVER_MEM (default 8g) + the SPARK_GRAFT_* knobs the mains read.
set -euo pipefail
CLASSES=/root/repo/target/scala-2.13/classes
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Reaper-proof scratch (mirrors build.sbt): /tmp gets reaped mid-run on this
# host; pin the JVM temp root + Spark local dir inside the repo.
SCRATCH="${SPARK_GRAFT_SCRATCH:-/root/repo/target/scratch}/tmp"
mkdir -p "$SCRATCH"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Djava.io.tmpdir="$SCRATCH" -Dspark.local.dir="$SCRATCH" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
