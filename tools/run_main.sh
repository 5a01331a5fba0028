#!/usr/bin/env bash
# Dev-only runner: launch a graft main from the sbt-compiled classes
# without paying sbt startup (and without contending for sbt's build
# locks). Mirrors build.sbt's javaOptions exactly — same --add-opens
# set, UTC session tz, UI off, SPARK_DRIVER_MEM-sized heap.
#
#   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.Bench
#
# Recompile first (sbt -batch compile) if sources changed; this runs
# whatever is in target/scala-2.13/classes.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
