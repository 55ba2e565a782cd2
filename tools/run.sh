#!/bin/bash
# Launch a graft tool main (graft.tools.*, graft.Bench, graft.Verify)
# directly on the compiled classes + /opt/spark/jars, without the sbt
# build lock — lets fixture generation / probes run while sbt test
# holds the project lock. Mirrors build.sbt's JDK-17 module options.
set -euo pipefail
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
# -Xms pinned to -Xmx: an un-pinned heap lets G1 uncommit regions
# after full GCs (including the bench harness's inter-query reap) and
# re-fault them on the next heavy query — measured as 30-50% SYSTEM
# CPU (kernel page faults) and 2-4x erratic graph-family times at sf1.
exec java $OPENS "-Xms${SPARK_DRIVER_MEM:-48g}" "-Xmx${SPARK_DRIVER_MEM:-48g}" -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
