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
# The pin + AlwaysPreTouch commits the whole heap at JVM launch, so it
# only applies when SPARK_DRIVER_MEM is explicitly set (bench runs);
# otherwise a lazy-commit 48g -Xmx keeps casual tool launches cheap on
# boxes without 48 GB free.
if [ -n "${SPARK_DRIVER_MEM:-}" ]; then
  HEAP="-Xms${SPARK_DRIVER_MEM} -Xmx${SPARK_DRIVER_MEM} -XX:+AlwaysPreTouch"
else
  HEAP="-Xmx48g"
fi
exec java $OPENS $HEAP \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
