#!/bin/bash
# Run a graft main directly on the compiled classes (no sbt lock): same JVM
# flags as build.sbt's fork settings. Usage: run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) and the main's own env vars.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
# newest 2.13 scala-library in the cache (sort -V so 2.13.17 beats 2.13.9)
SCALA_LIB=$(find "$HOME"/.cache/coursier -name 'scala-library-2.13*.jar' 2>/dev/null | sort -V | tail -1)
CP="$REPO_ROOT/target/scala-2.13/classes:/opt/spark/jars/*:$SCALA_LIB"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8 \
  -Dstdout.encoding=UTF-8 -Dstderr.encoding=UTF-8 \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -Xms"${SPARK_DRIVER_MEM_MIN:-2g}" \
  -cp "$CP" "$@"
