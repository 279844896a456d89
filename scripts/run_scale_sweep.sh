#!/bin/bash
# Launch the full 128x scale sweep (graft.ScaleSweep) with the same JVM
# the sbt fork uses, plus the marathon-session code-cache fix.
#
#   scripts/run_scale_sweep.sh [mult] [capSec] [q1,q2,...]
#
# Writes /tmp/graft_scale_sweep_<mult>.json; log to stdout (redirect it).
#
# -XX:ReservedCodeCacheSize=512m is load-bearing: a ~150-query marathon
# generates thousands of codegen classes, and at the default 240m the
# code-cache sweeper flushes warm methods — a single-invocation OSR'd
# stage loop then runs INTERPRETED for a whole task wave. Measured on
# q88 at 128x: 7 s JIT'd / 317 s marathon transient / 1521 s with
# generated classes force-excluded from JIT (graft.OverlapJitProbe).
set -euo pipefail
cd "$(dirname "$0")/.."
MULT="${1:-128}"
CAP="${2:-900}"
SUBSET="${3:-}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
JOPTS=(
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false
  -Dspark.sql.session.timeZone=UTC
  -Xmx8g
  -XX:ReservedCodeCacheSize=512m
)
exec java "${JOPTS[@]}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ScaleSweep "$MULT" "$CAP" ${SUBSET:+"$SUBSET"}
