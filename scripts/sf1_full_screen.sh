#!/usr/bin/env bash
# Full-surface sf1 screen (r13 extension of verdict item #4): stage the 10x
# FK-consistent sf1 replica, dump EVERY SparkEntry query there, then run the
# per-query-subprocess three-way DuckDB screen over the whole surface — the
# headline-tier sf1 proof widened to all queries. Runs off a FROZEN class
# directory (arg 3) so a concurrent sbt compile in the working tree cannot
# swap class files under the long-running JVMs.
#
# Usage: sf1_full_screen.sh <round> [timeout_s] [classes_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?round number}"
TIMEOUT="${2:-300}"
CLASSES="${3:-target/scala-2.13/classes}"
SF1=/tmp/graft-sf1-full
VOUT=/tmp/sf1_full_vout

ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
  sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)
# network/heartbeat timeouts raised: this run shares the host with the
# interactive session's sbt JVMs, and a 2-3 min CPU-starvation or GC pause
# under local mode otherwise gets the driver-executor declared dead
# (HeartbeatReceiver 120s default) — which killed the first attempt.
JAVA_FLAGS="$ADD_OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Dfile.encoding=UTF-8 \
  -Dsun.jnu.encoding=UTF-8 -Dspark.network.timeout=600s \
  -Xmx${SPARK_DRIVER_MEM:-24g}"
CP="/opt/spark/jars/*:$CLASSES"

if [ -f "$SF1/lineitem.parquet" ] && [ "${FORCE_STAGE:-0}" != "1" ]; then
  echo "== sf1_full 1/3 stage SKIPPED ($SF1 already staged; FORCE_STAGE=1 to redo)"
else
  echo "== sf1_full 1/3 stage $SF1"
  rm -rf "$SF1"
  # shellcheck disable=SC2086
  java $JAVA_FLAGS -cp "$CP" graft.tools.StageSf1 /root/testdata/sf0.1 "$SF1" 10
fi

echo "== sf1_full 2/3 Verify (full surface) @ sf1"
rm -rf "$VOUT"
# shellcheck disable=SC2086
java $JAVA_FLAGS -cp "$CP" graft.Verify "$SF1" "$VOUT"

echo "== sf1_full 3/3 per-query subprocess screen (timeout ${TIMEOUT}s)"
# a separate artifact name: the headline-tier CORRECTNESS_sf1_rN.json stays
# as committed; this is the widened full-surface result
python3 scripts/sf_screen.py "$SF1" "$VOUT" \
  "CORRECTNESS_sf1_full_r${ROUND}.json" "$TIMEOUT"
echo "== sf1_full done -> CORRECTNESS_sf1_full_r${ROUND}.json"
