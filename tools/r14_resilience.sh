#!/usr/bin/env bash
# Round-14 resilience at REAL volume (r13 verdict item 7; gates were
# previously run at sf0.01/sf1 only): executor SIGKILL mid-query and
# spill-under-pressure against the sf10 tables (lineitem 60 M,
# events 10 M, docs 500 k). Runs off the frozen class snapshot — NOT
# sbt runMain (two sbt invocations must never overlap, and these park
# for tens of minutes).
set -uo pipefail
cd "$(dirname "$0")/.."
CLS=/tmp/graft_cls_r14c
sf10=/root/repo/data/sf10

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

jrun() {
  local mem="$1"; shift
  java $ADD_OPENS "-Xmx$mem" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt 8000000 ]; then
      echo "[r14resil] DISK WATCHDOG: ${free_kb}KB free — killing $1"
      kill -9 $jpid
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}

step() { echo "[r14resil] $* $(date -u +%H:%M:%S)"; }

export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"

step "FaultCheck at sf10 (executor SIGKILL mid-query, 8 GB executors)"
SPARK_GRAFT_FAULT_OUT=/tmp/fault_sf10_r14.json \
SPARK_GRAFT_CLUSTER_MASTER="local-cluster[2,8,8192]" SPARK_GRAFT_CPUS=8 \
  jrun 16g graft.FaultCheck "$sf10" > /tmp/r14_fault_sf10.out 2>&1
step "FaultCheck done rc=$?"
cat /tmp/fault_sf10_r14.json 2>/dev/null || tail -8 /tmp/r14_fault_sf10.out

step "PressureCheck at sf10 (constrained executors — must SPILL, not fail)"
SPARK_GRAFT_PRESSURE_OUT=/tmp/pressure_sf10_r14.json \
SPARK_GRAFT_PRESSURE_MASTER="local-cluster[2,4,2048]" \
  jrun 16g graft.PressureCheck "$sf10" > /tmp/r14_pressure_sf10.out 2>&1
step "PressureCheck done rc=$?"
cat /tmp/pressure_sf10_r14.json 2>/dev/null || tail -8 /tmp/r14_pressure_sf10.out

step "chain done"
