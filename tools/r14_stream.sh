#!/usr/bin/env bash
# Round-14 streaming evidence (r13 verdict items 4 + 5):
#
#   - stage-attributed streaming bench at sf1 AND sf10 (per-stage
#     gate/append/report p50/p99 — the plumbing landed in r11/r12,
#     numbers never committed);
#   - continuous ANN serving at sf100: embedding ingest appending into
#     the stored 2 M-vector index (derived geometry, 1024 cells) and a
#     query drain over it, with the stamp-poll reload count recorded
#     (quiescent drain must reload exactly once).
#
# One JVM per SF (spill reclaimed at exit), frozen class snapshot,
# 8 GB-free disk watchdog.
set -uo pipefail
cd "$(dirname "$0")/.."
CLS=/tmp/graft_cls_r14c

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
      echo "[r14stream] DISK WATCHDOG: ${free_kb}KB free — killing $1"
      kill -9 $jpid
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}

step() { echo "[r14stream] $* $(date -u +%H:%M:%S)"; }

step "stream bench sf1 (all workloads, 20 batches)"
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf1_r14.json \
  jrun 24g graft.StreamBench /root/repo/data/sf1 20 > /tmp/r14_stream_sf1.out 2>&1
step "sf1 done rc=$?"
cat /tmp/stream_sf1_r14.json 2>/dev/null || tail -5 /tmp/r14_stream_sf1.out

step "stream bench sf10 (all workloads, 20 batches)"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf10_r14.json \
  jrun 48g graft.StreamBench /root/repo/data/sf10 20 > /tmp/r14_stream_sf10.out 2>&1
step "sf10 done rc=$?"
cat /tmp/stream_sf10_r14.json 2>/dev/null || tail -5 /tmp/r14_stream_sf10.out

step "ANN serving at sf100 (embedding ingest + query drain over the 1024-cell index)"
# share the bench campaign's serve root so the query drain serves the
# SAME stored 2 M-vector layout instead of rebuilding a second copy
GRAFT_SERVE_ROOT=/tmp/graft-serve-r12sf100 \
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf100_r14.json \
SPARK_GRAFT_STREAM_WORKLOADS=embedding,query \
  jrun 80g graft.StreamBench /root/repo/data/sf100 20 > /tmp/r14_stream_sf100.out 2>&1
step "sf100 done rc=$?"
cat /tmp/stream_sf100_r14.json 2>/dev/null || tail -5 /tmp/r14_stream_sf100.out

step "chain done"
