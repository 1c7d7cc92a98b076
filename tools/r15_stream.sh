#!/usr/bin/env bash
# Round-15 streaming evidence (r14 verdict items 2 + 3):
#
#   - continuous ANN serving at sf100, finally: StreamBench now serves
#     the PERSISTED 1024-cell layout (hardlink-cloned from the
#     stamp-keyed ServingLayouts home) instead of rebuilding a
#     2 M-vector KMeans inside the bench JVM — the defect that wedged
#     the r14 run for 2.5 h with no artifact;
#   - the serving-latency slope gets an owner: the bench now emits
#     per-batch stage attribution (stamp poll / index load /
#     probe+score+write) AND per-execution index scan metrics
#     (rows/files/partitions), at the geometry-derived probe width,
#     over the statically-pruned serving path.
#
# One JVM per SF (spill reclaimed at exit), frozen class snapshot,
# 8 GB-free disk watchdog. The sf100 phase reuses the r12 campaign's
# serve root; staleness is impossible by construction (ServingLayouts
# keys the home to the corpus content stamp — a changed corpus resolves
# to a DIFFERENT home and the bench builds fresh, recorded in
# index_reused).
set -uo pipefail
cd "$(dirname "$0")/.."
CLS=/tmp/graft_cls_r15

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

MIN_FREE_KB=8000000

jrun() {
  local mem="$1"; shift
  java $ADD_OPENS "-Xmx$mem" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt "$MIN_FREE_KB" ]; then
      echo "[r15stream] DISK WATCHDOG: ${free_kb}KB free — killing $1"
      kill -9 $jpid
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}

step() { echo "[r15stream] $* $(date -u +%H:%M:%S)"; }

step "stream bench sf1 (all workloads, 20 batches)"
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf1_r15.json \
  jrun 24g graft.StreamBench /root/repo/data/sf1 20 > /tmp/r15_stream_sf1.out 2>&1
step "sf1 done rc=$?"
cat /tmp/stream_sf1_r15.json 2>/dev/null || tail -5 /tmp/r15_stream_sf1.out

step "stream bench sf10 (all workloads, 20 batches)"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf10_r15.json \
  jrun 48g graft.StreamBench /root/repo/data/sf10 20 > /tmp/r15_stream_sf10.out 2>&1
step "sf10 done rc=$?"
cat /tmp/stream_sf10_r15.json 2>/dev/null || tail -5 /tmp/r15_stream_sf10.out

step "ANN serving at sf100 (ingest + query drain over the persisted 1024-cell layout)"
GRAFT_SERVE_ROOT=/tmp/graft-serve-r12sf100 \
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf100_r15.json \
SPARK_GRAFT_STREAM_WORKLOADS=embedding,query \
  jrun 80g graft.StreamBench /root/repo/data/sf100 20 > /tmp/r15_stream_sf100.out 2>&1
step "sf100 done rc=$?"
cat /tmp/stream_sf100_r15.json 2>/dev/null || tail -5 /tmp/r15_stream_sf100.out

step "chain done"
