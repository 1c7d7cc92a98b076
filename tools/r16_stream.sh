#!/usr/bin/env bash
# Round-16 streaming campaign (r15 verdict items 2-4):
#
#   - the ingest redelivery guard is now the monotone HIGH-WATER MARK
#     (one filter vs the layout's stamped hwm, zero stored-id scan —
#     the r15 anti-join read 3.0M id-rows / 7.6k files per 100k-row
#     batch at sf100): `embedding_ingest_guard_scan` must show per-batch
#     scan mass ~0, not corpus-sized;
#   - ingest AUTO-COMPACTS on the files-per-cell signal (generation-flip
#     rewrite, pinned readers survive one cycle): `index_files_after_
#     ingest` must stay bounded without a manual Maintain step;
#   - the query drain reports COLD and WARM separately
#     (GRAFT_BENCH_DROP_CACHES=1 drops the page cache between ingest
#     and the first drain — r15's p50 swung 5.4-11.8s purely with cache
#     state, uncomparable across rounds).
#
# sf10 runs all three workloads; sf100 runs embedding+query (the
# corpus-ingest funnel is measured at sf10 where its doc volume fits).
set -uo pipefail
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_cls_r16}
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
    -Dspark.sql.session.timeZone=UTC -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb; free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt "$MIN_FREE_KB" ]; then
      echo "[r16stream] DISK WATCHDOG: ${free_kb}KB free - killing $1"
      kill -9 $jpid; sleep 2; rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null; break
    fi
    sleep 10
  done
  wait $jpid
}
step() { echo "[r16stream] $* $(date -u +%H:%M:%S)"; }

step "stream bench sf1 (all workloads, 20 batches, cache-conditioned)"
SPARK_GRAFT_CPUS=16 GRAFT_BENCH_DROP_CACHES=1 \
SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf1_r16.json \
  jrun 24g graft.StreamBench /root/repo/data/sf1 20 > /tmp/r16_stream_sf1.out 2>&1
step "sf1 done rc=$?"

step "stream bench sf10 (all workloads, 20 batches, cache-conditioned)"
SPARK_GRAFT_CPUS=32 GRAFT_BENCH_DROP_CACHES=1 \
SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf10_r16.json \
  jrun 48g graft.StreamBench /root/repo/data/sf10 20 > /tmp/r16_stream_sf10.out 2>&1
step "sf10 done rc=$?"
step "ANN serving at sf100 (embedding+query, cache-conditioned)"
GRAFT_SERVE_ROOT=/tmp/graft-serve-r12sf100 SPARK_GRAFT_CPUS=32 \
GRAFT_BENCH_DROP_CACHES=1 \
SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf100_r16.json SPARK_GRAFT_STREAM_WORKLOADS=embedding,query \
  jrun 80g graft.StreamBench /root/repo/data/sf100 20 > /tmp/r16_stream_sf100.out 2>&1
step "sf100 done rc=$?"
step "chain done"
