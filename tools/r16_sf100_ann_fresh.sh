#!/usr/bin/env bash
# Round-16 follow-up: FRESH-BUILD reproduction of the sf100 ANN serving
# numbers. The committed BENCH_sf100_ann_r16 figures came from MIGRATING
# the r12 fragmented stores (Maintain --compact-ivf) + the ADC kernel;
# after the host reset the corpus was regenerated deterministically and
# the stores no longer exist — so this run proves the NEW versioned
# coalescing write paths produce the good layout NATIVELY: build sq8/pq/
# float stores from scratch at sf100 (first serve builds via AnnServing's
# getOrBuild), then the same focused bench + recall floors.
set -uo pipefail
cd "$(dirname "$0")/.."
sf100=/root/repo/data/sf100
CLS=${CLS:-/tmp/graft_cls_r16}
SERVE=/tmp/graft-serve-r12sf100

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
      echo "[r16fresh] DISK WATCHDOG: ${free_kb}KB free - killing $1"
      kill -9 $jpid; sleep 2; rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null; break
    fi
    sleep 10
  done
  wait $jpid
}
step() { echo "[r16fresh] $* $(date -u +%H:%M:%S)"; }

step "focused ANN bench (2 reps; builds sq8/pq stores on first serve)"
GRAFT_SERVE_ROOT=$SERVE \
SPARK_GRAFT_SF_DIR=$sf100 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf100_ann_fresh.json \
SPARK_GRAFT_BENCH_ONLY=knn_ivf,knn_ivf_sq8,knn_ivf_pq \
  jrun 80g graft.Bench > /tmp/r16_bench_sf100_fresh.out 2>&1
step "bench rc=$?"
cat /tmp/bench_sf100_ann_fresh.json 2>/dev/null

step "store shapes (parquet file counts per store)"
for d in "$SERVE"/*/; do
  echo "  $d: $(find "$d" -name '*.parquet' | wc -l) parquet files"
done

step "recall floors at sf100 (fresh-built stores)"
GRAFT_SERVE_ROOT=$SERVE SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=ann_recall_report \
  jrun 80g graft.Verify "$sf100" /tmp/verify_sf100_ann_fresh \
  > /tmp/r16_recall_sf100_fresh.out 2>&1
step "verify rc=$?"
python3 tools/check_ann_floors.py /tmp/verify_sf100_ann_fresh sf100 \
  && step "floors GREEN" || step "floors RED"
step "fresh-build campaign done"
