#!/usr/bin/env bash
# Round-16 sf100 ANN campaign (r15 verdict items 1 + 3):
#
#   The sf100 SQ8/PQ serving stores still carried their r12 FLAT
#   fragmented layouts (46,165 / 22,076 sliver files) — the compressed
#   serving forms measured 4-10x SLOWER than uncompressed float IVF at
#   sf100, inverted from their design point, and nothing could compact
#   a flat layout atomically. r16 versionized both stores (same
#   v<NNNNNNNN>/atomic-rename lifecycle as float IVF); `Maintain
#   --compact-ivf` now migrates a fragmented legacy flat home by
#   republishing its rows coalesced as v1 (no model refit) and
#   reclaiming the superseded flat dirs.
#
# Steps: hardlink-backup the stores, Maintain --compact-ivf (the
# migration), focused ANN bench (knn_ivf / knn_ivf_sq8 / knn_ivf_pq),
# recall floors from ann_recall_report.
#
# Single-host discipline (see r12_sf100.sh): frozen class snapshot,
# one heavy JVM at a time, 8 GB-free disk watchdog.
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
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt "$MIN_FREE_KB" ]; then
      echo "[r16ann] DISK WATCHDOG: ${free_kb}KB free - killing $1"
      kill -9 $jpid; sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}
step() { echo "[r16ann] $* $(date -u +%H:%M:%S)"; }

# 0. hardlink backup: migration DELETES the legacy flat dirs; parquet
# files are immutable so links are a free undo lever for this run only
if [ ! -d "$SERVE.bak.r16" ]; then
  step "hardlink backup of the serving stores"
  cp -al "$SERVE" "$SERVE.bak.r16"
fi

step "maintain --compact-ivf (migrates sq8/pq legacy flat -> versioned v1)"
GRAFT_SERVE_ROOT=$SERVE SPARK_GRAFT_CPUS=32 \
  jrun 64g graft.Maintain "$sf100" --compact-ivf \
  > /tmp/r16_maintain_sf100.out 2>&1
step "maintain rc=$? -> $(tail -1 /tmp/r16_maintain_sf100.out)"

step "post-migration store shape"
for d in "$SERVE"/*/; do
  echo "  $d: $(find "$d" -name '*.parquet' | wc -l) parquet files"
done

step "focused ANN bench (2 reps)"
GRAFT_SERVE_ROOT=$SERVE \
SPARK_GRAFT_SF_DIR=$sf100 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf100_ann_r16.json \
SPARK_GRAFT_BENCH_ONLY=knn_ivf,knn_ivf_sq8,knn_ivf_pq \
  jrun 80g graft.Bench > /tmp/r16_bench_sf100_ann.out 2>&1
step "bench rc=$?"
cat /tmp/bench_sf100_ann_r16.json 2>/dev/null

step "recall floors at sf100 (served from the migrated stores)"
GRAFT_SERVE_ROOT=$SERVE SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=ann_recall_report \
  jrun 80g graft.Verify "$sf100" /tmp/verify_sf100_ann_r16 \
  > /tmp/r16_recall_sf100.out 2>&1
step "verify rc=$?"
python3 tools/check_ann_floors.py /tmp/verify_sf100_ann_r16 sf100 \
  && step "floors GREEN" || step "floors RED"
step "campaign done"
