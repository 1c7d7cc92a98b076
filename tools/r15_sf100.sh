#!/usr/bin/env bash
# Round-15 sf100 correctness increment (r14 verdict item 4):
#
#   Promote knn_bruteforce's sf100 oracle from checker-host-bound to
#   STRICT. Root cause of the old OOM: the oracle recomputed the
#   cosine inside the window's ORDER BY, so DuckDB dragged both
#   256-double arrays through the window materialization (~80 GB at
#   2 M × 10 pairs). The reshaped SQL computes cos_sim once in an
#   inner subquery — the window sees scalars only (~0.5 GB) and the
#   single-shot chunked compare passes under 24 GB. ORACLE_SLICE
#   (per-query_id strict slices + residual guard) remains in
#   check_oracle.py as the fallback for oracles that cannot be
#   reshaped; note a wrapped `WHERE query_id = v` does NOT push below
#   a DuckDB window, so slicing alone would not have bounded the old
#   shape either.
#
# Also fixes the r14 advisor's oracle-staleness hole: a refused
# (restricted) oracle_sql.json now ABORTS the oracle phase with an
# ORACLE_SQL_STALE marker in the status file, instead of silently
# gating HEAD outputs against whatever stale dump a prior round left.
#
# Single-host discipline (see r12_sf100.sh): frozen class snapshot,
# one heavy JVM at a time, 8 GB-free disk watchdog.
set -uo pipefail
cd "$(dirname "$0")/.."
sf100=/root/repo/data/sf100
CLS=/tmp/graft_cls_r15
OUT=/tmp/verify_sf100
STATUS=/tmp/r15_oracle_status.txt
export GRAFT_SCRATCH=/tmp/graft-scratch-r15

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
      echo "[r15sf100] DISK WATCHDOG: ${free_kb}KB free - killing $1"
      kill -9 $jpid
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* "$GRAFT_SCRATCH" 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}

step() { echo "[r15sf100] $* $(date -u +%H:%M:%S)"; }
: > "$STATUS"

# ---- phase 1: fresh HEAD engine output for knn_bruteforce ----
rm -rf "$OUT/knn_bruteforce"
mkdir -p "$GRAFT_SCRATCH"
step "verify knn_bruteforce start"
t0=$(date +%s)
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=knn_bruteforce \
  jrun 64g graft.Verify "$sf100" "$OUT" > /tmp/r15v_knn_bruteforce.out 2>&1
rc=$?
t1=$(date +%s)
if [ $rc -ne 0 ] || ! ls "$OUT/knn_bruteforce"/*.parquet >/dev/null 2>&1; then
  echo "knn_bruteforce ENGINE_FAIL rc=$rc wall=$((t1-t0))s" >> "$STATUS"
  tail -4 /tmp/r15v_knn_bruteforce.out
  cat "$STATUS"
  exit 1
fi
echo "knn_bruteforce engine ok wall=$((t1-t0))s" >> "$STATUS"

# ---- phase 2: oracle dump freshness ----
# Phase 1's Verify (SPARK_GRAFT_ONLY=knn_bruteforce) just wrote a
# RESTRICTED oracle_sql.json containing exactly the HEAD SQL for the
# one name phase 3 compares — that is the freshest possible dump for
# this campaign, so it is used AS IS. (An earlier revision copied a
# prior full dump over it, which re-introduced the staleness hole the
# r14 advisor flagged: a pre-reshape knn_bruteforce SQL would OOM
# DuckDB again and report ORACLE_HOST_BOUND.) Abort with a marker only
# if the dump somehow lacks the name under test.
if ! python3 -c "import json,sys; sys.exit(0 if 'knn_bruteforce' in json.load(open('$OUT/oracle_sql.json')) else 1)" 2>/dev/null; then
  echo "ORACLE_SQL_STALE dump lacks knn_bruteforce - aborting oracle phase" >> "$STATUS"
  cat "$STATUS"
  exit 1
fi

# ---- phase 3: single-shot chunked strict compare (scalar-window SQL) ----
step "chunked oracle knn_bruteforce start"
rm -rf /tmp/duckdb_oracle_tmp
t0=$(date +%s)
ORACLE_MEM=24GB ORACLE_THREADS=8 ORACLE_ONLY=knn_bruteforce ORACLE_CHUNKED=1 \
  python3 tools/check_oracle.py "$sf100" "$OUT" > /tmp/r15o_knn_bruteforce.out 2>&1 &
opid=$!
killed=0
while kill -0 $opid 2>/dev/null; do
  free_kb=$(df / | tail -1 | awk '{print $4}')
  if [ "$free_kb" -lt $MIN_FREE_KB ]; then
    echo "[r15sf100] DISK WATCHDOG: ${free_kb}KB free - killing oracle"
    kill -9 $opid; killed=1
    sleep 2; rm -rf /tmp/duckdb_oracle_tmp
    break
  fi
  sleep 10
done
wait $opid
t1=$(date +%s)
if [ $killed -eq 1 ]; then
  echo "knn_bruteforce ORACLE_HOST_BOUND wall=$((t1-t0))s" >> "$STATUS"
elif grep -q "^ok " /tmp/r15o_knn_bruteforce.out; then
  echo "knn_bruteforce oracle STRICT ok $(grep '^ok ' /tmp/r15o_knn_bruteforce.out) wall=$((t1-t0))s" >> "$STATUS"
else
  echo "knn_bruteforce oracle FAIL wall=$((t1-t0))s" >> "$STATUS"
  grep "^FAIL" /tmp/r15o_knn_bruteforce.out | head -2
fi
rm -rf /tmp/duckdb_oracle_tmp
step "done"
cat "$STATUS"
