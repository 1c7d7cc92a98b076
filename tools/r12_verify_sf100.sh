#!/usr/bin/env bash
# sf100 strict-verify, one QUERY per JVM: the single-JVM subset run
# (r12_sf100.sh) accumulated every query's shuffle/sort spill under one
# blockmgr dir and blew through the host's ~45 GB free (the watchdog
# killed it at 4.7 GB free mid-query-5). One JVM per query bounds the
# footprint to that query's own spill — the shuffle dirs are reclaimed
# at JVM exit — and a query whose spill alone exceeds the host budget
# is killed + recorded as HOST-DISK-BOUND (documented in SCALE.md),
# without sinking the rest of the sweep. The oracle compare then runs
# per-name off the shared outdir with the full oracle_sql.json copied
# from an sf0.01 dump (the SQL is SF-independent).
set -uo pipefail
cd "$(dirname "$0")/.."
sf100=/root/repo/data/sf100
CLS=/tmp/graft_cls_r12
OUT=/tmp/verify_sf100
export GRAFT_SERVE_ROOT=/tmp/graft-serve-r12sf100

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

VLIST="q1_agg q3_shipping q5_local_supplier q6_forecast_revenue q12_ship_lag q14_promo q18_big_orders q21_waiting_orders raw_station latest_per_key timeseries_bucket rollup_events top_k_per_group_fast events_sessionize_native events_dow_hour ingest_pipeline dedup_exact span_dedup token_count lang_id gopher_quality text_stats doc_fingerprint seq_pack data_mix epoch_shuffle embed_quantize knn_bruteforce dedup_embedding_lsh ann_recall_report ivf_cell_stats knn_ivf knn_ivf_pq knn_ivf_sq8 knn_lsh"

mkdir -p "$OUT"
: > /tmp/r12_verify_status.txt
for q in $VLIST; do
  if ls "$OUT/$q"/*.parquet >/dev/null 2>&1; then
    echo "$q SKIP(done)" >> /tmp/r12_verify_status.txt
    continue
  fi
  echo "[r12v] $q start $(date -u +%H:%M:%S)"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    java $ADD_OPENS -Xmx80g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$CLS:/opt/spark/jars/*" graft.Verify "$sf100" "$OUT" \
      > "/tmp/r12v_$q.out" 2>&1 &
  jpid=$!
  killed=0
  while kill -0 $jpid 2>/dev/null; do
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt 8000000 ]; then
      echo "[r12v] DISK WATCHDOG: ${free_kb}KB free — killing $q"
      kill -9 $jpid; killed=1
      sleep 3
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid; rc=$?
  if [ $killed -eq 1 ]; then
    echo "$q DISK_BOUND" >> /tmp/r12_verify_status.txt
    rm -rf "$OUT/$q"
  elif [ $rc -ne 0 ] || ! ls "$OUT/$q"/*.parquet >/dev/null 2>&1; then
    echo "$q FAIL rc=$rc" >> /tmp/r12_verify_status.txt
    tail -3 "/tmp/r12v_$q.out"
  else
    echo "$q ok" >> /tmp/r12_verify_status.txt
    rm -f "/tmp/r12v_$q.out"
  fi
done
echo "[r12v] sweep done $(date -u +%H:%M:%S)"
cat /tmp/r12_verify_status.txt
