#!/usr/bin/env bash
# sf100 strict-oracle phase, one NAME at a time under the disk
# watchdog: DuckDB's temp spill for the 600M-row joins is the same
# host-disk wall the engine sweep hit, so each oracle runs alone, its
# temp dir reclaimed after, and a name whose oracle alone exceeds the
# host budget is recorded ORACLE-HOST-BOUND (the engine row for it
# still stands at the largest SF its oracle fit — sf10, 111/111).
# ANN/serving rows (knn_*, ann_recall_report, ivf_cell_stats) are
# rows-only by declaration; dedup_embedding_lsh is gated by the
# subset+soundness checker instead (SCALE.md §2's sf1+ rule).
set -uo pipefail
cd "$(dirname "$0")/.."
sf100=/root/repo/data/sf100
OUT=/tmp/verify_sf100
# The four giant-OUTPUT rows (timeseries_bucket 50M rows,
# events_sessionize_native, ingest_pipeline ~100M, span_dedup 5M-doc
# text) are excluded: the CHECKER's driver-faithful pandas canon is the
# wall there (55% of host RAM and ~40 min on the first alone), not
# DuckDB and not the engine — they stay strict-checked at sf10
# (CORRECTNESS_sf10_r11: 111/111) and engine-run-clean at sf100.
NAMES="rollup_events top_k_per_group_fast events_dow_hour dedup_exact token_count lang_id gopher_quality text_stats doc_fingerprint seq_pack data_mix epoch_shuffle embed_quantize knn_bruteforce"

# full oracle-SQL map from an sf0.01 dump (SQL is SF-independent; the
# checker resolves tables against $sf100). FORCED copy: each per-query
# Verify JVM in the sweep dumps the map FILTERED to its own
# SPARK_GRAFT_ONLY, so whatever the last sweep JVM left here is a
# one-entry (or empty) map.
cp /tmp/verify_out/oracle_sql.json "$OUT/oracle_sql.json"

: > /tmp/r12_oracle_status.txt
for n in $NAMES; do
  if ! ls "$OUT/$n"/*.parquet >/dev/null 2>&1; then
    echo "$n NO_ENGINE_OUTPUT" >> /tmp/r12_oracle_status.txt
    continue
  fi
  echo "[r12o] $n start $(date -u +%H:%M:%S)"
  rm -rf /tmp/duckdb_oracle_tmp
  ORACLE_MEM=40GB ORACLE_THREADS=4 ORACLE_ONLY="$n" \
    python3 tools/check_oracle.py "$sf100" "$OUT" > "/tmp/r12o_$n.out" 2>&1 &
  opid=$!
  killed=0
  while kill -0 $opid 2>/dev/null; do
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt 8000000 ]; then
      echo "[r12o] DISK WATCHDOG: ${free_kb}KB free — killing oracle $n"
      kill -9 $opid; killed=1
      sleep 2; rm -rf /tmp/duckdb_oracle_tmp
      break
    fi
    sleep 10
  done
  wait $opid; rc=$?
  if [ $killed -eq 1 ]; then
    echo "$n ORACLE_HOST_BOUND" >> /tmp/r12_oracle_status.txt
  elif grep -q "^ok " "/tmp/r12o_$n.out"; then
    echo "$n ok" >> /tmp/r12_oracle_status.txt
  else
    echo "$n FAIL" >> /tmp/r12_oracle_status.txt
    grep "^FAIL" "/tmp/r12o_$n.out" | head -2
  fi
done
rm -rf /tmp/duckdb_oracle_tmp
echo "[r12o] oracle phase done $(date -u +%H:%M:%S)"
cat /tmp/r12_oracle_status.txt
