#!/usr/bin/env bash
# Round-14 sf100 EVIDENCE campaign (r13 verdict items 1, 2, 6, 8):
#
#   1. Re-run the sf100 bench on HEAD — BENCH_sf100.json on record is
#      pre-AQE-fix (q18 256 s vs the fix's claimed ~54 s, two rounds
#      stale).
#   2. Run dedup_embedding_lsh at sf100 (2 M vectors): the row that was
#      DISK_BOUND in CORRECTNESS_sf100_r12 must COMPLETE under the
#      r13 sliced exact-verify, with slice count and peak disk recorded.
#   3. Promote the four giant-output rows (timeseries_bucket,
#      events_sessionize_native, ingest_pipeline, span_dedup) from
#      checker_host_bound to STRICT via the chunked canonicalizer
#      (check_oracle.py ORACLE_CHUNKED=1): fresh HEAD engine outputs,
#      then streaming compare.
#   4. Re-measure the LSH candidate load (graft.LshStats) at the
#      (clamp-audited) sf100 geometry.
#
# Single-host discipline (see r12_sf100.sh): every JVM runs off a
# frozen class snapshot (sbt stays free), one heavy JVM at a time, an
# 8 GB-free disk watchdog around every heavy step. Engine outputs from
# the r12 sweep at /tmp/verify_sf100 are reused for rows whose
# operators are bit-identical since r12; everything this round's code
# touched is re-run fresh.
set -uo pipefail
cd "$(dirname "$0")/.."
sf100=/root/repo/data/sf100
CLS=/tmp/graft_cls_r14
OUT=/tmp/verify_sf100
export GRAFT_SERVE_ROOT=/tmp/graft-serve-r12sf100
export GRAFT_SCRATCH=/tmp/graft-scratch-r14

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

MIN_FREE_KB=8000000
PEAK_FILE=/tmp/r14_min_free_kb.txt

jrun() { # jrun <heap> <mainClass> [args...] — watchdogged JVM; also
  # records the minimum free-disk seen (the campaign's peak-usage stat).
  local mem="$1"; shift
  java $ADD_OPENS "-Xmx$mem" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ -f "$PEAK_FILE" ]; then
      local cur; cur=$(cat "$PEAK_FILE")
      [ "$free_kb" -lt "$cur" ] && echo "$free_kb" > "$PEAK_FILE"
    else
      echo "$free_kb" > "$PEAK_FILE"
    fi
    if [ "$free_kb" -lt "$MIN_FREE_KB" ]; then
      echo "[r14sf100] DISK WATCHDOG: ${free_kb}KB free — killing $1"
      kill -9 $jpid
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* "$GRAFT_SCRATCH" 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}

step() { echo "[r14sf100] $* $(date -u +%H:%M:%S)"; }

HEADLINERS=raw_station,latest_per_key,timeseries_bucket,q1_agg,q3_shipping,q5_local_supplier,q18_big_orders,q21_waiting_orders,events_sessionize_native,rollup_events,top_k_per_group_fast,ingest_pipeline,dedup_exact,span_dedup,knn_ivf,knn_ivf_pq,knn_ivf_sq8,seq_pack,data_mix,epoch_shuffle,token_count,gopher_quality,lang_id

# ---- phase 1: bench on HEAD (verdict item 1) ----
step "bench start (reps=2 min-of)"
SPARK_GRAFT_SF_DIR="$sf100" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf100_r14.json \
SPARK_GRAFT_BENCH_ONLY="$HEADLINERS" \
  jrun 80g graft.Bench > /tmp/r14_bench_sf100.out 2>&1
rc=$?
step "bench done rc=$rc"
[ $rc -ne 0 ] && tail -5 /tmp/r14_bench_sf100.out

# ---- phase 2: fresh HEAD engine outputs, one query per JVM ----
# dedup_embedding_lsh: the sliced-verify row (was DISK_BOUND in r12).
# The 4 giant-output rows: re-run so the chunked strict check gates
# HEAD outputs, not r12 leftovers.
RERUN="dedup_embedding_lsh timeseries_bucket events_sessionize_native ingest_pipeline span_dedup"
: > /tmp/r14_verify_status.txt
for q in $RERUN; do
  rm -rf "$OUT/$q"
  rm -rf "$GRAFT_SCRATCH"; mkdir -p "$GRAFT_SCRATCH"
  step "verify $q start"
  t0=$(date +%s)
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    jrun 80g graft.Verify "$sf100" "$OUT" > "/tmp/r14v_$q.out" 2>&1
  rc=$?
  t1=$(date +%s)
  if [ $rc -ne 0 ] || ! ls "$OUT/$q"/*.parquet >/dev/null 2>&1; then
    echo "$q FAIL rc=$rc wall=$((t1-t0))s" >> /tmp/r14_verify_status.txt
    tail -4 "/tmp/r14v_$q.out"
    rm -rf "$OUT/$q"
  else
    echo "$q ok wall=$((t1-t0))s" >> /tmp/r14_verify_status.txt
  fi
  grep "sliced exact-verify" "/tmp/r14v_$q.out" | tail -3 || true
done
step "verify phase done"
cat /tmp/r14_verify_status.txt

# ---- phase 3: oracle — chunked strict for the giant-output rows ----
# Guard: a dev-loop Verify run with SPARK_GRAFT_ONLY leaves a
# RESTRICTED oracle_sql.json behind, and the chunked checks then fail
# vacuously ("0 ok, 0 fail") for every name it lacks — r14 lost one
# oracle pass to exactly this. Only accept a full dump.
nsql=$(python3 -c "import json,sys; print(len(json.load(open('/tmp/verify_out/oracle_sql.json'))))" 2>/dev/null || echo 0)
if [ "$nsql" -ge 100 ]; then
  cp /tmp/verify_out/oracle_sql.json "$OUT/oracle_sql.json"
else
  echo "[r14sf100] /tmp/verify_out/oracle_sql.json has $nsql entries (<100) — refusing the restricted dump; run a full graft.Verify first"
fi
: > /tmp/r14_oracle_status.txt
for n in timeseries_bucket events_sessionize_native ingest_pipeline span_dedup; do
  if ! ls "$OUT/$n"/*.parquet >/dev/null 2>&1; then
    echo "$n NO_ENGINE_OUTPUT" >> /tmp/r14_oracle_status.txt
    continue
  fi
  step "chunked oracle $n start"
  rm -rf /tmp/duckdb_oracle_tmp
  t0=$(date +%s)
  ORACLE_MEM=40GB ORACLE_THREADS=4 ORACLE_CHUNKED=1 ORACLE_ONLY="$n" \
    python3 tools/check_oracle.py "$sf100" "$OUT" > "/tmp/r14o_$n.out" 2>&1 &
  opid=$!
  killed=0
  while kill -0 $opid 2>/dev/null; do
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt $MIN_FREE_KB ]; then
      echo "[r14sf100] DISK WATCHDOG: ${free_kb}KB free — killing oracle $n"
      kill -9 $opid; killed=1
      sleep 2; rm -rf /tmp/duckdb_oracle_tmp
      break
    fi
    sleep 10
  done
  wait $opid; rc=$?
  t1=$(date +%s)
  if [ $killed -eq 1 ]; then
    echo "$n ORACLE_HOST_BOUND wall=$((t1-t0))s" >> /tmp/r14_oracle_status.txt
  elif grep -q "^ok " "/tmp/r14o_$n.out"; then
    echo "$n ok wall=$((t1-t0))s" >> /tmp/r14_oracle_status.txt
  else
    echo "$n FAIL wall=$((t1-t0))s" >> /tmp/r14_oracle_status.txt
    grep "^FAIL" "/tmp/r14o_$n.out" | head -2
  fi
done
rm -rf /tmp/duckdb_oracle_tmp
step "oracle phase done"
cat /tmp/r14_oracle_status.txt

# ---- phase 4: dedup_embedding_lsh soundness at sf100 ----
step "lsh soundness"
python3 - "$OUT" "$sf100" <<'EOF' > /tmp/r14_lsh_soundness.out 2>&1 || echo "[r14sf100] LSH SOUNDNESS RED"
import sys, glob, duckdb
out, sf = sys.argv[1], sys.argv[2]
files = glob.glob(f"{out}/dedup_embedding_lsh/*.parquet")
assert files, "no dedup_embedding_lsh output"
emb = f"{sf}/embeddings.parquet"
if glob.glob(emb + "/*.parquet"): emb = emb + "/*.parquet"
con = duckdb.connect()
con.execute("SET memory_limit='24GB'; SET threads=4; PRAGMA temp_directory='/tmp/duckdb_oracle_tmp'")
bad, n = con.execute(f"""
  WITH p AS (SELECT a_id, b_id, cos_sim FROM read_parquet({files!r})),
  e AS (SELECT vec_id, embedding FROM '{emb}'),
  j AS (SELECT p.a_id, p.b_id, p.cos_sim,
          list_dot_product(ea.embedding, eb.embedding) /
          (sqrt(list_dot_product(ea.embedding, ea.embedding)) *
           sqrt(list_dot_product(eb.embedding, eb.embedding))) AS true_cos
        FROM p JOIN e ea ON ea.vec_id = p.a_id JOIN e eb ON eb.vec_id = p.b_id)
  SELECT sum(CASE WHEN true_cos < 0.45 - 1e-9 OR abs(true_cos - cos_sim) > 5e-4
                  THEN 1 ELSE 0 END), count(*) FROM j""").fetchone()
print(f"  {n} emitted pairs, {bad or 0} soundness violations")
assert not bad, f"{bad} pairs below threshold or mis-scored"
EOF
cat /tmp/r14_lsh_soundness.out

# ---- phase 5: LSH candidate-load re-measure ----
step "lshstats sf100"
rm -rf "$GRAFT_SCRATCH"; mkdir -p "$GRAFT_SCRATCH"
# occupancy mode measures the candidate mass with one groupBy — WITHOUT
# it LshStats runs the full operators (pair joins included) and the
# hyperplane verify alone is a ~12-slice campaign of its own (r14: the
# modeless invocation was watchdog-killed; occupancy mode finished in
# ~8 min)
GRAFT_LSHSTATS_MODE=occupancy \
SPARK_GRAFT_CPUS=32 jrun 64g graft.LshStats "$sf100" /tmp/lshstats_sf100_r14.json \
  > /tmp/r14_lshstats.out 2>&1
step "lshstats done rc=$?"
cat /tmp/lshstats_sf100_r14.json 2>/dev/null || tail -5 /tmp/r14_lshstats.out

step "chain done (min free disk: $(cat $PEAK_FILE 2>/dev/null || echo n/a) KB)"
