#!/usr/bin/env bash
# Third scale decade (r11 verdict item 1): bench + strict-oracle subset
# + ANN floors + LSH candidate-load at sf100 (x1000 of sf0.1: lineitem
# 600M, events 100M, documents 5M, embeddings 2M; 17 GB parquet,
# synthesized by graft.ScaleGen at the end of r11), then the sf1
# ivf_pq seed-stability study (verdict item 4).
#
# Runs every JVM step via `java -cp` off a SNAPSHOT of the compiled
# classes (tools/snapshot_classes.sh) so sbt stays free for concurrent
# test work — two sbt invocations in this repo must never overlap.
#
# Query subset rationale mirrors tools/r8_sf10.sh: the headliners cover
# every operator family whose cost is a function of the ENGINE; the
# dedup ops whose candidates grow with the synthetic corpus's shingle
# saturation stay excluded (their load RATIOS are measured separately
# by graft.LshStats, which is the invariant that must hold ~1 across
# decades). The oracle subset is every headliner family DuckDB can
# check at 600M rows within this host's 4-thread/40GB/disk envelope.
set -uo pipefail
cd "$(dirname "$0")/.."
sf100=/root/repo/data/sf100
sf1=/root/repo/data/sf1
CLS=/tmp/graft_cls_r12
export GRAFT_SERVE_ROOT=/tmp/graft-serve-r12sf100

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

jrun() { # jrun <heap> <mainClass> [args...] — disk-watchdogged: the
  # first sf100 bench attempt filled / with shuffle+sort spill (the
  # pre-fix encodePq cross-product); any JVM step that drives free
  # space under 8 GB is killed rather than wedging the host.
  local mem="$1"; shift
  java $ADD_OPENS "-Xmx$mem" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb
    free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt 8000000 ]; then
      echo "[r12sf100] DISK WATCHDOG: ${free_kb}KB free — killing $1"
      kill -9 $jpid
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 10
  done
  wait $jpid
}

step() { echo "[r12sf100] $* $(date -u +%H:%M:%S)"; }

HEADLINERS=raw_station,latest_per_key,timeseries_bucket,q1_agg,q3_shipping,q5_local_supplier,q18_big_orders,q21_waiting_orders,events_sessionize_native,rollup_events,top_k_per_group_fast,ingest_pipeline,dedup_exact,span_dedup,knn_ivf,knn_ivf_pq,knn_ivf_sq8,seq_pack,data_mix,epoch_shuffle,token_count,gopher_quality,lang_id

# Oracle-checkable breadth at sf100 = the headliners + the cheap
# documents/embeddings ops that round out each family; ann/knn/serving
# rows land for the floors check and timing only.
VLIST=q1_agg,q3_shipping,q5_local_supplier,q6_forecast_revenue,q12_ship_lag,q14_promo,q18_big_orders,q21_waiting_orders,raw_station,latest_per_key,timeseries_bucket,rollup_events,top_k_per_group_fast,events_sessionize_native,events_dow_hour,ingest_pipeline,dedup_exact,span_dedup,token_count,lang_id,gopher_quality,text_stats,doc_fingerprint,seq_pack,data_mix,epoch_shuffle,embed_quantize,knn_bruteforce,dedup_embedding_lsh,ann_recall_report,ivf_cell_stats,knn_ivf,knn_ivf_pq,knn_ivf_sq8,knn_lsh

step "bench start (quiet-machine window; reps=2 min-of)"
SPARK_GRAFT_SF_DIR="$sf100" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf100.json \
SPARK_GRAFT_BENCH_ONLY="$HEADLINERS" \
  jrun 80g graft.Bench > /tmp/r12_bench_sf100.out 2>&1
rc=$?
step "bench done rc=$rc"
[ $rc -ne 0 ] && tail -5 /tmp/r12_bench_sf100.out

step "verify subset start"
rm -rf /tmp/verify_sf100
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$VLIST" \
  jrun 80g graft.Verify "$sf100" /tmp/verify_sf100 > /tmp/r12_verify_sf100.out 2>&1
rc=$?
step "verify done rc=$rc"
grep "\[verify\]" /tmp/r12_verify_sf100.out | head -20 || true

step "strict oracle start (4 threads, 40GB, disk watchdog)"
ORACLE_MEM=40GB ORACLE_THREADS=4 ORACLE_SKIP=dedup_embedding_lsh \
  python3 tools/check_oracle.py "$sf100" /tmp/verify_sf100 \
  > /tmp/r12_oracle_sf100.out 2>&1 &
opid=$!
while kill -0 $opid 2>/dev/null; do
  free_kb=$(df / | tail -1 | awk '{print $4}')
  if [ "$free_kb" -lt 8000000 ]; then
    echo "[r12sf100] DISK WATCHDOG: ${free_kb}KB free — killing oracle"
    kill -9 $opid; rm -rf /tmp/duckdb_oracle_tmp; break
  fi
  sleep 15
done
wait $opid; orc=$?
step "oracle done rc=$orc"
tail -6 /tmp/r12_oracle_sf100.out

step "ann floors at sf100"
python3 tools/check_ann_floors.py /tmp/verify_sf100 sf100 || echo "[r12sf100] ANN FLOORS RED"

step "dedup_embedding_lsh soundness at sf100"
python3 - /tmp/verify_sf100 "$sf100" <<'EOF' || echo "[r12sf100] LSH SOUNDNESS RED"
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

step "lshstats sf100 (candidate-load ratios)"
SPARK_GRAFT_CPUS=32 jrun 64g graft.LshStats "$sf100" /tmp/lshstats_sf100.json \
  > /tmp/r12_lshstats_sf100.out 2>&1
step "lshstats done rc=$?"
cat /tmp/lshstats_sf100.json 2>/dev/null || tail -5 /tmp/r12_lshstats_sf100.out

step "anntune grid at sf1 (verdict item 4 context)"
SPARK_GRAFT_CPUS=16 GRAFT_SERVE_ROOT=/tmp/graft-serve-r12tune \
  jrun 24g graft.AnnTune "$sf1" 250 > /tmp/r12_anntune_sf1.out 2>&1
step "anntune done rc=$?"
grep TUNE /tmp/r12_anntune_sf1.out || true

step "ivf_pq seed stability at sf1 (5 fresh-build seeds)"
: > /tmp/r12_seedstab.out
for s in 42 101 202 303 404; do
  GRAFT_KMEANS_SEED=$s GRAFT_SERVE_ROOT=/tmp/graft-seedstab-$s SPARK_GRAFT_CPUS=16 \
    jrun 24g graft.SeedCheck "$sf1" 100 >> /tmp/r12_seedstab.out 2>&1
  rm -rf /tmp/graft-seedstab-$s
done
grep seed_recall /tmp/r12_seedstab.out || tail -5 /tmp/r12_seedstab.out

step "chain done"
