#!/usr/bin/env bash
# Re-run of the sf1 main bench after the long-running-driver fixes
# (periodic-GC + status-store retention caps in Bench), then the sf10
# headline bench. dedup_semantic measured 2.2 s at sf1 (cluster-bounded,
# scales) so it rejoins the main set; the two declared quadratic oracle
# baselines stay out (timed reps=1 in bench_sf1_quad.json).
set -euo pipefail
cd /root/repo

echo "[r8b] bench-sf1 start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_main.json \
SPARK_GRAFT_BENCH_SKIP=dedup_ngram_jaccard,dedup_embedding \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[r8b] bench-sf1 done $(date -u +%H:%M:%S)"

echo "[r8b] bench-sf10 start $(date -u +%H:%M:%S)"
# sf10 headliner set — MUST stay aligned with tools/r8_sf10.sh (the
# documented artifact): the signature-collision dedup family is
# excluded at sf10 as a generator artifact per SCALE.md §4.
HEADLINERS=raw_station,latest_per_key,timeseries_bucket,q1_agg,q3_shipping,q5_local_supplier,q18_big_orders,q21_waiting_orders,events_sessionize_native,rollup_events,top_k_per_group_fast,ingest_pipeline,dedup_exact,span_dedup,knn_ivf,knn_ivf_pq,seq_pack,data_mix,epoch_shuffle,token_count,gopher_quality,lang_id
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10.json \
SPARK_GRAFT_BENCH_ONLY="$HEADLINERS" \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[r8b] bench-sf10 done $(date -u +%H:%M:%S)"
echo "[r8b] all green"
