#!/usr/bin/env bash
# Second scale decade: synthesize sf10 (x100 of sf0.1; lineitem 60M,
# events 10M, documents 500k, embeddings 200k; ~1.5 GB) and bench a
# headline subset covering every operator family. Two decades of
# measurements (sf0.1 -> sf1 -> sf10) distinguish true linear growth
# from fixed-overhead-masked growth in a way a single x10 step cannot.
#
# dedup_embedding_lsh is excluded: near-threshold (cos>=0.45) pair
# count grows quadratically in an isotropic corpus (a property of the
# geometry, SCALE.md §2), so its work is O(n^2) by problem definition,
# not by implementation — its scale story is the recall gate at sf1.
set -euo pipefail
cd /root/repo
sf10=/root/repo/data/sf10

if [ ! -d "$sf10" ]; then
  echo "[sf10] synthesizing $(date -u +%H:%M:%S)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $sf10 100" >/dev/null
fi

HEADLINERS=raw_station,latest_per_key,timeseries_bucket,q1_agg,q3_shipping,q5_local_supplier,q18_big_orders,q21_waiting_orders,events_sessionize_native,rollup_events,top_k_per_group_fast,ingest_pipeline,dedup_exact,dedup_minhash,dedup_simhash,span_dedup,dedup_clusters,knn_ivf,knn_ivf_pq,seq_pack,data_mix,epoch_shuffle,token_count,gopher_quality,lang_id

echo "[sf10] bench start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR="$sf10" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10.json \
SPARK_GRAFT_BENCH_ONLY="$HEADLINERS" \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[sf10] bench done $(date -u +%H:%M:%S)"
