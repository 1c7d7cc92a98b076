#!/usr/bin/env bash
# Round-8 evidence chain, run end-to-end in sequence (sbt invocations
# must not overlap). Logs to /tmp/r8_run.log; each phase stamps a
# marker line so progress is greppable.
set -euo pipefail
cd /root/repo
sf1=/root/repo/data/sf1

echo "[r8] phase=test start $(date -u +%H:%M:%S)"
sbt -batch test 2>&1 | tail -5
echo "[r8] phase=test done $(date -u +%H:%M:%S)"

echo "[r8] phase=gate start $(date -u +%H:%M:%S)"
bash tools/gate_scale.sh
echo "[r8] phase=gate done $(date -u +%H:%M:%S)"

echo "[r8] phase=bench-main start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR="$sf1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_main.json \
SPARK_GRAFT_BENCH_SKIP=dedup_ngram_jaccard,dedup_embedding,dedup_semantic \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[r8] phase=bench-main done $(date -u +%H:%M:%S)"

echo "[r8] phase=bench-quad start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR="$sf1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_quad.json \
SPARK_GRAFT_BENCH_ONLY=dedup_ngram_jaccard,dedup_embedding,dedup_semantic \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[r8] phase=bench-quad done $(date -u +%H:%M:%S)"

echo "[r8] all phases green $(date -u +%H:%M:%S)"
