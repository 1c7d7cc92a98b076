#!/usr/bin/env bash
# Round-10 evidence chain (run AFTER tools/gate_scale.sh is green):
# same-measurement-window benches at sf0.1 and sf1 (so the scaling
# table is host-drift-free — both points share one window plus the
# pinned calibration job), then the LSH candidate-load measurement at
# both SFs (tools note: sbt invocations must never overlap).
set -euo pipefail
cd "$(dirname "$0")/.."
sf1="${SPARK_GRAFT_SF1_DIR:-/root/repo/data/sf1}"

echo "[r10] phase=bench-sf0.1 start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf01_r10.json \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[r10] phase=bench-sf1 start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR="$sf1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_r10.json \
SPARK_GRAFT_BENCH_SKIP=dedup_ngram_jaccard,dedup_embedding \
  sbt -batch "runMain graft.Bench" >/dev/null
echo "[r10] phase=lshstats start $(date -u +%H:%M:%S)"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.LshStats /root/testdata/sf0.1 /tmp/lshstats_sf01.json" >/dev/null
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.LshStats $sf1 /tmp/lshstats_sf1.json" >/dev/null
echo "[r10] phase=report $(date -u +%H:%M:%S)"
python3 tools/scale_report.py /tmp/bench_sf01_r10.json /tmp/bench_sf1_r10.json 10 || true
cat /tmp/lshstats_sf01.json /tmp/lshstats_sf1.json
echo "[r10] done $(date -u +%H:%M:%S)"
