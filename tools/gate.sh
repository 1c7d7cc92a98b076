#!/usr/bin/env bash
# Tri-SF local gate: run the driver contract (graft.Verify) and the
# strict DuckDB oracle compare at ALL THREE scale factors before
# trusting a change.
#
# This is also the LSH-recall CANARY: dedup_minhash and
# dedup_embedding_lsh are oracle'd against their EXACT twins (n-gram
# Jaccard / all-pairs cosine SQL), which is sound only while banding
# recall is exhaustive on the corpus (candidates are exact-verified, so
# banded output ⊆ exact; the gate proves equality). A generator or SF
# change that breaks that equality fails HERE, loudly, at the affected
# SF — before the driver ever sees it. Do not weaken the checker.
set -euo pipefail
cd "$(dirname "$0")/.."
cpus="${SPARK_GRAFT_CPUS:-16}"
echo "== gate: checker self-test =="
(cd tools && python3 test_checker.py)
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/gate_$sf"
  rm -rf "$out"
  echo "== gate: $sf =="
  SPARK_GRAFT_CPUS="$cpus" sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >/dev/null
  python3 tools/check_oracle.py "/root/testdata/$sf" "$out"
done
echo "== tri-SF gate green =="
if [ "${SPARK_GRAFT_SOAK:-0}" = "1" ]; then
  echo "== gate: driver soak (retained-heap plateau, ~8 min) =="
  SPARK_GRAFT_CPUS="$cpus" sbt -batch "runMain graft.Soak /root/testdata/sf0.01 1500"
  echo "== soak gate green =="
fi
