#!/usr/bin/env bash
# Cross-JVM gate (round 11): run the ENTIRE driver contract
# (graft.Verify, all queries) with real executor processes via a
# local-cluster master, then strict-oracle the dump — proving every
# custom expression, broadcast, shuffle, serving layout, and physical
# plan survives process-boundary serialization at sf0.1.
#
# The kernel-heavy fast path (2 min) is graft.ClusterCheck /
# LocalClusterSpec, which `sbt test` runs in CI; this script is the
# full-breadth version (~15 min).
set -euo pipefail
cd "$(dirname "$0")/.."
sf="${SPARK_GRAFT_SF:-sf0.1}"
master="${SPARK_GRAFT_MASTER:-local-cluster[2,8,8192]}"
out="/tmp/gate_cluster_$sf"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"

echo "== cluster gate: Verify at $sf under $master =="
rm -rf "$out"
SPARK_GRAFT_MASTER="$master" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >/dev/null
echo "== cluster gate: strict oracle =="
python3 tools/check_oracle.py "/root/testdata/$sf" "$out"
echo "== cluster gate green =="
