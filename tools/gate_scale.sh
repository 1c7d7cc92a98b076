#!/usr/bin/env bash
# Scale gate (sf1 = x10 of sf0.1): synthesize the corpus if absent, run
# the full driver contract against it, strict-oracle everything except
# dedup_embedding_lsh (recall-gated — see SCALE.md §2), then print the
# per-query scaling table vs the committed sf0.1 bench.
#
# Expect ~1.5 h end-to-end: Verify ~28 min, strict oracle ~40 min (the
# recursive connected-components SQL dominates — the ORACLE is the slow
# side at sf1, not the engine), bench ~20 min.
set -euo pipefail
cd "$(dirname "$0")/.."
sf1="${SPARK_GRAFT_SF1_DIR:-/root/repo/data/sf1}"
out="/tmp/gate_sf1"
cpus="${SPARK_GRAFT_CPUS:-32}"

if [ ! -d "$sf1" ]; then
  echo "== scale gate: synthesizing $sf1 =="
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $sf1 10" >/dev/null
fi

echo "== scale gate: Verify at sf1 =="
rm -rf "$out"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS="$cpus" sbt -batch "runMain graft.Verify $sf1 $out" >/dev/null

echo "== scale gate: strict oracle (113 queries) =="
python3 - "$out" <<'EOF'
import json, sys
p = f"{sys.argv[1]}/oracle_sql.json"
d = json.load(open(p))
d.pop("dedup_embedding_lsh", None)  # recall-gated at scale, SCALE.md §2
json.dump(d, open(p, "w"))
EOF
python3 tools/check_oracle.py "$sf1" "$out"

echo "== scale gate: dedup_embedding_lsh subset+recall =="
python3 tools/check_lsh_recall.py "$out"

echo "== scale gate: ANN serving recall floors (recall_ok all-true at sf1) =="
python3 tools/check_ann_floors.py "$out" sf1

echo "== scale gate green =="
