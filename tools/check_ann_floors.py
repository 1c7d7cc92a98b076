#!/usr/bin/env python3
"""Assert the ANN serving recall floors from a Verify dump.

Usage: check_ann_floors.py <verify_out_dir> [label]

Reads <dir>/ann_recall_report/*.parquet (the driver entry's own output,
which carries per-row recall_ok — the floors live in the engine, not
here) and exits non-zero unless all four families are present and every
row passes its floor. Shared by gate_scale.sh (sf1) and
gate_sf10_strict.sh (sf10) so the check can never diverge between
gates.
"""
import sys
import duckdb

out, label = sys.argv[1], (sys.argv[2] if len(sys.argv) > 2 else "scale")
rows = duckdb.sql(
    f"select index_kind, any_value(family_recall), bool_and(recall_ok) "
    f"from read_parquet('{out}/ann_recall_report/*.parquet') "
    f"group by 1 order by 1").fetchall()
bad = [r for r in rows if not r[2]]
for kind, recall, ok in rows:
    print(f"  {kind:8s} family_recall={recall} {'ok' if ok else 'BELOW FLOOR'}")
assert len(rows) == 4, f"expected 4 ANN families, got {rows}"
assert not bad, f"ANN family below its serving floor at {label}: {bad}"
