#!/usr/bin/env python3
"""Per-query scaling report: compare two Bench JSON outputs taken at
different scale factors and classify each query's wall-time growth.
Dev/driver-side tool (python), NOT part of the Scala library.

Usage: scale_report.py <base_bench.json> <scaled_bench.json> <data_ratio>

data_ratio is the row-count multiple between the two runs (10 for
sf0.1 -> sf1). Classification, with fixed per-query overhead in mind
(Spark job submission costs ~0.1-0.3 s at local[32], which dominates
sub-second queries and masks their true growth):

  const      scaled <= base * 1.5 + 0.3s   (point lookups, fixed-size outputs)
  sublinear  ratio <  0.7 * data_ratio
  linear     ratio <= 1.3 * data_ratio + overhead allowance
  SUPER      anything above linear - investigate or document
"""
import sys, json


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"], d


def classify(b, s, r):
    if b < 0 or s < 0:
        return "FAILED"
    if s <= b * 1.5 + 0.3:
        return "const"
    ratio = s / max(b, 1e-9)
    # allow the fixed overhead in the base measurement to understate growth
    if ratio < 0.7 * r:
        return "sublinear"
    if ratio <= 1.3 * r or s <= b * r + 0.5:
        return "linear"
    return "SUPER"


def main(base_path, scaled_path, ratio):
    base, bmeta = load(base_path)
    scaled, smeta = load(scaled_path)
    common = sorted(set(base) & set(scaled))
    only_base = sorted(set(base) - set(scaled))
    rows = []
    for q in common:
        b, s = base[q], scaled[q]
        cls = classify(b, s, ratio)
        rows.append((q, b, s, (s / max(b, 1e-9)) if b > 0 and s >= 0 else float("nan"), cls))
    print(f"| query | {bmeta.get('sf','base')} s | {smeta.get('sf','scaled')} s | ratio | class |")
    print("|---|---|---|---|---|")
    for q, b, s, r, cls in sorted(rows, key=lambda x: -(x[2] if x[2] > 0 else 0)):
        print(f"| {q} | {b:.2f} | {s:.2f} | {r:.1f}x | {cls} |")
    counts = {}
    for *_, cls in rows:
        counts[cls] = counts.get(cls, 0) + 1
    print()
    print(f"classes: {counts}; data_ratio={ratio}; "
          f"{len(common)} compared, {len(only_base)} only in base: {only_base}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], float(sys.argv[3])))
