#!/usr/bin/env python3
"""Scale-SF gate for dedup_embedding_lsh: at the small gate SFs the
banded output EQUALS the exact all-pairs set and the strict oracle
compare applies; at scale SFs strict equality stops being the right
yardstick (inherent to LSH, not a defect; see SCALE.md). The sound
invariants at any SF are:

  1. soundness:  lsh pairs are a SUBSET of the exact pairs (every
     candidate is exactly re-verified, so a false positive is a bug);
  2. recall:     |lsh| / |exact| >= the floor DERIVED from the band
     geometry at the corpus's true-pair similarity level.

Since round 10 the geometry is size-derived (graft.ops.LshGeometry):
corpora <= 4k vectors keep the legacy (32,4) whose ~0.998
threshold-level floor backs the strict-equality gates; above that,
bits grow ~log2(n) to bound background candidates and bands target a
>= 0.999 recall floor at the DUP similarity level (0.85 cosine) -
(102,14) at sf1, (225,18) at sf10. The floor to assert here is the
dup-level one: in the Heaps scale corpora every pair >= 0.45 is
injected dup structure at cos ~0.85/0.92/1.0 (plus a handful of
borderline micro-cluster pairs ~4 sigma above the 0.2 cluster
coherence), so the default min_recall 0.995 sits safely under the
geometry's >= 0.999 dup floor while tolerating the borderline tail.

Usage: check_lsh_recall.py <verify_out_dir> [min_recall]
Reads <dir>/dedup_embedding (exact) and <dir>/dedup_embedding_lsh.
"""
import sys, glob
import duckdb


def pairs(con, pattern):
    files = glob.glob(pattern)
    if not files:
        raise SystemExit(f"no parquet under {pattern}")
    return set(
        (a, b) for a, b in
        con.execute(f"SELECT a_id, b_id FROM read_parquet({files!r})").fetchall())


def main(outdir, min_recall=0.995):
    con = duckdb.connect()
    exact = pairs(con, f"{outdir}/dedup_embedding/*.parquet")
    lsh = pairs(con, f"{outdir}/dedup_embedding_lsh/*.parquet")
    false_pos = lsh - exact
    missed = exact - lsh
    recall = len(lsh & exact) / max(1, len(exact))
    print(f"exact={len(exact)} lsh={len(lsh)} missed={len(missed)} "
          f"false_pos={len(false_pos)} recall={recall:.5f}")
    if false_pos:
        print(f"FAIL soundness: lsh produced non-exact pairs {list(false_pos)[:5]}")
        return 1
    if recall < min_recall:
        print(f"FAIL recall {recall:.5f} < {min_recall}")
        return 1
    print("ok   dedup_embedding_lsh (subset + recall gate)")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(args[0], float(args[1]) if len(args) > 1 else 0.995))
