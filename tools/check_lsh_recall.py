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

Since round 10 the geometry is size-derived (graft.ops.LshGeometry:
bits = max(4, ceil(log2(n/50))), bands from the 0.998 recall target at
the 0.45 threshold, capped at 128). The floor to assert is
1-(1-p_bit(s)^bits)^bands at the corpus's dup similarity s:

  - Heaps-corpus (sf1+, ScaleUp-generated) pairs >= 0.45 are the
    injected dups at cos ~0.85/0.92/1.0 -> floor(0.85; 128,9) ~
    1-2e-11; default min_recall 0.999 is conservative under it.
  - the driver's isotropic sf0.1 corpus has threshold-adjacent pairs;
    there floor(0.45; 81,6) = 0.998 applies (pass it explicitly if
    gating that corpus with this script instead of strict equality).

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


def main(outdir, min_recall=0.999):
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
    sys.exit(main(args[0], float(args[1]) if len(args) > 1 else 0.999))
