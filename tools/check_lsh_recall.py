#!/usr/bin/env python3
"""Scale-SF gate for dedup_embedding_lsh: at the small gate SFs the
banded output EQUALS the exact all-pairs set and the strict oracle
compare applies; at sf1+ the corpus has tens of thousands of pairs in
the immediate vicinity of the 0.45 threshold, so the 32x4 banding's
~99.9% per-pair recall makes a handful of expected misses a statistical
certainty - strict equality stops being the right yardstick (this is
inherent to LSH, not a defect; see SCALE.md). The sound invariants at
any SF are:

  1. soundness:  lsh pairs are a SUBSET of the exact pairs (every
     candidate is exactly re-verified, so a false positive is a bug);
  2. recall:     |lsh| / |exact| >= the theoretical floor for the band
     geometry (default 0.995 - expected recall at this threshold is
     ~99.87% per pair, overwhelmingly concentrated just above 0.45).

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
