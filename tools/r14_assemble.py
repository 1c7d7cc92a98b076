#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf100_r14.json from the round-14 campaign logs.

Carried vs fresh is explicit: rows whose operators are bit-identical
since the r12 sweep carry their r12 engine/oracle status (the outputs
still on disk at /tmp/verify_sf100 are the r12 sweep's); the rows this
round re-ran from HEAD (the sliced-verify row and the four
chunked-strict promotions) report their fresh status with wall times.
"""
import json
import os
import sys

R12 = json.load(open("/root/repo/CORRECTNESS_sf100_r12.json"))


def read_status(path):
    out = {}
    if not os.path.exists(path):
        return out
    for line in open(path):
        parts = line.split()
        if len(parts) >= 2:
            out[parts[0]] = " ".join(parts[1:])
    return out


def main():
    verify = read_status("/tmp/r14_verify_status.txt")
    oracle = read_status("/tmp/r14_oracle_status.txt")
    engine = dict(R12["engine"])
    fresh_engine = {}
    for q, st in verify.items():
        engine[q] = "ok" if st.startswith("ok") else st.split()[0]
        fresh_engine[q] = st
    strict = set(R12["oracle_strict_ok"])
    chunked_ok = sorted(q for q, st in oracle.items() if st.startswith("ok"))
    strict |= set(chunked_ok)
    checker_bound = [q for q in R12["checker_host_bound_strict_at_sf10"]
                     if q not in strict]
    soundness = None
    if os.path.exists("/tmp/r14_lsh_soundness.out"):
        soundness = open("/tmp/r14_lsh_soundness.out").read().strip()

    art = {
        "sf": "sf100",
        "round": 14,
        "engine": engine,
        "fresh_this_round": {
            "engine": fresh_engine,
            "oracle_chunked": oracle,
            "note": ("fresh rows re-ran from HEAD (one JVM each, disk-"
                     "watchdogged); all other rows carry CORRECTNESS_sf100_r12 "
                     "— their operators are bit-identical since that sweep"),
        },
        "oracle_strict_ok": sorted(strict),
        "oracle_chunked_strict_ok": chunked_ok,
        "oracle_host_bound": R12["oracle_host_bound"],
        "checker_host_bound_strict_at_sf10": checker_bound,
        "rows_only_by_declaration": R12["rows_only_by_declaration"],
        "engine_host_disk_bound": [
            q for q, s in engine.items() if s not in ("ok",) and q != "sf"],
        "dedup_embedding_lsh_soundness": soundness,
        "min_free_disk_kb": int(open("/tmp/r14_min_free_kb.txt").read().strip())
        if os.path.exists("/tmp/r14_min_free_kb.txt") else None,
    }
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/CORRECTNESS_sf100_r14.json"
    json.dump(art, open(out, "w"), indent=1)
    print(f"wrote {out}")
    print("engine non-ok:", art["engine_host_disk_bound"])
    print("chunked strict:", chunked_ok)


if __name__ == "__main__":
    main()
