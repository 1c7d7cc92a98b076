#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Spark result parquet, sort columns
by name, sort rows, and compare values. Dev tool only (driver-side python
env); NOT part of the Scala library.

Usage: check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # STRICT, like the driver: compare exact representations. A Spark
    # DOUBLE 1.5 vs a DuckDB DECIMAL 1.50 must MISMATCH here, because it
    # mismatches the driver's hash. No rounding, no type coercion.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v)  # preserves scale: Decimal('1.20') -> '1.20'
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        sres = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        oc, orws = canon(ocols, orows)
        sc, srws = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            n_bad += 1
        elif orws != srws:
            diff = [(a, b) for a, b in zip(srws, orws) if a != b]
            print(f"FAIL {name}: rows {len(srws)} vs {len(orws)}; "
                  f"first diffs: {diff[:2]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(srws)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
