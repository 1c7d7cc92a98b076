#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Spark result parquet, sort columns
by name, sort rows, and compare values. Dev tool only (driver-side python
env); NOT part of the Scala library.

DRIVER-FAITHFUL COERCION (round-7 fix): the driver materialises both
sides through a dataframe (pandas) before hashing, so a DuckDB HUGEINT
aggregate becomes float64 and renders `7833.0` against Spark's bigint
`7833` — a hash mismatch the old fetchall() path (python ints on both
sides) could never see. Both sides now round-trip through fetchdf() so
that class of oracle-portability bug fails HERE first. Do not switch
back to fetchall.

Usage: check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, os, json, glob, math, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # STRICT, like the driver: compare exact representations. A Spark
    # DOUBLE 1.5 vs a DuckDB DECIMAL 1.50 must MISMATCH here, because it
    # mismatches the driver's hash. No rounding, no type coercion.
    # numpy scalars (the fetchdf path) unwrap to python scalars first so
    # repr() is stable across numpy versions ('7833.0', not
    # 'np.float64(7833.0)').
    if type(v).__module__ == "numpy" and hasattr(v, "item") and not hasattr(v, "__len__"):
        v = v.item()
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)  # preserves scale: Decimal('1.20') -> '1.20'
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def fetch_df(res):
    """The driver's materialisation path: result -> pandas dataframe.
    This is where DuckDB HUGEINT / wide DECIMAL collapse to float64."""
    df = res.fetchdf()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows


# ---- chunked strict compare (r13 verdict item 6) ----------------------
# The default path materialises BOTH result sets as python tuple lists
# and sorts them by normed string — at sf100 the four giant-output rows
# (timeseries_bucket ~50M, events_sessionize_native, ingest_pipeline
# ~100M, span_dedup) need >55% of host RAM and ~40 min EACH in the
# checker alone. ORACLE_CHUNKED=1 streams instead: both sides are
# sorted by DuckDB itself (same columns, same ORDER BY ALL comparator,
# spilling to its temp dir under ORACLE_MEM), fetched a vector-chunk at
# a time through the SAME fetchdf coercion, normed with the SAME norm(),
# and compared pairwise. Equal normed multisets sort identically under
# one comparator, so chunked-equal ⟺ canon-equal; the one asymmetry is
# rows that TIE on every raw value but differ in normed rendering
# (-0.0/0.0, DECIMAL scale) — DuckDB may order such ties either way, so
# chunked mode can only ever err toward REPORTING a mismatch, never
# toward a false pass. Memory is bounded at one chunk per side.

def _cols_of(cur, sql):
    return [d[0] for d in cur.execute(f"SELECT * FROM ({sql}) LIMIT 0").description]


def _iter_normed(cur, sql, cols):
    sel = ", ".join(f'"{c}"' for c in cols)
    res = cur.execute(f"SELECT {sel} FROM ({sql}) ORDER BY ALL NULLS LAST")
    while True:
        df = res.fetch_df_chunk(4)  # ~8k rows/vector -> ~32k rows per pull
        if df is None or len(df) == 0:
            break
        for r in df.itertuples(index=False, name=None):
            yield tuple(norm(v) for v in r)


def compare_chunked(con, name, oracle_sql, spark_sql):
    """Strict streaming compare; returns (ok, message)."""
    cur_o, cur_s = con.cursor(), con.cursor()
    ocols = sorted(_cols_of(cur_o, oracle_sql))
    scols = sorted(_cols_of(cur_s, spark_sql))
    if ocols != scols:
        return False, f"schema {scols} vs oracle {ocols}"
    oit = _iter_normed(cur_o, oracle_sql, ocols)
    sit = _iter_normed(cur_s, spark_sql, scols)
    n = 0
    _done = object()
    while True:
        orow = next(oit, _done)
        srow = next(sit, _done)
        if orow is _done and srow is _done:
            return True, f"{n} rows"
        if orow is _done or srow is _done:
            return False, f"row-count mismatch after {n} equal rows"
        if orow != srow:
            return False, f"row {n}: spark {srow} vs oracle {orow}"
        n += 1

def compare_sliced(con, name, oracle_sql, spark_sql, col, values):
    """Strict compare, one slice per value of `col` (r14 verdict item 4:
    knn_bruteforce's all-pairs oracle OOMs DuckDB at sf100, but it
    partitions trivially by query_id — each slice is one corpus scan).
    Sound when `values` covers the oracle's domain BY CONSTRUCTION (here
    the query's own literal, q.vec_id < 10); the spark side is
    additionally checked for residual rows outside the slice set, so a
    spark value outside `values` can never escape the compare. Each
    slice reuses compare_chunked, so per-slice memory is one chunk per
    side."""
    total = 0
    for v in values:
        ok, msg = compare_chunked(
            con, name,
            f'SELECT * FROM ({oracle_sql}) WHERE "{col}" = {v}',
            f'SELECT * FROM ({spark_sql}) WHERE "{col}" = {v}')
        if not ok:
            return False, f"slice {col}={v}: {msg}"
        total += int(msg.split()[0])
    resid = con.execute(
        f'SELECT count(*) FROM ({spark_sql}) '
        f'WHERE "{col}" NOT IN ({", ".join(values)}) OR "{col}" IS NULL'
    ).fetchone()[0]
    if resid:
        return False, f"{resid} spark rows outside the slice set"
    return True, f"{total} rows, {len(values)} slices"


def main(sfdir, outdir):
    con = duckdb.connect()
    # Bound the checker: DuckDB's default memory_limit is ~80% of RAM,
    # and at sf1 the bigram-CTE oracles (doc_lm_score family) grew to
    # 130 GB RSS and drew the OOM killer. 24 GB + an explicit temp dir
    # makes it spill instead (the oracle is the slow side at scale by
    # design - SCALE.md).
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_tmp'")
    # Both sides are row-sorted before compare (canon), so result order
    # is irrelevant — and keeping insertion order makes DuckDB buffer
    # whole pipelines, which at sf10 pushed the big-join/shingle oracles
    # past this host's ~70 GB of free disk in temp spill. Dropping it
    # (and letting ORACLE_THREADS trade parallel partitions for temp)
    # keeps the checker runnable at x100.
    con.execute("SET preserve_insertion_order=false")
    if os.environ.get("ORACLE_THREADS"):
        con.execute(f"SET threads={int(os.environ['ORACLE_THREADS'])}")
    for t in TABLES:
        # driver layout: single file <t>.parquet; ScaleUp layout (sf1+):
        # a DIRECTORY <t>.parquet/ of range-partitioned part files
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # ORACLE_ONLY / ORACLE_SKIP: comma-separated name filters, for
    # resuming an interrupted sfN sweep without re-running hours of
    # already-green oracles.
    only = {x for x in os.environ.get("ORACLE_ONLY", "").split(",") if x}
    skip = {x for x in os.environ.get("ORACLE_SKIP", "").split(",") if x}
    chunked = os.environ.get("ORACLE_CHUNKED") == "1"
    # ORACLE_SLICE="name:col:v1,v2,...[;name2:...]" — strict compare in
    # per-value slices for oracles whose single-shot SQL out-sizes the
    # checker host (see compare_sliced)
    slice_spec = {}
    for spec in os.environ.get("ORACLE_SLICE", "").split(";"):
        if spec:
            nm, scol, vals = spec.split(":")
            slice_spec[nm] = (scol, vals.split(","))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in skip:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        if name in slice_spec:
            scol, vals = slice_spec[name]
            try:
                ok, msg = compare_sliced(
                    con, name, sql, f"SELECT * FROM read_parquet({files!r})",
                    scol, vals)
            except Exception as e:
                ok, msg = False, f"checker error: {e}"
            if ok:
                print(f"ok   {name} ({msg}, sliced)")
                n_ok += 1
            else:
                print(f"FAIL {name}: {msg}")
                n_bad += 1
            continue
        if chunked:
            try:
                ok, msg = compare_chunked(
                    con, name, sql, f"SELECT * FROM read_parquet({files!r})")
            except Exception as e:
                ok, msg = False, f"checker error: {e}"
            if ok:
                print(f"ok   {name} ({msg}, chunked)")
                n_ok += 1
            else:
                print(f"FAIL {name}: {msg}")
                n_bad += 1
            continue
        try:
            ocols, orows = fetch_df(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        scols, srows = fetch_df(
            con.execute(f"SELECT * FROM read_parquet({files!r})"))
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
