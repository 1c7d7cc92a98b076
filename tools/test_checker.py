#!/usr/bin/env python3
"""Self-test for check_oracle.py's comparison contract. Freezes the
behaviours a correctness gate must not drift on:

  1. HUGEINT class (the r6 q12 bug): an uncast DuckDB sum(INTEGER)
     becomes HUGEINT -> pandas float64 -> '7833.0', which MUST mismatch
     a Spark bigint '7833'; the same sum CAST AS BIGINT must match.
  2. DECIMAL scale is preserved and strict ('1.20' != '1.2').
  3. -0.0 vs 0.0 mismatch (repr-strict, like the driver hash).
  4. NaN equals NaN (both sides normalise to 'nan').

Runs standalone (python3 tools/test_checker.py) or under pytest; wired
into gate.sh so a checker regression fails the gate before any Spark run.
"""
import math
import decimal
import duckdb
import numpy as np

from check_oracle import norm, canon, fetch_df


def _duck(sql):
    return fetch_df(duckdb.connect().execute(sql))


def test_hugeint_mismatches_bigint():
    # the uncast aggregate: HUGEINT -> float64 through the driver path
    cols_h, rows_h = _duck("SELECT sum(x) AS s FROM (VALUES (1), (7832)) t(x)")
    assert norm(rows_h[0][0]) == "7833.0", (
        f"expected the HUGEINT->fetchdf float rendering, got {norm(rows_h[0][0])!r}")
    # the cast aggregate: BIGINT -> int64, renders bare
    cols_c, rows_c = _duck(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (7832)) t(x)")
    assert norm(rows_c[0][0]) == "7833"
    # and therefore the uncast form MUST fail against a Spark bigint
    assert norm(rows_h[0][0]) != norm(np.int64(7833))
    assert norm(rows_c[0][0]) == norm(np.int64(7833))


def test_decimal_scale_strict():
    assert norm(decimal.Decimal("1.20")) == "1.20"
    assert norm(decimal.Decimal("1.20")) != norm(decimal.Decimal("1.2"))
    assert norm(decimal.Decimal("1.20")) != norm(1.2)  # DECIMAL vs DOUBLE


def test_negative_zero_strict():
    assert norm(-0.0) == "-0.0"
    assert norm(0.0) == "0.0"
    assert norm(-0.0) != norm(0.0)
    assert norm(np.float64(-0.0)) == "-0.0"  # numpy unwraps before repr


def test_nan_equals_nan():
    assert norm(float("nan")) == "nan"
    assert norm(np.float64("nan")) == "nan"
    assert norm(float("nan")) == norm(math.nan)


def test_numpy_scalars_render_bare():
    # repr(np.float64(x)) is 'np.float64(x)' on numpy>=2 — norm must
    # unwrap first or every float comparison under fetchdf breaks
    assert norm(np.float64(1.5)) == "1.5"
    assert norm(np.int64(42)) == "42"
    assert norm(np.bool_(True)) == "True"


def test_arrays_and_nulls():
    assert norm(np.array([1.0, 2.5])) == ("1.0", "2.5")
    assert norm([1, 2]) == ("1", "2")
    assert norm(None) is None


def test_canon_sorts_columns_then_rows():
    cols, rows = canon(["b", "a"], [(2, "y"), (1, "x")])
    assert cols == ["a", "b"]
    assert rows == [("x", "1"), ("y", "2")]


def test_chunked_compare_matches_and_detects():
    # the streaming path (ORACLE_CHUNKED=1) must agree with the strict
    # contract on: equal multisets across >1 vector chunk, a value
    # mismatch, a row-count mismatch, a schema (column-name) mismatch,
    # and the HUGEINT-vs-BIGINT rendering class
    from check_oracle import compare_chunked
    con = duckdb.connect()
    big = "SELECT range AS id, range * 1.5 AS v FROM range(100000)"
    ok, msg = compare_chunked(con, "eq", big, big)
    assert ok, msg
    assert "100000" in msg
    ok, msg = compare_chunked(
        con, "val", big,
        "SELECT range AS id, CASE WHEN range = 54321 THEN -1.0 "
        "ELSE range * 1.5 END AS v FROM range(100000)")
    assert not ok and "row" in msg, msg
    ok, msg = compare_chunked(
        con, "cnt", big, big + " WHERE range < 99999")
    assert not ok and "row-count" in msg, msg
    ok, msg = compare_chunked(
        con, "schema", big, "SELECT 1 AS id, 2 AS w")
    assert not ok and "schema" in msg, msg
    ok, msg = compare_chunked(
        con, "hugeint",
        "SELECT sum(x) AS s FROM (VALUES (1), (7832)) t(x)",
        "SELECT CAST(7833 AS BIGINT) AS s")
    assert not ok, "HUGEINT float rendering must stay strict in chunked mode"
    # row order must be irrelevant (both sides sort under one comparator)
    ok, msg = compare_chunked(
        con, "order", big, big + " ORDER BY id DESC")
    assert ok, msg


if __name__ == "__main__":
    fns = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for fn in fns:
        fn()
        print(f"ok   {fn.__name__}")
    print(f"== {len(fns)} checker self-tests green ==")
