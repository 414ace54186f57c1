#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — pandas-dtype strict.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the fixture tables in
<sfDir>, and compares the way the driver does: BOTH sides are canonicalized
through pandas DataFrames (duckdb `.df()` / pyarrow-pandas for the spark
parquet), columns sorted by name, rows sorted lexicographically via
`sort_values` over all columns, and then values are compared on the pandas
representation. This reproduces the two failure classes the old value-level
compare missed:

  * DuckDB HUGEINT / DECIMAL(38,0) columns coerce to float64 in pandas, so
    an oracle `sum()` over BIGINT hashes as `3.0` against Spark's int64 `3`
    — a dtype mismatch even when the values are identical.
  * ARRAY columns arrive as ndarray cells, which `sort_values` cannot sort
    (`TypeError: unhashable type: 'numpy.ndarray'`) — exactly the driver's
    t24 failure mode.

Exact dtype equality is reported as part of the gate; float values get a
secondary 1e-9 tolerance report (WARN not FAIL when only exactness differs).
"""
import json, sys, math, glob
import duckdb
import numpy as np
import pandas as pd


def canon_df(df, name, side):
    """Sort columns by name then rows over all columns — driver-style."""
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:
        raise RuntimeError(
            f"{name}: {side} result is not canonicalizable by the driver "
            f"(unsortable column — ARRAY/STRUCT output?): {e}")
    return df.reset_index(drop=True)


def isna(v):
    try:
        return v is None or bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def eq(a, b):
    an, bn = isna(a), isna(b)
    if an or bn:
        return (an and bn, an and bn)
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        fa, fb = float(a), float(b)
        exact = fa == fb
        tol = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, tol
    r = bool(a == b)
    return r, r


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon_df(con.sql(f"SELECT * FROM read_parquet({files!r})").df(),
                           name, "spark")
        except RuntimeError as e:
            print(f"FAIL {e}"); n_fail += 1; continue
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got)} (no oracle)"); n_pass += 1; continue
        try:
            want = canon_df(con.sql(oracles[name]).df(), name, "oracle")
        except RuntimeError as e:
            print(f"FAIL {e}"); n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rowcount {len(got)} != {len(want)}")
            n_fail += 1; continue
        # dtype KIND, not exact width: the driver hashes value reprs, so
        # int32 `3` vs int64 `3` are identical, but int64 `3` vs float64
        # `3.0` (the HUGEINT coercion class) are not.
        def kind(s):
            k = s.dtype.kind
            return "i" if k == "u" else k
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if kind(got[c]) != kind(want[c])]
        if dt_bad:
            print(f"FAIL {name}: pandas dtype mismatch (driver hash would "
                  f"reject): {dt_bad}")
            n_fail += 1; continue
        bad_exact = bad_tol = 0
        first = None
        gv, wv = got.to_numpy(dtype=object), want.to_numpy(dtype=object)
        for rg, rw in zip(gv, wv):
            for vg, vw in zip(rg, rw):
                ex, tol = eq(vg, vw)
                if not ex:
                    bad_exact += 1
                    if first is None:
                        first = (list(rg), list(rw))
                if not tol:
                    bad_tol += 1
        if bad_tol:
            print(f"FAIL {name}: {bad_tol} values beyond tolerance; e.g. {first}")
            n_fail += 1
        elif bad_exact:
            print(f"WARN {name}: ok within tol, {bad_exact} values differ exactly; e.g. {first}")
            n_pass += 1
        else:
            print(f"PASS {name}: rows={len(got)} exact")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
