#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the fixture tables in
<sfDir>, and compares: schema (column names, sorted), row count, and values
(rows sorted, doubles compared to 1e-9 rel tolerance and also exactly — both
reported, since the driver's hash compare is likely exact).
"""
import json, sys, math, glob
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows lexicographically by string repr
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(row):
        return tuple(("" if v is None else str(v)) for v in row)
    return sorted(out, key=key), [cols[i] for i in idx]

def eq(a, b):
    if a is None and b is None:
        return True, True
    if a is None or b is None:
        return False, False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return (a == b, a == b)
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        tol = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, tol
    return (a == b, a == b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols, got = rel.columns, rel.fetchall()
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got)} (no oracle)"); n_pass += 1; continue
        try:
            orel = con.sql(oracles[name])
            want_cols, want = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        g, gc = canon(got, got_cols)
        w, wc = canon(want, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rowcount {len(g)} != {len(w)}"); n_fail += 1; continue
        bad_exact = bad_tol = 0
        first = None
        for rg, rw in zip(g, w):
            for vg, vw in zip(rg, rw):
                ex, tol = eq(vg, vw)
                if not ex:
                    bad_exact += 1
                    if first is None: first = (rg, rw)
                if not tol:
                    bad_tol += 1
        if bad_tol:
            print(f"FAIL {name}: {bad_tol} values beyond tolerance; e.g. {first}")
            n_fail += 1
        elif bad_exact:
            print(f"WARN {name}: exact-match ok within tol, {bad_exact} values differ exactly; e.g. {first}")
            n_pass += 1
        else:
            print(f"PASS {name}: rows={len(g)} exact")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
