#!/usr/bin/env python3
"""Oracle dtype-contract checker (VERDICT r9 #6).

Usage: python3 tools/dtype_contract.py <sfDir> <oracle_sql.json>

For every oracle SQL entry, runs `DESCRIBE <sql>` in DuckDB (type inference
only — nothing is executed) against the fixture views and fails if any
output column surfaces as a type the driver's pandas canonicalization
cannot hash faithfully against Spark's parquet output:

  * HUGEINT / UHUGEINT      — pandas coerces int128 to float64, so the
                              driver hashes `3.0` against Spark's int64 `3`
  * DECIMAL(38,0)           — same coercion class (DuckDB's widest decimal
                              also leaves pandas as float64/object)
  * any LIST type (`...[]`) — ndarray cells break the driver's
                              sort_values canonicalization
  * STRUCT / MAP / UNION    — unhashable cells, same failure mode

Exit 0 when every column is representable; exit 1 with a per-query report
otherwise. This would have caught all 7 of round 9's red CORRECTNESS rows
at authoring time.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = re.compile(
    r"^(HUGEINT|UHUGEINT|DECIMAL\(38, *0\))$|\[\]$|^(STRUCT|MAP|UNION)\(")


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_json))
    n_bad = 0
    for name in sorted(oracles):
        try:
            desc = con.sql(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle does not parse/bind: {e}")
            n_bad += 1
            continue
        offenders = [(c, ty) for c, ty, *_ in desc if BAD.search(ty)]
        if offenders:
            print(f"FAIL {name}: driver-unhashable oracle column types: "
                  f"{offenders} — wrap in CAST(... AS BIGINT) or serialize "
                  f"lists with array_to_string")
            n_bad += 1
    print(f"== dtype contract: {len(oracles) - n_bad} ok / {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
