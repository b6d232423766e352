#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views registered for
every test table, and compares schema + sorted values exactly.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            print(f"FAIL {name}: dtypes {list(map(str, got.dtypes))} != "
                  f"{list(map(str, want.dtypes))}")
            failures += 1
            continue
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        ws = want.sort_values(by=list(want.columns), ignore_index=True)
        if len(gs) != len(ws):
            print(f"FAIL {name}: rows {len(gs)} != {len(ws)}")
            failures += 1
            continue
        if not gs.equals(ws):
            diff = (gs != ws) & ~(gs.isna() & ws.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(gs)} rows differ; first:")
            idx = bad[bad].index[:3]
            for i in idx:
                print("  got ", gs.loc[i].to_dict())
                print("  want", ws.loc[i].to_dict())
            failures += 1
            continue
        print(f"ok   {name}: {len(gs)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
