#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables,
sorts columns by name and rows by all columns, and compares values.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want = canon(con, sql)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                fail += 1
                continue
            if not got.equals(want):
                neq = (got != want) & ~(got.isna() & want.isna())
                bad_cols = [c for c in got.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    idx = neq[c].idxmax()
                    print(f"   e.g. row {idx} col {c}: got={got[c][idx]!r} want={want[c][idx]!r}")
                fail += 1
                continue
            print(f"OK   {name} ({len(got)} rows)")
            ok += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
