#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [name_regex]

Reads each <name>/ parquet result produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables,
sorts columns by name and rows by all columns, and compares values.

Env:
  ORACLE_TIMEOUT_SEC — per-query wall cap; an oracle still running after
  this long is interrupted and recorded as TIMEOUT (used by the sf1 sweep,
  where a handful of brute-force pair-join oracles are quadratic in DuckDB
  while the Spark side finishes: a timeout is an oracle-cost statement,
  not a correctness failure).
"""
import json
import sys
import zlib

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    return canon_df(df)


def canon_df(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def round_half_up(x, nd):
    """Spark's round() (BigDecimal HALF_UP), not Python's banker's round."""
    import decimal
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP))


def computed_compress_ratio(con):
    """Expected values for x_text_compress_ratio: DuckDB has no deflate,
    but Python's zlib is the same public zlib the JVM Deflater wraps —
    level 6, zlib-wrapped stream, ratio = deflated/raw bytes (1.0 for
    empty), rounded half-up to 4 dp exactly like the Spark expression
    (functions/Expressions.scala DeflateRatio)."""
    df = con.sql("SELECT doc_id, text FROM documents").df()

    def ratio(t):
        b = (t or "").encode("utf-8")
        if not b:
            return 1.0
        return round_half_up(len(zlib.compress(b, 6)) / len(b), 4)

    return pd.DataFrame({"doc_id": df.doc_id,
                         "compress_ratio": df.text.map(ratio)})


# Queries whose oracle is a Python computation instead of DuckDB SQL
# (omitted from oracle_sql.json -> the driver records rows-only; this
# local harness restores the full rows+schema+hash contract for them).
COMPUTED = {"x_text_compress_ratio": computed_compress_ratio}


def main(out_dir, sf_dir, name_re=None):
    import re
    import threading
    con = duckdb.connect()
    import os as _os
    for t in TABLES:
        # driver testdata is a single parquet FILE per table; synthesized
        # sets (tools/MakeSf1) are Spark-written DIRECTORIES — glob those
        p = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    timeout = float(_os.environ.get("ORACLE_TIMEOUT_SEC", "0"))
    ok = fail = timed_out = 0
    names = sorted(set(oracles) | set(COMPUTED))
    if name_re:
        names = [n for n in names if re.search(name_re, n)]
    import os

    def with_timeout(fn):
        """Run fn(); if ORACLE_TIMEOUT_SEC is set and elapses first,
        con.interrupt() the running statement (DuckDB raises).

        Race guard (ADVICE r11): if fn() returns right as the timeout
        elapses, the watchdog's interrupt can land on an IDLE connection
        and abort the NEXT query. So: re-check done immediately before
        interrupting, join the watchdog after fn() returns (wait() exits
        as soon as done is set, so the join is prompt), and if an
        interrupt was issued but fn() had already succeeded, absorb the
        stale flag with a sacrificial query."""
        if not timeout:
            return fn()
        done = threading.Event()
        fired = []

        def watchdog():
            if not done.wait(timeout) and not done.is_set():
                fired.append(True)
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            result = fn()
        finally:
            done.set()
            w.join()
        if fired:  # fn() succeeded but an interrupt raced in late
            try:
                con.sql("SELECT 1").fetchall()
            except duckdb.InterruptException:
                pass
        return result

    for name in names:
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # graft.Verify was run with a name filter
        try:
            got = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            try:
                want = with_timeout(lambda: (
                    canon_df(COMPUTED[name](con)) if name in COMPUTED
                    else canon(con, oracles[name])))
            except duckdb.InterruptException:
                print(f"TIMEOUT {name}: oracle exceeded {timeout:.0f}s "
                      f"(spark result: {len(got)} rows)")
                timed_out += 1
                continue
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
    print(f"\n{ok} ok, {fail} failed"
          + (f", {timed_out} oracle-timeout" if timed_out else ""))
    # rc contract (ADVICE r11): 1 = comparison failures; 2 = no failures
    # but some oracles timed out (comparisons SKIPPED — gate callers must
    # not treat this as green); 0 = everything compared and matched.
    return 1 if fail else (2 if timed_out else 0)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
