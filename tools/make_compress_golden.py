#!/usr/bin/env python3
"""Regenerate oracle/compress_ratio_golden.parquet: expected deflate
ratios for x_text_compress_ratio, computed with CPython's zlib (level 6,
zlib-wrapped stream — the same public zlib the JVM Deflater wraps) over
every distinct document text across the three test scale factors, keyed
by md5(text) so the oracle SQL can join it from any SF's documents table.

Run whenever /root/testdata regenerates:
    python3 tools/make_compress_golden.py
"""
import decimal
import hashlib
import os
import zlib

import duckdb
import pandas as pd

SFS = ("sf0.001", "sf0.01", "sf0.1")
OUT = os.path.join(os.path.dirname(__file__), "..", "oracle",
                   "compress_ratio_golden.parquet")


def round_half_up(x, nd=4):
    """Spark's round() (BigDecimal HALF_UP), not Python's banker's round."""
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP))


def main():
    rows = {}
    for sf in SFS:
        df = duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'").df()
        for t in df.text:
            if t is None:
                continue  # Spark emits NULL ratio; join drops it -> loud
            b = t.encode("utf-8")
            h = hashlib.md5(b).hexdigest()
            if h not in rows:
                rows[h] = 1.0 if not b else round_half_up(
                    len(zlib.compress(b, 6)) / len(b))
    out = pd.DataFrame({"text_md5": list(rows),
                        "expected_ratio": list(rows.values())})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    out.to_parquet(OUT, index=False)
    print(f"wrote {len(out)} rows -> {OUT}")


if __name__ == "__main__":
    main()
