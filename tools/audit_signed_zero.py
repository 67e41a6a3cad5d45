#!/usr/bin/env python3
"""Signed-zero / near-zero audit over a graft.Verify dump.

The driver's correctness gate hash-compares raw value bytes, so a column
where one engine emits -0.0 and the other 0.0 is value-equal but
hash-different (the x_embed_standardize round-5 flake). This tool makes
the latent exposure measurable instead of waiting for the next one-row
flake: for every query in a Verify output directory it scans

  - the Spark parquet result, and
  - the DuckDB oracle result (re-executed from oracle_sql.json)

for float/double columns containing (a) any -0.0 bit pattern, or (b) any
nonzero magnitude below 1e-9 (a value one summation-order change away
from crossing zero and flipping sign under round()).

Usage: python3 tools/audit_signed_zero.py <verify_out_dir> <sf_dir>
Exit code 1 if any -0.0 is found on either engine (actionable now);
near-zero findings are informational.
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as ds


def is_neg_zero(x: float) -> bool:
    return x == 0.0 and math.copysign(1.0, x) < 0


def scan_table(tbl):
    """-> {col: (n_negzero, n_nearzero)} for float/double columns."""
    out = {}
    for name, col in zip(tbl.column_names, tbl.columns):
        if str(col.type) not in ("float", "double"):
            continue
        nz = near = 0
        for v in col.to_pylist():
            if v is None:
                continue
            f = float(v)
            if is_neg_zero(f):
                nz += 1
            elif f != 0.0 and abs(f) < 1e-9:
                near += 1
        if nz or near:
            out[name] = (nz, near)
    return out


def main():
    vout, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle_sql = json.loads((vout / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = 0
    for qdir in sorted(d for d in vout.iterdir() if d.is_dir()):
        name = qdir.name
        findings = []
        spark_cols = scan_table(ds.dataset(str(qdir)).to_table())
        for c, (nz, near) in spark_cols.items():
            findings.append(("spark", c, nz, near))
        if name in oracle_sql:
            try:
                tbl = con.execute(oracle_sql[name]).arrow()
                for c, (nz, near) in scan_table(tbl).items():
                    findings.append(("duckdb", c, nz, near))
            except Exception as e:  # oracle may need per-query setup
                print(f"SKIP {name}: oracle failed ({e})")
                continue
        for side, c, nz, near in findings:
            tag = "NEGZERO" if nz else "nearzero"
            if nz:
                bad += 1
            print(f"{tag:8s} {name} [{side}] {c}: "
                  f"-0.0 x{nz}, |x|<1e-9 x{near}")
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} -0.0 emission(s) found")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
