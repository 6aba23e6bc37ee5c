#!/usr/bin/env python3
"""Fast oracle-SQL type lint: catches the driver-gate poison classes
WITHOUT running the Spark side or materializing results.

The driver's compare hashes pandas frames, so two type classes fail even
when every value matches:
  - HUGEINT oracle columns (DuckDB's sum() promotion on BIGINT) land as
    float64 vs Spark's int64 -> hash mismatch;
  - LIST/STRUCT/MAP output columns crash the driver's sort_values.
DuckDB binds output types from DESCRIBE without executing, so the whole
278-query sweep takes seconds. Run via scripts/lint-oracles.sh (which
dumps oracle_sql.json first), or hand it any existing Verify out dir.

Usage: python3 scripts/lint_oracles.py <dir-with-oracle_sql.json> [sf_dir]
(Driver-side tooling only -- not part of the shipped library.)
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT")
BAD_TYPE_MARKERS = ("[]", "STRUCT", "MAP(")


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"LINT-FAIL {name}: DESCRIBE failed: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        bad = []
        for cname, ctype, *_ in cols:
            up = str(ctype).upper()
            if up.startswith(BAD_TYPE_PREFIXES):
                bad.append(f"{cname}: {ctype} (un-CAST sum()? driver hash sees float64 vs int64)")
            elif any(m in up for m in BAD_TYPE_MARKERS):
                bad.append(f"{cname}: {ctype} (non-scalar cells crash the driver's sort_values)")
        if bad:
            print(f"LINT-FAIL {name}: {'; '.join(bad)}")
            n_bad += 1
    print(f"== lint: {len(oracle) - n_bad} clean / {n_bad} flagged of {len(oracle)}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
