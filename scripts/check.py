#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
  python3 scripts/check.py <verify_out_dir> [sf_dir]
(Driver-side tooling only — not part of the shipped library.)
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = out_dir / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            otypes = [str(d[1]) for d in ores.description]
            orows = ores.fetchall()
            odf = con.execute(sql).df()
            sres = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
            sdf = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        # Mirror the driver gate's pandas-dtype-sensitive hash: a HUGEINT
        # oracle column (DuckDB sum() promotion) lands as float64 while
        # Spark emits int64 -> driver hash mismatch even with equal values.
        # Array/struct output columns crash the driver's sort_values.
        type_bad = []
        for c, t in zip(ocols, otypes):
            if "HUGEINT" in t.upper():
                type_bad.append(f"oracle col '{c}' is {t} (un-CAST sum()?)")
        for c in scols:
            od, sd = odf[c].dtype, sdf[c].dtype
            # kind-level compare: int32 vs int64 hash alike, float vs int don't
            if od.kind != sd.kind:
                type_bad.append(f"col '{c}' dtype oracle={od} spark={sd}")
        for df_name, df in (("oracle", odf), ("spark", sdf)):
            for c in df.columns:
                if len(df) and df[c].map(lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
                    type_bad.append(f"{df_name} col '{c}' holds array cells (driver sort_values crashes)")
        if type_bad:
            print(f"FAIL {name}: TYPE {'; '.join(type_bad)}")
            n_fail += 1
            continue
        _, on = norm_rows(ocols, orows)
        _, sn = norm_rows(scols, srows)
        if len(on) != len(sn):
            print(f"FAIL {name}: rows oracle={len(on)} spark={len(sn)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(on, sn) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(on)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(on)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
