#!/usr/bin/env python3
"""Diff two bench_history snapshots (driver-side tooling, not shipped).

Accepts BOTH per-query schemas: plain numbers (rounds <= 4, min-of-2) and
{med,min,max} objects (round 5+, median-of-3). Cross-schema comparisons are
flagged so a metric change is never mistaken for a regression.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [--threshold 1.5]
"""
import json
import sys


def per_query(doc):
    """name -> (seconds, schema_tag) for either bench_full schema."""
    out = {}
    for name, v in doc.get("queries", {}).items():
        if isinstance(v, dict):
            out[name] = (float(v["med"]), "med")
        else:
            out[name] = (float(v), "min")
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1]) if "=" in a else threshold
    old = json.loads(open(args[0]).read())
    new = json.loads(open(args[1]).read())
    qo, qn = per_query(old), per_query(new)

    cross_schema = {t for _, t in qo.values()} != {t for _, t in qn.values()}
    if cross_schema:
        print("NOTE: comparing different metrics (min-of-N vs median-of-N); "
              "ratios are indicative only")

    rows = []
    for name in sorted(set(qo) | set(qn)):
        o, n = qo.get(name), qn.get(name)
        if o is None:
            rows.append((name, None, n[0], "NEW"))
        elif n is None:
            rows.append((name, o[0], None, "GONE"))
        else:
            ratio = n[0] / o[0] if o[0] > 0 else float("inf")
            flag = ""
            if ratio >= threshold:
                flag = "SLOWER"
            elif ratio <= 1 / threshold:
                flag = "faster"
            rows.append((name, o[0], n[0], flag))

    flagged = [r for r in rows if r[3]]
    for name, o, n, flag in flagged:
        os = "-" if o is None else f"{o:7.2f}"
        ns = "-" if n is None else f"{n:7.2f}"
        print(f"{name:36s} {os} -> {ns}  {flag}")
    to = sum(v[0] for v in qo.values())
    tn = sum(v[0] for v in qn.values())
    print(f"\ntotal listed: {to:.1f}s -> {tn:.1f}s over "
          f"{len(qo)} -> {len(qn)} queries; {len(flagged)} flagged at {threshold}x")


if __name__ == "__main__":
    main()
