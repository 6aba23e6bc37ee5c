#!/usr/bin/env python3
"""Render the SCALING.md per-query ratio table from a back-to-back
scaling-run pair (driver-side tooling, not shipped).

Usage: python3 scripts/scaling_table.py SMALL.json BIG.json [--top N]
Emits a markdown table (query | small med | big med | ratio) sorted by
ratio descending, plus headline aggregates, to stdout.
"""
import json
import sys


def meds(path):
    doc = json.loads(open(path).read())
    out = {}
    for name, v in doc.get("queries", {}).items():
        m = float(v["med"]) if isinstance(v, dict) else float(v)
        if m > 0:
            out[name] = m
    return out, doc


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    small, sdoc = meds(args[0])
    big, bdoc = meds(args[1])
    common = sorted(set(small) & set(big))
    rows = [(n, small[n], big[n], big[n] / small[n]) for n in common]
    rows.sort(key=lambda r: -r[3])

    ssum = sum(small[n] for n in common)
    bsum = sum(big[n] for n in common)
    ratios = sorted(r[3] for r in rows)
    med_ratio = ratios[len(ratios) // 2]
    nontrivial = sorted(r[3] for r in rows if r[1] >= 0.15)
    med_nt = nontrivial[len(nontrivial) // 2] if nontrivial else float("nan")
    super_lin = [r for r in rows if r[3] >= 12.0]

    print(f"small={args[0]} ({sdoc.get('sf')})  big={args[1]} ({bdoc.get('sf')})")
    print(f"common queries: {len(common)}")
    print(f"suite total: {ssum:.1f} s -> {bsum:.1f} s ({bsum/ssum:.2f}x)")
    print(f"median per-query ratio: {med_ratio:.2f}x")
    print(f"median ratio (small med >= 150 ms, n={len(nontrivial)}): {med_nt:.2f}x")
    print(f"queries >= 12x: {len(super_lin)} {[r[0] for r in super_lin]}")
    missing = sorted(set(small) ^ set(big))
    if missing:
        print(f"NOT in both runs: {missing}")
    for key in ("stream_rows", "stream_rows_per_sec", "stream_batches"):
        print(f"stream {key}: {sdoc.get(key)} -> {bdoc.get(key)}")
    print()
    print("| query | small med | big med | ratio |")
    print("|---|---|---|---|")
    for n, s, b, r in rows:
        print(f"| {n} | {s:.3f} s | {b:.3f} s | {r:.2f}× |")


if __name__ == "__main__":
    main()
