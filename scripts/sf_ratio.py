#!/usr/bin/env python3
"""Per-query scale-ratio check between two bench_full snapshots (r11
verdict #6: the sub-second class's scaling is invisible in the sf0.1-only
full bench — B262's 41x/decade bug sat hidden until its solo probe).

Usage: sf_ratio.py <low_sf_snapshot.json> <high_sf_snapshot.json> [flag_ratio]

Prints every query whose med ratio (high/low) exceeds flag_ratio
(default 4.0 for a 10x data step) and exits 1 if any exceed it while
being non-trivial (high med > 1s — fixed-overhead queries under a second
can't meaningfully flag). Accepts both per-query schema generations
(number or {med,...})."""
import json
import sys


def meds(path):
    with open(path) as f:
        d = json.load(f)
    out = {}
    for k, v in d.get("queries", {}).items():
        m = v.get("med") if isinstance(v, dict) else v
        if isinstance(m, (int, float)) and m > 0:
            out[k] = float(m)
    return out, d.get("sf", "?")


def main():
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    lo, lo_sf = meds(lo_path)
    hi, hi_sf = meds(hi_path)
    common = sorted(set(lo) & set(hi))
    if not common:
        print("no common queries between snapshots", file=sys.stderr)
        sys.exit(2)
    flagged = []
    ratios = []
    for q in common:
        r = hi[q] / lo[q]
        ratios.append(r)
        if r > flag and hi[q] > 1.0:
            flagged.append((r, q))
    ratios.sort()
    print(f"== sf_ratio: {len(common)} common queries ({lo_sf} -> {hi_sf}), "
          f"median ratio {ratios[len(ratios) // 2]:.2f}, flag > {flag}x on >1s queries")
    for r, q in sorted(flagged, reverse=True):
        print(f"FLAG {q}: {lo[q]:.2f}s -> {hi[q]:.2f}s ({r:.1f}x)")
    if not flagged:
        print("== no super-linear outliers")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
