#!/usr/bin/env python3
"""Scaling analysis: compare two Bench artifacts (base vs scaled) and
emit the per-query wall-time growth table for SCALING.md.

Usage: python3 tools/scaling.py bench_base.json bench_scaled.json factor
Dev tool only — not part of the Scala deliverable.
"""
import json, sys

def main(base_p, scaled_p, factor):
    base = json.load(open(base_p))["queries"]
    scaled = json.load(open(scaled_p))["queries"]
    factor = float(factor)
    rows = []
    for q in sorted(base):
        if q not in scaled:
            continue
        b, s = base[q], scaled[q]
        ratio = s / b if b > 0 else float("inf")
        rows.append((q, b, s, ratio, ratio / factor))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | base s | {factor:.0f}x s | growth | growth/factor |")
    print("|---|---|---|---|---|")
    for q, b, s, r, n in rows:
        print(f"| {q} | {b:.2f} | {s:.2f} | {r:.1f}x | {n:.2f} |")
    worst = [r for r in rows if r[3] > factor]
    tb = sum(b for _, b, _, _, _ in rows)
    ts = sum(s for _, _, s, _, _ in rows)
    print(f"\ntotals: base {tb:.1f}s scaled {ts:.1f}s "
          f"growth {ts/tb:.2f}x (factor {factor:.0f}x)")
    print(f"queries growing faster than the data factor: {len(worst)}"
          + ("" if not worst else " -> " + ", ".join(
              f"{q} ({r:.1f}x)" for q, _, _, r, _ in worst[:10])))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
