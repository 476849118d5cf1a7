#!/usr/bin/env python3
"""Per-query scaling-exponent sweep between two same-HEAD bench maps.

Usage: tools/exponents.py <map_lo.json> <map_hi.json> [decades]
exponent = log10(t_hi / t_lo) / decades  (default decades = 1, i.e.
the two maps are one decade of scale apart). Exponents >= 0.9 flag
super-linear queries; the sweep prints the worst 15 and the count.
"""
import json, math, sys

lo = json.load(open(sys.argv[1]))["queries"]
hi = json.load(open(sys.argv[2]))["queries"]
dec = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
rows = []
for q in sorted(set(lo) & set(hi)):
    if lo[q] <= 0 or hi[q] <= 0:
        continue
    rows.append((math.log10(hi[q] / lo[q]) / dec, q, lo[q], hi[q]))
rows.sort(reverse=True)
over = [r for r in rows if r[0] >= 0.9]
print(f"{len(rows)} shared queries; {len(over)} at exponent >= 0.9")
for e, q, a, b in rows[:15]:
    print(f"  {q:32s} exp {e:5.2f}  ({a:.2f} -> {b:.2f} s)")
print(f"totals: {sum(lo.values()):.1f} -> {sum(hi.values()):.1f} s")
