#!/usr/bin/env python
"""Compare two bench detail JSONs (baseline vs after) and print a
markdown table sorted by absolute saving, plus regressions."""
import json
import sys

a = json.load(open(sys.argv[1]))["queries"]
b = json.load(open(sys.argv[2]))["queries"]
common = sorted(set(a) & set(b), key=lambda k: a[k] - b[k], reverse=True)
ta = sum(a[k] for k in common)
tb = sum(b[k] for k in common)
print(f"common {len(common)}: {ta:.1f}s -> {tb:.1f}s ({tb/ta:.2f}x)")
print("| query | before | after | ratio |")
print("|---|---|---|---|")
for k in common:
    if abs(a[k] - b[k]) < 0.25 and (a[k] < 0.5 or 0.8 < b[k] / a[k] < 1.25):
        continue
    print(f"| {k} | {a[k]:.2f} | {b[k]:.2f} | {b[k]/a[k]:.2f}x |")
