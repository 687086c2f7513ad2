#!/usr/bin/env python3
"""Compute per-row sf0.1 -> sf1 scaling exponents from two bench_detail files.

Usage: python3 tools/exponents.py bench_detail.json bench_detail_sf1.json [N]

Exponent = log10(warm_sf1 / warm_sf0.1) (one decade). Rows with sentinel
times (< 0) or sub-0.15 s floors at sf0.1 are reported but flagged FLOOR
(fixed JVM/driver overhead dominates; the ratio is not a data exponent).
"""
import json, math, sys

small, big = json.load(open(sys.argv[1])), json.load(open(sys.argv[2]))
n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
ws, wb = small["warm"], big["warm"]
rows = []
for q, t0 in ws.items():
    t1 = wb.get(q)
    if t1 is None or t0 <= 0 or t1 <= 0:
        continue
    exp = math.log10(t1 / t0)
    rows.append((exp, q, t0, t1, "FLOOR" if t0 < 0.15 else ""))
rows.sort(reverse=True)
print(f"{'query':24} {'sf0.1':>8} {'sf1':>8} {'exp':>6}  flag")
for exp, q, t0, t1, flag in rows[:n]:
    print(f"{q:24} {t0:8.2f} {t1:8.2f} {exp:6.2f}  {flag}")
over = [r for r in rows if r[0] > 1.2 and not r[4]]
print(f"\nrows: {len(rows)}; exponent>1.2 (non-floor): {len(over)}")
med = sorted(r[0] for r in rows)[len(rows)//2]
print(f"median exponent: {med:.2f}")
