#!/usr/bin/env python3
"""Per-query diff of two BENCH_LOCAL artifacts, anchor-normalized.

Usage: tools/bench_cmp.py OLD.json NEW.json [threshold_ratio]

Normalizes each query's ratio by its class anchor (t1 for compute, sh
for shuffle — the r13 two-anchor discipline) so host drift between the
two runs does not masquerade as code change.
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
t1 = new["anchor"]["t1_sec"] / old["anchor"]["t1_sec"]
sh = new["anchor"]["sh_sec"] / old["anchor"]["sh_sec"]
print(f"total {old['total_sec']} -> {new['total_sec']}  "
      f"anchor ratios: t1 {t1:.3f} sh {sh:.3f}")
rows = []
for q, nv in new["queries"].items():
    ov = old["queries"].get(q)
    if ov is None:
        continue
    cls = new.get("classes", {}).get(q, "compute")
    norm = (nv / ov) / (t1 if cls == "compute" else sh)
    rows.append((norm, q, ov, nv, cls))
rows.sort()
print("\nfast-side movers (normalized ratio <= 1/thr):")
for norm, q, ov, nv, cls in rows:
    if norm <= 1 / thr and max(ov, nv) > 0.2:
        print(f"  {q:44s} {ov:7.3f} -> {nv:7.3f}  x{norm:.2f} [{cls}]")
print("slow-side movers (normalized ratio >= thr):")
for norm, q, ov, nv, cls in rows:
    if norm >= thr and max(ov, nv) > 0.2:
        print(f"  {q:44s} {ov:7.3f} -> {nv:7.3f}  x{norm:.2f} [{cls}]")
ncomp = sum(1 for r in rows if r[4] == "compute")
print(f"\n{len(rows)} common entries ({ncomp} compute)")
