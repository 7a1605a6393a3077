#!/usr/bin/env python3
"""Anchor-normalized cross-round bench diff.

Usage: python3 tools/bench_diff.py BENCH_LOCAL_rA.json BENCH_LOCAL_rB.json [threshold]

Both artifacts carry a host-calibration `anchor` (graft.Calibration:
a fixed pure-compute kernel timed single-threaded, t1_sec). Dividing
round B's walls by the anchor ratio (t1_B / t1_A) expresses them in
round-A host-seconds, so a mover is a real plan/code change, not a
slower host. Prints the same-set totals (raw and normalized) and
every query whose NORMALIZED ratio exceeds the threshold (default
1.3x) in either direction, plus entries present in only one round.
"""
import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    t1a = a["anchor"]["t1_sec"]
    t1b = b["anchor"]["t1_sec"]
    host = t1b / t1a  # >1: B's host slower than A's
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    sum_a = sum(qa[q] for q in common)
    sum_b = sum(qb[q] for q in common)
    print(f"anchor t1: A={t1a}s B={t1b}s host_ratio(B/A)={host:.3f}")
    print(f"common entries: {len(common)}")
    print(f"same-set sum: A={sum_a:.1f}s B={sum_b:.1f}s raw={sum_b / sum_a:.3f} "
          f"normalized={(sum_b / host) / sum_a:.3f}")
    movers = []
    for q in common:
        norm_b = qb[q] / host
        ratio = norm_b / qa[q]
        if ratio >= threshold or ratio <= 1 / threshold:
            movers.append((ratio, q, qa[q], qb[q], norm_b))
    movers.sort(reverse=True)
    if movers:
        print(f"\nnormalized movers (>= {threshold}x either direction):")
        print(f"{'query':42s} {'A_s':>7s} {'B_s':>7s} {'B_norm':>7s} {'ratio':>6s}")
        for ratio, q, va, vb, nb in movers:
            print(f"{q:42s} {va:7.3f} {vb:7.3f} {nb:7.3f} {ratio:6.2f}")
    else:
        print(f"\nno normalized movers at {threshold}x")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print(f"\nonly in A: {', '.join(only_a)}")
    if only_b:
        print(f"\nnew in B: " + ", ".join(f"{q} ({qb[q]:.2f}s)" for q in only_b))


if __name__ == "__main__":
    main()
