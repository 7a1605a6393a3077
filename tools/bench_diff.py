#!/usr/bin/env python3
"""Anchor-normalized cross-round bench diff, per QUERY CLASS.

Usage: python3 tools/bench_diff.py BENCH_LOCAL_rA.json BENCH_LOCAL_rB.json [threshold]

Both artifacts carry a host-calibration `anchor` (graft.Calibration).
r13's run-3 evidence: a single compute anchor (t1_sec) under-corrects
shuffle-heavy walls on a contended host by ~15%, so normalization is
now TWO-BASELINE: each query is classified compute- vs shuffle-bound
ONCE at bench time (exchange count of its executed plan, recorded in
the artifact's `classes` map), and its walls normalize by the matching
anchor ratio — t1_sec for compute, sh_sec (a fixed pure-shuffle leg)
for shuffle. Falls back to t1 for a class whose anchor either file
lacks (pre-r14 artifacts carry no sh_sec) and says so.

Prints per-class same-set sums (raw and normalized — the residual
per-class noise band), and every query whose NORMALIZED ratio against
ITS OWN class baseline exceeds the threshold (default 1.3x) in either
direction, plus entries present in only one round.
"""
import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    t1a, t1b = a["anchor"]["t1_sec"], b["anchor"]["t1_sec"]
    t1_ratio = t1b / t1a  # >1: B's host slower than A's
    sha, shb = a["anchor"].get("sh_sec"), b["anchor"].get("sh_sec")
    sh_ratio = (shb / sha) if (sha and shb) else None
    # class map: prefer B's (newer round observes every current query);
    # fill gaps from A; default compute
    classes = dict(a.get("classes", {}))
    classes.update(b.get("classes", {}))

    def host_ratio(q: str) -> float:
        if classes.get(q, "compute") == "shuffle" and sh_ratio is not None:
            return sh_ratio
        return t1_ratio

    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    print(f"anchor t1: A={t1a}s B={t1b}s ratio(B/A)={t1_ratio:.3f}")
    if sh_ratio is not None:
        print(f"anchor sh: A={sha}s B={shb}s ratio(B/A)={sh_ratio:.3f}")
    else:
        print("anchor sh: absent in at least one artifact — "
              "shuffle class falls back to the t1 ratio")
    print(f"common entries: {len(common)}")
    for cls in ("compute", "shuffle"):
        qs = [q for q in common if classes.get(q, "compute") == cls]
        if not qs:
            continue
        sum_a = sum(qa[q] for q in qs)
        sum_b = sum(qb[q] for q in qs)
        r = sh_ratio if (cls == "shuffle" and sh_ratio is not None) else t1_ratio
        print(f"{cls}: n={len(qs)} same-set sum A={sum_a:.1f}s B={sum_b:.1f}s "
              f"raw={sum_b / sum_a:.3f} normalized={(sum_b / r) / sum_a:.3f}")
    movers = []
    for q in common:
        norm_b = qb[q] / host_ratio(q)
        ratio = norm_b / qa[q]
        if ratio >= threshold or ratio <= 1 / threshold:
            movers.append((ratio, q, classes.get(q, "compute"),
                           qa[q], qb[q], norm_b))
    movers.sort(reverse=True)
    if movers:
        print(f"\nnormalized movers vs OWN class baseline "
              f"(>= {threshold}x either direction):")
        print(f"{'query':42s} {'class':>8s} {'A_s':>7s} {'B_s':>7s} "
              f"{'B_norm':>7s} {'ratio':>6s}")
        for ratio, q, cls, va, vb, nb in movers:
            print(f"{q:42s} {cls:>8s} {va:7.3f} {vb:7.3f} {nb:7.3f} {ratio:6.2f}")
    else:
        print(f"\nno normalized movers at {threshold}x")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print(f"\nonly in A: {', '.join(only_a)}")
    if only_b:
        print("\nnew in B: " + ", ".join(
            f"{q} ({qb[q]:.2f}s, {classes.get(q, 'compute')})" for q in only_b))

    # SENTINEL verdict (r14 verdict item 2): if B carries a
    # round-boundary sentinel pair (graft.SentinelBench at round start
    # and end, identical code, isolated JVMs), its start->end drift is
    # a direct measurement of how much B's host window moved during
    # the round. Battery-level A->B drift within the sentinel band is
    # then attributable to the host without per-query hand audits;
    # drift OUTSIDE the band needs a code explanation.
    sent = b.get("sentinel")
    if sent:
        s_start, s_end = sent["start"], sent["end"]
        s_classes = s_start.get("classes", {})
        print("\nsentinel pair (round start vs end, identical code):")
        for cls in ("compute", "shuffle"):
            qs = [q for q in s_start["queries"]
                  if s_classes.get(q, "compute") == cls
                  and q in s_end["queries"]]
            if not qs:
                continue
            sum_s = sum(s_start["queries"][q] for q in qs)
            sum_e = sum(s_end["queries"][q] for q in qs)
            print(f"  sentinel {cls}: n={len(qs)} start={sum_s:.2f}s "
                  f"end={sum_e:.2f}s ratio={sum_e / sum_s:.3f}")
        all_s = sum(s_start["queries"].values())
        all_e = sum(s_end["queries"][q] for q in s_start["queries"]
                    if q in s_end["queries"])
        # battery drift over the same (sentinel) names, A battery vs
        # B battery — the cross-round axis the pair calibrates
        names = [q for q in s_start["queries"] if q in qa and q in qb]
        bat_a = sum(qa[q] for q in names)
        bat_b = sum(qb[q] for q in names)
        bat = bat_b / bat_a if bat_a else float("nan")
        intra = all_e / all_s
        print(f"  intra-round host drift (sentinel start->end): "
              f"{(intra - 1) * 100:+.1f}%")
        print(f"  cross-round battery drift on sentinel names (A->B raw): "
              f"{(bat - 1) * 100:+.1f}%")
        full_a = sum(qa[q] for q in common)
        full_b = sum(qb[q] for q in common)
        full = full_b / full_a
        lo, hi = sorted((1.0, intra))
        margin = 0.05  # per-query noise floor observed across rounds
        if lo - margin <= full <= hi + margin:
            print(f"  VERDICT: whole-battery drift {(full - 1) * 100:+.1f}% "
                  f"is WITHIN the sentinel host-window band "
                  f"[{(lo - margin - 1) * 100:+.1f}%, {(hi + margin - 1) * 100:+.1f}%] — host, not code")
        else:
            print(f"  VERDICT: whole-battery drift {(full - 1) * 100:+.1f}% "
                  f"is OUTSIDE the sentinel host-window band "
                  f"[{(lo - margin - 1) * 100:+.1f}%, {(hi + margin - 1) * 100:+.1f}%] — needs a code-level cause")


if __name__ == "__main__":
    main()
