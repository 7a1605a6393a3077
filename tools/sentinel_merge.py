#!/usr/bin/env python3
"""Embed a round's sentinel pair into its BENCH_LOCAL artifact.

Usage: python3 tools/sentinel_merge.py BENCH_LOCAL_rN.json \
           SENTINEL_rN_start.json SENTINEL_rN_end.json

Rewrites the bench artifact in place with a top-level
`"sentinel": {"start": {...}, "end": {...}}` object, which
tools/bench_diff.py then consumes for the battery-vs-sentinel
drift verdict (r14 verdict item 2).
"""
import json
import sys


def main() -> None:
    bench_path, start_path, end_path = sys.argv[1], sys.argv[2], sys.argv[3]
    bench = json.load(open(bench_path))
    start = json.load(open(start_path))
    end = json.load(open(end_path))
    for name, s in (("start", start), ("end", end)):
        if s.get("kind") != "sentinel" or s.get("when") != name:
            raise SystemExit(f"{name} file is not a '{name}' sentinel line")
    bench["sentinel"] = {"start": start, "end": end}
    with open(bench_path, "w") as f:
        json.dump(bench, f)
    print(f"embedded sentinel pair into {bench_path} "
          f"({len(start['queries'])} queries)")


if __name__ == "__main__":
    main()
