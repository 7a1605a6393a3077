#!/bin/bash
# Fast optimization-loop gate: Verify + DuckDB oracle compare for a
# SUBSET of queries at one SF (default sf0.01).
# Usage: tools/quick_check.sh q1,q2,... [sfdir]
set -eu
cd "$(dirname "$0")/.."
NAMES="${1:?usage: quick_check.sh q1,q2,... [sfdir]}"
SF="${2:-/root/testdata/sf0.01}"
OUT="/tmp/quick_check_out"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT $NAMES" > /tmp/quick_check.log 2>&1 || {
  echo "VERIFY FAILED"; grep -E "\[verify\].*failed|error\]" /tmp/quick_check.log | head; exit 1; }
grep -E "\[verify\].*failed" /tmp/quick_check.log && exit 1
python3 tools/check_oracle.py "$SF" "$OUT" $(echo "$NAMES" | tr ',' ' ')
