#!/bin/bash
# Round close-out GATE runner (r15 verdict item 3: gate evidence must be
# captured LAST, after the final code commit, and its tails must
# mechanically match the registry — r14/r15 both committed stale tails).
#
# Usage: tools/run_gates.sh <round>   (e.g. tools/run_gates.sh 16)
#
# Refuses to run on a dirty tree (the whole point is that the evidence
# describes the committed code), runs:
#   1. the full ScalaTest suite
#   2. the sf0.01 Verify + DuckDB oracle gate
#   3. the sf1 Verify + DuckDB oracle gate (when sf1 data exists)
# and ASSERTS, before writing anything:
#   - suite: failed == 0
#   - each gate's "N passed" equals the number of oracleSql entries the
#     Verify dump itself declared (oracle_sql.json), and failed == 0
# On success appends the tails + git HEAD to SCALE_r<round>_results.txt.
set -u
cd "$(dirname "$0")/.."
ROUND="${1:?usage: run_gates.sh <round>}"
OUT="SCALE_r${ROUND}_results.txt"

if [ -n "$(git status --porcelain)" ]; then
  echo "FATAL: working tree dirty — commit first; gate evidence must describe committed code" >&2
  git status --porcelain >&2
  exit 1
fi
HEAD_SHA=$(git rev-parse HEAD)

echo "[gates] suite..."
SUITE_LOG=/tmp/gate_suite_r${ROUND}.log
sbt -batch test >"$SUITE_LOG" 2>&1
SUITE_RC=$?
SUITE_LINE=$(grep -E "Tests: succeeded" "$SUITE_LOG" | tail -1)
if [ $SUITE_RC -ne 0 ] || ! echo "$SUITE_LINE" | grep -q "failed 0"; then
  echo "FATAL: suite not green: $SUITE_LINE (log: $SUITE_LOG)" >&2
  exit 1
fi

run_gate() { # $1=sfdir $2=tag $3=duckdb_mem
  local sfdir="$1" tag="$2" log="/tmp/gate_${2}_r${ROUND}.log" outdir="/tmp/gate_out_${2}_r${ROUND}"
  rm -rf "$outdir"
  echo "[gates] Verify $sfdir..."
  sbt -batch "runMain graft.Verify $sfdir $outdir" >"$log" 2>&1 || {
    echo "FATAL: Verify failed at $sfdir (log: $log)" >&2; exit 1; }
  local verr
  verr=$(grep -c "^\[verify\] .* failed:" "$log" || true)
  echo "[gates] oracle $sfdir..."
  DUCKDB_MEM="${3:-}" python3 tools/check_oracle.py "$sfdir" "$outdir" >>"$log" 2>&1
  local want
  want=$(python3 -c "import json;print(len(json.load(open('$outdir/oracle_sql.json'))))")
  local tail_line
  tail_line=$(grep -E "^[0-9]+ passed, [0-9]+ failed" "$log" | tail -1)
  local got_pass got_fail
  got_pass=$(echo "$tail_line" | sed -E 's/^([0-9]+) passed.*/\1/')
  got_fail=$(echo "$tail_line" | sed -E 's/.* ([0-9]+) failed/\1/')
  if [ "$got_fail" != "0" ] || [ "$got_pass" != "$want" ]; then
    echo "FATAL: $tag gate tail '$tail_line' != expected '$want passed, 0 failed' (log: $log)" >&2
    exit 1
  fi
  local rows_only
  rows_only=$(grep -c "^ROWS-ONLY" "$log" || true)
  {
    echo ""
    echo "## GATE $tag (full battery, ONE invocation, code=$HEAD_SHA) — tail"
    grep "^ROWS-ONLY" "$log" | tail -2
    echo ""
    echo "$tail_line"
    echo "rows-only entries processed cleanly: $rows_only"
    echo "[gates] assert: $got_pass passed == $want oracleSql entries declared by this Verify dump"
    [ "$tag" = "sf1" ] && echo "[verify] errors during sf1 Spark dump: $verr"
  } >>"$OUT"
}

{
  echo ""
  echo "## Suite (final code, code=$HEAD_SHA, captured by tools/run_gates.sh AFTER the last commit)"
  echo "$SUITE_LINE"
} >>"$OUT"

run_gate /root/testdata/sf0.01 sf0.01 ""
if [ -f /root/testdata/sf1/lineitem.parquet ]; then
  run_gate /root/testdata/sf1 sf1 48GB
elif [ -f testdata/sf1/lineitem.parquet ]; then
  run_gate testdata/sf1 sf1 48GB
else
  echo "[gates] no sf1 data found — sf1 gate skipped" | tee -a "$OUT"
fi
echo "[gates] all green; tails appended to $OUT (commit it as the round's LAST commit)"
