#!/bin/sh
# Mechanical end-of-round gate (VERDICT r4 #3): run BEFORE the snapshot
# commit.  Fails fast if either the unit suite or the full queries()-vs-
# oracle sweep at sf0.001 is red, so an analysis-time break (the r4
# unix_micros regression) can never reach the driver unseen.
#
#   sh tools/round_gate.sh            # full gate (~4 min on local[16])
#   sh tools/round_gate.sh sf0.01     # sweep at a different SF
set -e
cd "$(dirname "$0")/.."
echo "== round gate: pytest =="
python -m pytest tests/ -q
echo "== round gate: oracle sweep (${1:-sf0.001}) =="
python3 tests/oracle_check.py "${1:-sf0.001}"
echo "== round gate: cumulative coverage fold =="
python3 tools/coverage_report.py
echo "== round gate: GREEN =="
