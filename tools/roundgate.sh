#!/usr/bin/env bash
# End-of-round gate: correctness + cross-run determinism in one command.
#
#   tools/roundgate.sh [sfDir]        (default /root/testdata/sf0.01)
#
# Runs graft.Verify TWICE into fresh dirs, cross-checks the first dump
# against the DuckDB oracle (the driver's gate), then diffs the two
# dumps with tools/determinism.py so partition-order/RNG
# nondeterminism cannot land silently even when one run happens to
# agree with the oracle. Exits nonzero on any failure. Record the
# result in PERF.md at round close.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
R1=$(mktemp -d /tmp/graft_gate_r1.XXXX)
R2=$(mktemp -d /tmp/graft_gate_r2.XXXX)
LOG=$(mktemp /tmp/graft_gate_log.XXXX)
trap 'rm -rf "$R1" "$R2" "$LOG"' EXIT

run_verify() {
  sbt -batch "runMain graft.Verify $SF $1" > "$LOG" 2>&1 || { tail -20 "$LOG"; exit 1; }
  if grep -qE "\[verify\].*failed" "$LOG"; then
    grep -E "\[verify\].*failed" "$LOG"
    exit 1
  fi
}

echo "== verify run 1 =="; run_verify "$R1"
echo "== verify run 2 =="; run_verify "$R2"
echo "== oracle cross-check =="
python3 tools/check.py "$R1" "$SF" | tail -2
echo "== cross-run determinism =="
python3 tools/determinism.py "$R1" "$R2" | tail -2
