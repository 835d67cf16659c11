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

# Bench-of-record contention guard (r14 verdict #3, five rounds of the
# same paper cut): refuse to close the round while the working tree
# holds an UNCOMMITTED BENCH_FULL.json whose own self-diagnosis
# (anchor drift, wide spreads) marks the run as contended — the idle
# record must be restored (git checkout BENCH_FULL.json) or re-measured
# idle before it may land.
echo "== bench-of-record contention guard =="
python3 - <<'EOF'
import json, subprocess, sys
try:
    raw = open('BENCH_FULL.json').read()
    cur = json.loads(raw)
except (FileNotFoundError, ValueError):
    sys.exit(0)
head = subprocess.run(['git', 'show', 'HEAD:BENCH_FULL.json'],
                      capture_output=True, text=True)
prev = None
if head.returncode == 0:
    try:
        prev = json.loads(head.stdout)
    except ValueError:
        prev = None
# coverage guard: a subset dump (Bench invoked with query-name args
# while iterating) must never replace the full-surface record
if prev and len(cur.get('queries', {})) < len(prev.get('queries', {})):
    print(f"REFUSING to close: working-tree BENCH_FULL.json covers "
          f"{len(cur.get('queries', {}))} queries but the committed record "
          f"covers {len(prev.get('queries', {}))} — a subset timing dump. "
          "Restore it: git checkout BENCH_FULL.json")
    sys.exit(1)
drift = cur.get('anchor_drift', -1)
spreads = cur.get('spread_min_max', {}) or {}
# a spread whose max runs >2.5x its (non-trivial) min marks contention
wide = [k for k, v in spreads.items()
        if isinstance(v, list) and len(v) == 2
        and v[0] > 0.5 and v[1] > 2.5 * v[0]]
contended = (drift != -1 and drift > 1.3) or len(wide) >= 2
if not contended:
    print('bench-of-record: idle by its own self-diagnosis'
          f' (drift={drift}, wide spreads={len(wide)})')
    sys.exit(0)
if head.returncode == 0 and head.stdout.strip() == raw.strip():
    print('bench-of-record: contended but already committed (process '
          'note for the round log; re-measure idle when possible)')
    sys.exit(0)
print(f'REFUSING to close: uncommitted BENCH_FULL.json marks contention '
      f'(anchor_drift={drift}, wide spreads={wide[:4]}).')
print('Restore the idle record (git checkout BENCH_FULL.json) or '
      're-run the bench on an idle machine before closing.')
sys.exit(1)
EOF
