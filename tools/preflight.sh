#!/bin/bash
# Defaults-freeze preflight (VERDICT r4 #2): run before ANY end-of-round
# snapshot or after ANY change to FilterConfig/FrontendConfig defaults.
#
#   suite green  ->  bench green  ->  dryrun green (slam engaged)
#
# All three must pass at the SAME working tree. A default changed after the
# last preflight run is a red flag — re-run this script, not a sub-sweep.
#
# Usage: tools/preflight.sh [--skip-suite]
set -u
cd "$(dirname "$0")/.."
rc=0

if [ "${1:-}" != "--skip-suite" ]; then
  echo "=== [1/3] test suite ==="
  if ! python -m pytest tests/ -x -q; then
    echo "PREFLIGHT FAIL: test suite red"; exit 1
  fi
else
  echo "=== [1/3] test suite SKIPPED (--skip-suite) ==="
fi

echo "=== [2/3] bench (accuracy-gated fps) ==="
if ! python bench.py; then
  echo "PREFLIGHT FAIL: bench red (accuracy gate or crash)"; exit 1
fi

echo "=== [3/3] multichip dryrun (slam engagement asserted) ==="
if ! python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"; then
  echo "PREFLIGHT FAIL: dryrun red"; exit 1
fi

echo "PREFLIGHT OK: suite + bench + dryrun green at the current tree"
