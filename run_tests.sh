#!/bin/bash
# Run the test suite one file per process: the full suite in a single process
# accumulates JAX CPU jit caches/arrays across ~100 tests and can exhaust
# memory. Exit code 0 iff every file passes.
set -u
FAILED=0
for f in tests/test_*.py; do
  echo "=== $f"
  timeout 1200 python -m pytest "$f" -q --no-header 2>&1 | tail -2
  code=${PIPESTATUS[0]}
  if [ "$code" -ne 0 ]; then
    echo "FAILED: $f (exit $code)"
    FAILED=1
  fi
done
exit $FAILED
