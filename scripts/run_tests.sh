#!/usr/bin/env bash
# Run the test suite ONE MODULE PER PROCESS.
#
# A monolithic `pytest tests/` run takes ~35 minutes on this single-core
# host and intermittently segfaults INSIDE the XLA:CPU compiler or its AOT
# executable (de)serialization (5 observed crashes across different
# modules: compilation_cache get/put, backend_compile_and_load — including
# one compile racing engine worker threads), while every module passes
# standalone in a fresh process. This runner reproduces the proven-green
# condition: a fresh interpreter per module, identical functional coverage.
#
# Usage: bash scripts/run_tests.sh  [pytest extra args...]
set -u
cd "$(dirname "$0")/.."
fail=0
failed_modules=""
total_pass=0
start=$(date +%s)
for f in tests/test_*.py; do
  out=$(python -m pytest "$f" -q "$@" 2>&1)
  rc=$?
  line=$(echo "$out" | grep -E "[0-9]+ (passed|failed|error)" | tail -1)
  echo "$f: ${line:-no result (rc=$rc)}"
  n=$(echo "$line" | grep -oE "[0-9]+ passed" | grep -oE "[0-9]+" || echo 0)
  total_pass=$((total_pass + n))
  if [ $rc -ne 0 ]; then
    fail=1
    failed_modules="$failed_modules $f"
    echo "$out" | tail -30
  fi
done
echo "---"
echo "total: $total_pass passed in $(( $(date +%s) - start ))s"
if [ $fail -ne 0 ]; then
  echo "FAILED modules:$failed_modules"
  exit 1
fi
echo "ALL MODULES PASSED"
