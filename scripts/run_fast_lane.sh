#!/bin/bash
# Fast test lane, batched per test file.
#
# Motivation: on the axon box, XLA's persistent-compile-cache serializer
# aborts/segfaults nondeterministically late in LONG single-process runs
# (hundreds of compiled executables) — see memory notes. Per-file pytest
# processes bound the blast radius: a crash costs one file, and the shared
# compile cache in .jax_cache keeps all completed work warm.
#
# Usage: scripts/run_fast_lane.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
# unlimited stack BEFORE exec: the kernel then uses the bottom-up mmap
# layout, so no mapping lands under the main stack and the cache
# serializer's deep recursion can actually grow it (the runtime setrlimit
# in conftest.py cannot move mappings that already block growth)
ulimit -s unlimited 2>/dev/null || true
fail=0
summary=""
for f in tests/test_*.py; do
    out=$(PYTHONUNBUFFERED=1 python -u -m pytest "$f" -q -m "not slow" "$@" 2>&1)
    rc=$?
    line=$(echo "$out" | grep -aE "passed|failed|error|no tests ran" | tail -1)
    echo "$f: rc=$rc $line"
    summary="$summary$f: rc=$rc $line"$'\n'
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        fail=1
        echo "$out" | grep -aE "FAILED|Fatal|Error" | head -10
    fi
done
echo "=================================================="
echo "$summary" | grep -acE "rc=0" | xargs echo "files green:"
exit $fail
