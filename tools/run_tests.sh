#!/bin/bash
# Crash-isolated CPU test runner (VERDICT r3 weak #6 / next #8).
#
# The full suite compiles ~70 XLA programs on a 1-core host, and upstream
# XLA:CPU has a NONDETERMINISTIC `backend_compile` SIGSEGV (reproduced by
# both builder and judge mid test_robot_matrix; any solo rerun passes).
# A single pytest process therefore risks voiding a 40-60 min run.  This
# runner executes one pytest process PER TEST FILE: a segfault loses one
# file, which is retried once (the crash never reproduces deterministically
# on the compile path).  Genuine test failures are NOT retried.
#
#     bash tools/run_tests.sh            # whole suite, isolated
#     bash tools/run_tests.sh -k cloth   # extra args forwarded to pytest
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

PER_FILE_TIMEOUT=${AGT_TEST_TIMEOUT:-3600}   # robot_matrix alone is ~35 min
overall=0
declare -a failed

for f in tests/test_*.py; do
    rc=0
    for attempt in 1 2; do
        echo "=== $(date -u +%H:%M:%S) $f (attempt $attempt) ==="
        timeout "$PER_FILE_TIMEOUT" python -m pytest "$f" -q "$@"
        rc=$?
        [ "$rc" -eq 0 ] && break
        # pytest rc 1 = test failures (real signal: don't retry);
        # rc >= 128 = killed by signal (the upstream segfault), 124 =
        # timeout wrapper fired — both are environment faults: retry once
        if [ "$rc" -ge 124 ]; then
            echo "!! $f crashed (rc=$rc) — upstream XLA:CPU fault class; retrying"
            continue
        fi
        break
    done
    if [ "$rc" -ne 0 ]; then
        overall=1
        failed+=("$f(rc=$rc)")
        echo "FAILED: $f rc=$rc"
    fi
done

echo "==================================================================="
if [ "$overall" -eq 0 ]; then
    echo "suite green (crash-isolated, per-file subprocesses)"
else
    echo "suite FAILED: ${failed[*]}"
fi
exit "$overall"
