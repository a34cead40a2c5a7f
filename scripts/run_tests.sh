#!/bin/bash
# Full-suite runner resilient to this host's flaky XLA:CPU toolchain: the
# largest interpret-mode programs nondeterministically SIGSEGV/SIGABRT
# inside LLVM codegen (backend_compile_and_load) or PJRT serialize
# (persistent-cache write) — see CLAUDE.md.  conftest.py already forces
# single-split codegen; this script additionally runs each test FILE in its
# own pytest process: attempt 1 with cache writes on (banks entries),
# attempts 2-3 with writes DISABLED (RAYTRACE_TESTS_CACHE_WRITES=0), which
# bypasses the crashy serialize path entirely so a deterministic
# serialize-crash cannot block a green run.
cd "$(dirname "$0")/.."
overall=0
for f in tests/test_*.py; do
  ok=""
  for i in 1 2 3; do
    if [ "$i" -eq 1 ]; then
      RAYTRACE_TESTS_CACHE_WRITES=1 python -m pytest "$f" -q "$@"
    else
      RAYTRACE_TESTS_CACHE_WRITES=0 python -m pytest "$f" -q "$@"
    fi
    rc=$?
    if [ $rc -eq 0 ]; then ok=1; break; fi
    case $rc in
      132|134|139) echo "$f attempt $i crashed (rc=$rc); retrying" >&2 ;;
      *) echo "$f FAILED (rc=$rc)" >&2; overall=$rc; ok=1; break ;;
    esac
  done
  [ -z "$ok" ] && { echo "$f still crashing after 3 attempts" >&2; overall=1; }
done
exit $overall
