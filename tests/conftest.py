"""Test harness config: force a deterministic 8-device CPU JAX platform.

The container's sitecustomize imports jax and registers a TPU plugin at
interpreter startup, so env vars are too late — use jax.config instead (valid
until the first backend initialization, which tests have not done yet).  The
virtual 8-device CPU mesh is how multi-chip sharding is validated without
TPU hardware (the driver separately dry-runs ``__graft_entry__.dryrun_multichip``).
"""

import os
import pathlib

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "parallel_codegen" not in _flags:
    # XLA:CPU's parallel LLVM codegen segfaults/aborts nondeterministically
    # on this host's jaxlib for the largest interpret-mode programs (crash
    # stacks in backend_compile_and_load and executable.serialize); single-
    # split codegen compiles slower but has not crashed (CLAUDE.md)
    _flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the wavefront while-loop takes ~10-70 s to compile
# on CPU; cache makes repeat test runs fast.  WRITES are gated behind an env
# knob because PJRT CPU executable.serialize() aborts/segfaults
# nondeterministically on large fresh executables (CLAUDE.md) — reads are
# always safe.  scripts/run_tests.sh warms the cache on attempt 1 (writes
# on) and falls back to writes-off retries for a guaranteed green run.
#
# The cache dir is keyed by this host's CPU feature flags: XLA's cache key
# does NOT include host machine features, so an entry AOT-compiled on a
# different host loads here with different codegen (fma contraction
# differs) — mixing such loads with fresh compiles broke cross-graph
# bitwise tests and can SIGILL outright (CLAUDE.md "prefer-no-gather"
# note).  A per-microarch subdirectory makes that mix impossible: a new
# host starts cold and stays self-consistent.


def _host_tag():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine()


_cache = (pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
          / f"cpu-{_host_tag()}")
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
if os.environ.get("RAYTRACE_TESTS_CACHE_WRITES", "1") == "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:  # reads only: nothing ever reaches the crashy serialize path
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
