"""Test config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4.4: the box has a single real TPU chip, so multi-chip sharding
is tested with ``xla_force_host_platform_device_count=8`` fake CPU devices —
the TPU-native analog of a fake backend. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The box's sitecustomize (axon PJRT boot) force-sets jax_platforms to
# "axon,cpu" regardless of env; override it back before any backend is
# touched so tests run hermetically on the 8 virtual CPU devices.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has ONE CPU core, so cold XLA
# compiles of the R50 train step dominate test wall time. The cache makes
# every re-run (and every new pytest process) hit compiled artifacts.
# Host-scoped (detjax.utils.cache.host_fingerprint): XLA:CPU entries are
# AOT machine code for the COMPILING host's CPU features; after this box
# migrated microarchitectures, loading the old entries SIGABRT'd the
# suite mid-run (cpu_aot_loader feature-mismatch → SIGILL class). A new
# host now simply starts a fresh cache subdir.
from detjax.utils.cache import host_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_test_cache/host-{host_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Release compiled executables after every test module.

    Each XLA:CPU executable holds JIT code pages and buffers as separate
    memory mappings; with ~186 tests compiling in one process the map
    count crosses vm.max_map_count (65530 here) late in the suite, and
    the next mmap — inside the persistent compile cache's READ path —
    fails and segfaults natively (measured: 65459 maps right before the
    crash, fds/threads flat; see the DETJAX_DIAG_RES hook below).
    Clearing jax's in-memory caches frees the executables; the disk
    compile cache makes any cross-module re-jit a cheap cache hit.
    """
    yield
    jax.clear_caches()


# Opt-in per-test resource telemetry (DETJAX_DIAG_RES=<path>): appends one
# line per test with the process's open-fd / memory-mapping / thread
# counts. Added to chase a full-suite-only segfault inside the persistent
# compile cache's READ path — if a count plateaus at a system limit right
# before the crash, the leak (not the crashing test) is the bug.
_DIAG_PATH = os.environ.get("DETJAX_DIAG_RES")
if _DIAG_PATH:

    @pytest.hookimpl(hookwrapper=True)
    def pytest_runtest_teardown(item, nextitem):
        yield
        try:
            n_fds = len(os.listdir("/proc/self/fd"))
            with open("/proc/self/maps") as f:
                n_maps = sum(1 for _ in f)
            with open("/proc/self/status") as f:
                threads = next(
                    (line.split()[1] for line in f
                     if line.startswith("Threads:")), "?")
            with open(_DIAG_PATH, "a") as f:
                f.write(f"{n_fds}\t{n_maps}\t{threads}\t{item.nodeid}\n")
        except OSError:
            pass
