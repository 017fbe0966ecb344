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
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
