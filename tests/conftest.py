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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
