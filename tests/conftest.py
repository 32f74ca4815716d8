"""Test configuration: force an 8-device virtual CPU platform.

Tests validate numerics and sharding on CPU (SURVEY.md §4 implication);
the real-TPU path is exercised by bench.py and __graft_entry__.py.
Must run before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize may import jax (pinning the platform to
# the TPU tunnel) before this file runs; the config update below wins
# regardless, as backends initialize lazily.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xA3F1)
