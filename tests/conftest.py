"""Test harness config: CPU backend with 8 fake devices.

Per SURVEY.md §5.2, every distributed code path is tested on a simulated
topology: 8 virtual CPU devices via --xla_force_host_platform_device_count.
Real-TPU runs are opt-in through the `tpu` marker (excluded by default in
pyproject.toml).

This file must set environment variables BEFORE jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU PJRT plugin at
# interpreter start and force-selects it, overriding the JAX_PLATFORMS env var
# set above. Override it back: CI tests run on (8 fake) CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
