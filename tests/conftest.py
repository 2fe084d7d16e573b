"""Test configuration: force an 8-virtual-device CPU JAX platform.

The environment registers a TPU ("axon") PJRT plugin via sitecustomize and
programmatically sets ``jax_platforms="axon,cpu"``, so a plain
``JAX_PLATFORMS=cpu`` env var is not enough — we must override the jax
config after import (before any backend is initialized) and inject the
host-device-count XLA flag first.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
