"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices, and the
driver separately dry-run-compiles the multi-chip path (__graft_entry__.py).
Must set env BEFORE importing jax anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (tunneled TPU);
# tests must run on the virtual CPU mesh, so override after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
