"""Test harness: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding is exercised on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) so the full pjit path
compiles and runs without TPU hardware; bench.py is the only thing that
requires the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup with
# jax_platforms already latched to the TPU relay; env vars alone are too
# late, so pin the platform through the config API before any backend
# initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tests.fixtures import make_synthetic_dataset  # noqa: E402


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """A synthetic ISIC-style image folder + metadata.csv."""
    root = tmp_path_factory.mktemp("tone")
    make_synthetic_dataset(str(root), n=48, seed=7)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
