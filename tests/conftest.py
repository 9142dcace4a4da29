import os

# Force JAX onto a virtual 8-device CPU mesh for all tests: multi-chip
# sharding is validated without TPU hardware (see SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's axon sitecustomize force-registers the TPU backend via
# jax.config (overriding JAX_PLATFORMS env); force it back to the virtual
# 8-device CPU mesh for deterministic, offline-safe tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, jax.devices()

REFERENCE_DATA = "/root/reference/tests/data"


@pytest.fixture(scope="session")
def data_dir():
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def pyp_off_mtz(data_dir):
    return os.path.join(data_dir, "pyp_off.mtz")


@pytest.fixture(scope="session")
def pyp_2ms_mtz(data_dir):
    return os.path.join(data_dir, "pyp_2ms.mtz")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
