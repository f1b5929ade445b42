"""Test harness: force an 8-device virtual CPU platform before JAX is imported.

Mirrors the reference's absence of any test suite with the test strategy from
SURVEY.md §4: golden-value unit tests on CPU, mesh tests on a virtual 8-device
mesh (so multi-chip sharding is validated without TPU hardware).
"""
import os

# Disable the axon TPU PJRT plugin for tests: its registration (sitecustomize)
# dials the TPU tunnel even when JAX_PLATFORMS=cpu and can hang if the single
# device grant is busy. Tests are CPU-only by design.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(2022)
