"""Test harness: force an 8-device virtual CPU platform before JAX is imported.

Mirrors the reference's absence of any test suite with the test strategy from
SURVEY.md §4: golden-value unit tests on CPU, mesh tests on a virtual 8-device
mesh (so multi-chip sharding is validated without TPU hardware).
"""
import os
import sys

# Disable the axon TPU PJRT plugin for tests: its registration (sitecustomize)
# dials the TPU tunnel even when JAX_PLATFORMS=cpu and can hang if the single
# device grant is busy. Tests are CPU-only by design.
#
# Setting env here is TOO LATE for the current interpreter — sitecustomize
# already registered the plugin at startup. So: unless we're the re-exec'd
# child (sentinel set), re-exec pytest with the env forced so the fresh
# interpreter never touches the TPU and sees 8 virtual CPU devices.
_ENV = {
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
}
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=8")
_ENV["XLA_FLAGS"] = " ".join(_flags)

# persistent XLA compile cache: the suite is compile-dominated (model zoo
# inits, fixpoint post-proc); repeat runs hit the cache and finish in a
# fraction of the cold time
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    _ENV["JAX_COMPILATION_CACHE_DIR"] = "/tmp/cdnet_jax_cache_cpu"
    _ENV["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "2"

os.environ.update(_ENV)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy test (deselect with -m 'not slow')")
    config.addinivalue_line(
        "markers", "slowtrain: multi-step training-loop test — the runtime-"
        "dominated third of the slow gate (run with -m slowtrain)")
    config.addinivalue_line(
        "markers", "slowzoo: full-model-zoo init/forward contract test — the "
        "trace-dominated third of the slow gate (run with -m slowzoo)")
    if os.environ.get("CDNET_TEST_REEXEC") != "1":
        # sitecustomize imported jax at startup of THIS interpreter, so the
        # env above came too late: re-exec pytest. Restore the real stdout/
        # stderr fds first (pytest's fd-capture is already active here and
        # the child would otherwise write into an orphaned tempfile).
        os.environ["CDNET_TEST_REEXEC"] = "1"
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        sys.stdout.flush(); sys.stderr.flush()
        os.execv(sys.executable,
                 [sys.executable, "-m", "pytest", *sys.argv[1:]])


def pytest_collection_modifyitems(config, items):
    # Fail-loud guard: mesh tests require the 8-wide virtual CPU platform.
    import jax
    if jax.devices()[0].platform != "cpu" or len(jax.devices()) < 8:
        raise RuntimeError(
            f"test harness requires 8 virtual CPU devices, got "
            f"{len(jax.devices())} {jax.devices()[0].platform} — conftest "
            f"re-exec failed")


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same fresh stream, so test data
    # never depends on execution order or on which other tests ran first
    # (a shared session RandomState made test_fast_dice2_oracle's masks
    # depend on how many draws earlier tests consumed)
    return np.random.RandomState(2022)
