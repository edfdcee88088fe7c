"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY §4(d): multi-host behavior is validated with the same
single-controller code on fake CPU devices.

Note: this environment's sitecustomize registers a TPU platform and
pins ``jax_platforms`` before user code runs, so plain env vars are
not enough — the config must be updated after importing jax and
before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)


# -- slow-test gating (r05): the FD-heavy gradient/training tests cost
# ~28 min of the 39-minute suite on this 2-core host — a default loop
# that long stops being run before commits (the round-3 bench was lost
# to exactly that).  They stay first-class contracts: run them with
# ``pytest --runslow`` (or RUNSLOW=1) in CI / full verification.

def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (FD-heavy, full train steps)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: FD-heavy/long test, deselected by default; enable with "
        "--runslow or RUNSLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUNSLOW"):
        return
    skip = pytest.mark.skip(reason="slow (use --runslow / RUNSLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
