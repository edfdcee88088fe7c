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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
