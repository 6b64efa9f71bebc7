"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of the reference's fake-backend test strategy
(SURVEY.md §4): multi-chip sharding paths are exercised without a pod by
forcing the host platform to expose 8 XLA CPU devices. The benchmark
(bench.py) is what runs on real TPU hardware.

Note: some environments preconfigure a TPU PJRT plugin at interpreter start
(sitecustomize) and force `jax_platforms` via config, so an env var alone is
not enough — we update the config and clear any initialized backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover - older jax versions
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
