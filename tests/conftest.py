"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: the reference has no executed tests (lint-only); our strategy
is op-level goldens vs pure-jnp references plus GSPMD/collective tests on a
faked multi-device CPU backend, so the full suite runs anywhere without a
TPU pod.
"""

import os

# NOTE: in some environments a site hook imports jax at interpreter startup
# and pins the accelerator platform, so env-var-only selection is too late.
# Setting XLA_FLAGS before the CPU client is instantiated and then forcing
# jax_platforms=cpu reliably yields an 8-virtual-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped with a fixed seed: every test sees the same stream no
    # matter which subset of the suite runs or in what order (a
    # session-scoped stream makes numeric thresholds order-dependent).
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return devs[:8]
