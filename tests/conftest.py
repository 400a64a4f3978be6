"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's de-facto "single-process test path" (launch.py world_size==1
fallback) but TPU-natively: multi-chip sharding is exercised via
``--xla_force_host_platform_device_count`` without real hardware (SURVEY.md §4).

The environment may pre-register a TPU PJRT plugin through sitecustomize (jax is
already imported by the time conftest runs), so the platform override must go
through ``jax.config`` rather than env vars.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="include tests marked slow (overrides the default "
                          "-m 'not slow' filter)")


def pytest_configure(config):
    # --runslow neutralizes the default marker filter from pytest.ini
    if config.getoption("--runslow") and config.option.markexpr == "not slow":
        config.option.markexpr = ""
