"""Test harness: force an 8-device virtual CPU platform BEFORE jax backends
initialize (SURVEY.md §4c — sharding tests without a cluster)."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the suite free of the persistent compilation cache: the CLI mains
# (exercised by test_cli) would otherwise enable it PROCESS-GLOBALLY, and
# every later trained-metric fixture would depend on the mutable
# ~/.jax_cache contents (cached CPU executables built with machine
# features this host lacks load with "may miscompute" warnings — the
# round-4 golden flake). See cli/train.py.
os.environ["EASYDGL_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# belt-and-braces: the XLA_FLAGS device-count env is parsed once at first
# backend init and can be lost under preconfigured accelerator plugins;
# this config achieves the same pre-init and is plugin-independent
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def rng():
    return np.random.RandomState(1234)
