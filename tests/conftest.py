"""Test harness config: run everything on a virtual 8-device CPU mesh so CI
needs no TPU (SURVEY.md §4 'fake CPU device path')."""

import os

# Must be set before jax imports anywhere in the test process. Force CPU even
# if the environment preset a TPU platform — tests run on the virtual mesh.
# VSE_TESTS_ON_TPU=1 opts out, for running the slow rec-quality gates on the
# real chip (tests/test_rec_quality.py — the committed GATES.json evidence);
# everything else is written for the virtual mesh and stays on CPU.
if not os.environ.get("VSE_TESTS_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("VSE_TESTS_ON_TPU"):
    # The axon sitecustomize registers the TPU plugin regardless of env
    # vars; the config update below reliably pins the default backend to
    # CPU.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
