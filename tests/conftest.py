"""Test configuration: force a virtual 8-device CPU mesh.

NOTE: in the axon-tunnel image, a sitecustomize imports jax at interpreter
startup with JAX_PLATFORMS=axon already captured, so setting the env var
here is too late — jax.config.update is the reliable override.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
