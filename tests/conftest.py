# -*- coding: utf-8 -*-
"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding logic is exercised without TPU hardware via XLA's host-platform
device-count flag, as recommended for JAX distributed testing.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Site hooks may register accelerator PJRT plugins and programmatically set
# jax.config.jax_platforms, which overrides the env var above — pin the config
# itself so the suite can never claim an attached accelerator.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_ROOT = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_ROOT, *parts)
