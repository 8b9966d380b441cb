"""Test configuration: force an 8-device virtual CPU mesh before jax initializes.

This gives real SPMD coverage with no TPU (SURVEY §4 'consequence for the rebuild'):
sharding/pjit tests run against 8 fake CPU devices."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (registered by /root/.axon_site/sitecustomize.py at
# interpreter start) ignores JAX_PLATFORMS; force the platform via jax.config,
# which must happen before any backend use.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = pathlib.Path("/root/reference")

import pytest


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference tree not available")
    return REFERENCE_DIR
