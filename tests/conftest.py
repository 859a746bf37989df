"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding tests emulate an N-device mesh on one host
(SURVEY.md §4: "multi-chip tests can run on one host with
xla_force_host_platform_device_count"); bench.py (not the tests) runs on the
real TPU chip.
"""

import os

# NOTE: this environment pre-imports jax via sitecustomize and pins
# JAX_PLATFORMS=axon (the TPU tunnel), so plain env vars are ignored; the
# config update below is what actually forces the CPU backend for tests.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import jax

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is intentionally NOT enabled here —
# XLA:CPU's executable.serialize() segfaults flakily on this machine
# (machine-feature mismatch in the AOT path).  The TPU cache used by
# bench.py (.jax_cache_tpu) is unaffected.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    """Deterministic RNG, mirroring the reference's `ark_std::test_rng()`."""
    return random.Random(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU flakily segfaults when compiling large programs late in a
    long-lived process; clearing compiled-computation caches between test
    modules keeps compiler state bounded."""
    yield
    jax.clear_caches()
