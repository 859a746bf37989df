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

import numpy as np
import pytest

# Persistent compilation cache: the limb-arithmetic kernels compile to large
# XLA programs; caching them across pytest runs keeps the suite fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


@pytest.fixture
def rng():
    """Deterministic RNG, mirroring the reference's `ark_std::test_rng()`."""
    return random.Random(12345)
