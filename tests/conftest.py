"""Test harness: force an 8-device virtual CPU mesh before jax imports.

SURVEY.md §4 "Distributed tests without a cluster": all tests run on CPU with
``xla_force_host_platform_device_count=8`` so pjit/sharding paths are
exercised in plain pytest without TPU hardware.
"""

import os

# Force-override: the environment may pre-set JAX_PLATFORMS=axon (real TPU
# tunnel); tests must run on the virtual CPU mesh. Set SSD_TPU_TEST_REAL=1
# to run the @pytest.mark.tpu tests against the real chip instead.
if not os.environ.get("SSD_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: the suite compiles dozens of small CPU
# programs; caching them across runs cuts wall time several-fold.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ssd_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# REPLACE (not append) XLA_FLAGS: the ambient environment may carry
# numerics-affecting flags (e.g. --xla_allow_excess_precision from the TPU
# relay) that flip near-tie detection orderings and break golden tests.
if not os.environ.get("SSD_TPU_TEST_REAL"):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

# The TPU-relay sitecustomize imports jax at interpreter startup, BEFORE
# this file runs — env vars alone are then too late (jax snapshots them at
# import). Force the platform through the live config object as well.
if not os.environ.get("SSD_TPU_TEST_REAL"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
