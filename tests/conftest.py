"""Test config: force the CPU backend with 8 virtual devices.

Tests run on CPU (fast, deterministic); multi-chip sharding tests use the
8-device virtual mesh (SURVEY.md §4 test-plan note). Must run before any jax
import. Bench runs (bench.py) use the real TPU chip instead.
"""
import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")


DATA = os.path.join(os.path.dirname(__file__), "..", "data", "small")


@pytest.fixture(scope="session")
def data_dir():
    return DATA


@pytest.fixture(scope="session")
def chesapeake():
    from graphblast_tpu import Matrix

    return Matrix.from_mtx(os.path.join(DATA, "chesapeake.mtx"))


@pytest.fixture(scope="session")
def test_cc():
    from graphblast_tpu import Matrix

    return Matrix.from_mtx(os.path.join(DATA, "test_cc.mtx"))


@pytest.fixture(scope="session")
def test_pr():
    from graphblast_tpu import Matrix

    return Matrix.from_mtx(os.path.join(DATA, "test_pr.mtx"))


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
