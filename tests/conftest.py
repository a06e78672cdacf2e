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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute interpret-mode goldens (big shapes / full "
        "variant sweeps). Skipped by default; run with GRB_RUN_SLOW=1 or "
        "--runslow. The smoke tier keeps a small-n case of every kernel, "
        "so default runs still cover each code path.")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow-marked interpret goldens")


def pytest_collection_modifyitems(config, items):
    if (config.getoption("--runslow")
            or os.environ.get("GRB_RUN_SLOW", "0") == "1"):
        return
    skip = pytest.mark.skip(reason="slow tier: GRB_RUN_SLOW=1 or --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler segfaults (backend_compile_and_load) after a few
    hundred accumulated compiled executables in one process — observed three
    times on 2026-08-19, always on a late big Pallas-interpret compile
    (test_pallas reached last in the full suite). Dropping compiled programs
    between modules keeps the per-process live-executable count bounded;
    shared small programs recompile cheaply."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


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
