"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test session.
NOTE: in this environment JAX_PLATFORMS is overridden by the TPU plugin;
JAX_PLATFORM_NAME + an explicit config update are authoritative.
"""

import os

# ACT3D_TEST_TPU=1 skips the CPU pin so the on-hardware checks
# (tests/test_kernels_tpu.py) can reach the real chip:
#   ACT3D_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py -q
_want_tpu = os.environ.get("ACT3D_TEST_TPU") == "1"
if not _want_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")

from act3d_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _want_tpu:
    assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-model or multi-step)"
    )


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="include tests marked slow (overfit loops, flagship-dim "
        "packet rehearsals, multi-device equality at scale). Default "
        "run deselects them so the suite stays an iteration tool "
        "(~13 min measured r4); `pytest -q --slow` is the full suite "
        "(~27 min measured r4).",
    )


def pytest_collection_modifyitems(config, items):
    # deselect slow tests unless --slow or an explicit -m expression is
    # given; deselection (not skip) keeps the default summary free of
    # pending-looking skip lines
    if config.getoption("--slow") or config.getoption("-m"):
        return
    slow = [i for i in items if i.get_closest_marker("slow")]
    if slow:
        config.hook.pytest_deselected(items=slow)
        items[:] = [i for i in items if not i.get_closest_marker("slow")]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
