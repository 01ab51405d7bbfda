"""Test harness setup.

Must run before jax is imported anywhere: forces 8 virtual CPU devices so
mesh/sharding/halo tests run without a TPU pod (SURVEY.md §4.5).

Platform note (verified in SURVEY.md §4.5): the installed TPU ("axon")
platform plugin wins default-backend selection even under JAX_PLATFORMS=cpu,
so tests pin computation to the CPU backend explicitly — via the autouse
``jax.default_device`` fixture for single-device tests and via explicit
``jax.devices("cpu")`` meshes for sharding tests.  Tests marked ``tpu`` opt
out and run on the real chip when one is present.
"""

import os
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


def cpu_devices():
    return jax.devices("cpu")


def has_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: runs on the real TPU chip")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    if has_tpu():
        return
    skip = pytest.mark.skip(reason="no TPU available")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _default_to_cpu(request):
    """Pin tests to the CPU backend unless marked @pytest.mark.tpu."""
    if "tpu" in request.keywords:
        yield
        return
    with jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap the process's mmap count: XLA:CPU JIT code mappings accumulate
    ~1-2k /proc/<pid>/maps entries per test module, and once the process
    nears vm.max_map_count (65530 here) XLA's backend_compile SEGFAULTS
    on the next compile (reproduced 4x near the end of full ``-m ""``
    runs, 2026-08-21 — the crash follows the map count, not any specific
    test).  Dropping compiled executables at module teardown reclaims the
    mappings (measured 2687 -> 803) at the cost of cross-module
    recompiles of shared programs."""
    yield
    jax.clear_caches()
