"""Test harness config: CPU backend with 8 virtual devices (simulated TPU
mesh, SURVEY.md section 4 item 4) and fp64 enabled so numpy oracles are exact.

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
the platform must be forced through jax.config after import. XLA_FLAGS must
still be set before the first backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"
assert jax.local_device_count() == 8

# ---- fast/slow split -----------------------------------------------------
# `pytest -m 'not slow'` is the fast gate. Slow tests (>~8 s measured on the
# 1-core CPU image) are listed in tests/slow_tests.json — regenerate from a
# full `--durations` run when the suite's shape changes; parity-gate tests
# are always slow-marked (they have their own `-m parity` entry point).
import json  # noqa: E402

import pytest  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_here, "slow_tests.json")) as _f:
    # normalize to "test_file.py::test_name" (path prefixes vary with the
    # pytest invocation directory)
    _SLOW = frozenset(os.path.basename(p.split("::", 1)[0]) + "::"
                      + p.split("::", 1)[1] for p in json.load(_f))


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        path, _, name = base.partition("::")
        if (os.path.basename(path) + "::" + name in _SLOW
                or "test_parity_gate" in path):
            item.add_marker(pytest.mark.slow)


# ---- one-process-suite LLVM-state workaround -----------------------------
# A single process running the whole suite segfaults in XLA:CPU's LLVM
# compile after ~280 tests (see CLAUDE.md round 4). Dropping accumulated
# executables periodically keeps the compiler state small. ON by default
# (every 100 tests; verified 458-green in one process) so a bare
# `python -m pytest tests/ -q` works; opt out with
# NNGP_TEST_CLEAR_CACHES_EVERY=0 (slightly faster, needs two shards).
_CLEAR_EVERY = int(os.environ.get("NNGP_TEST_CLEAR_CACHES_EVERY", "100"))
_test_counter = [0]

if _CLEAR_EVERY > 0:
    @pytest.fixture(autouse=True)
    def _periodic_jax_cache_clear():
        yield
        _test_counter[0] += 1
        if _test_counter[0] % _CLEAR_EVERY == 0:
            jax.clear_caches()
