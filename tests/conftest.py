"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (a real TPU tunnel); tests must
run on simulated CPU devices, and the env var alone is overridden by the
site customization -- so force it through jax.config as well.  XLA flags
must be set before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

# ---------------------------------------------------------------- fast/slow
# Fast tier (CI gate, <10 min on one quiet core):
#   python -m pytest tests/ -q -m "not slow"
# Full tier (~1 h): python -m pytest tests/ -q
# Slow = measured >15 s per test on this host (mostly interpret-mode
# Pallas kernel suites, multi-process cluster tests, and long fuzz
# differentials), EXCEPT one representative per subsystem kept fast.
# The list lives in tests/slow_tests.txt with regeneration notes.

_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
with open(_SLOW_FILE) as _f:
    _SLOW_NODES = {
        line.strip() for line in _f
        if line.strip() and not line.startswith("#")
    }


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (excluded by -m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.lstrip("./")
        if nodeid in _SLOW_NODES:
            item.add_marker(pytest.mark.slow)
