"""Test configuration: force an 8-device virtual CPU platform so collective /
mesh tests exercise real multi-device sharding without TPU hardware (the
idiomatic JAX way to test "multi-chip" code paths).

Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough — the platform must be overridden through jax.config
after import (before any backend is initialized).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    """Default profile: deselect the `slow` tier (multi-stage quality gates,
    the 60-step torch trajectory) from whole-directory runs.

    Deliberately NOT an addopts marker filter: when the invocation names a
    file or node id explicitly (`pytest tests/test_quality_gate.py`), the
    developer asked for those tests and gets them.  Any explicit -m
    expression (e.g. the FULL profile's -m "slow or not slow") also takes
    precedence.
    """
    if config.option.markexpr:
        return
    if any(not os.path.isdir(str(a).split("::")[0]) for a in config.args):
        return
    slow = [it for it in items if it.get_closest_marker("slow")]
    if slow:
        config.hook.pytest_deselected(items=slow)
        items[:] = [it for it in items if not it.get_closest_marker("slow")]
