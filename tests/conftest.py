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

# Persistent XLA compile cache (same .jax_cache as bench.py; entries are
# keyed on HLO + platform so CPU test programs and TPU bench programs
# coexist).  Much of the suite's wall time on this 1-core host is XLA
# compilation — a warm cache loads heavy train-step executables ~5x faster
# (37s -> 7s for the 32^2 pretrain step; the finetune CLI e2e test drops
# 106s -> 75s), identical numerics, and any source change to the package
# changes the HLO and misses cleanly.  XLA:CPU's AOT loader logs a noisy
# (harmless, same-host) pseudo-feature mismatch line per hit; pytest's fd
# capture keeps it out of passing-test output.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

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
