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
