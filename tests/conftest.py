"""Test env: force an 8-virtual-device CPU platform before JAX imports.

Mirrors the reference's test seam (fake backends on CPU, reference:
test/conftest.py) the JAX way: tiny real models on virtual CPU devices, so
multi-device sharding tests run without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may pre-register an accelerator platform
# before conftest runs; force CPU at the config level too (must happen
# before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
