"""Test env: force an 8-virtual-device CPU platform before JAX imports.

Mirrors the reference's test seam (fake backends on CPU, reference:
test/conftest.py) the JAX way: tiny real models on virtual CPU devices, so
multi-device sharding tests run without TPU hardware.
"""

import os
import resource
import sys

# XLA:CPU compilation of the deepest nested-while programs (tridecoding's
# tri-level loop) recurses close to the default 8 MB main-thread stack —
# observed as a segfault inside backend_compile_and_load partway through
# the suite. Linux grows the main stack up to the rlimit, so raising it
# early is sufficient.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 256 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (_want if _hard == resource.RLIM_INFINITY else min(_want, _hard),
             _hard),
        )
    except (ValueError, OSError):
        pass

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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules. The suite compiles
    hundreds of programs in one process; late-suite compiles were crashing
    (SIGSEGV/SIGABRT inside XLA:CPU backend_compile_and_load) once the
    accumulated JIT state grew large enough — dropping dead executables
    keeps the compiler healthy at a small recompile cost."""
    yield
    jax.clear_caches()
