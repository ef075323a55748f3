"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the sharded (multi-chip) code
paths are exercised without TPU hardware — the TPU-world analog of the
reference's "reduced-size config" test strategy (SURVEY.md §4). The real-TPU
bench path is exercised separately by ``bench.py``.
"""

import os
import sys

# 8 virtual CPU devices for mesh/sharding tests. Must be set before the XLA
# backend initializes (lazily, on first jax use).
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; an explicit config update wins.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))


@pytest.fixture(scope="session")
def reference_src():
    """Import the reference implementation (read-only, for numeric parity
    gates). Skips when the reference checkout is absent."""
    if not reference_available():
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # the reference's benchmark package imports numba at module scope
    # (``numpy_renderer.py:7``); numba isn't in this image, so stub a no-op
    # ``@jit`` decorator — we never execute the numba kernels themselves.
    if "numba" not in sys.modules:
        import types

        numba_stub = types.ModuleType("numba")

        def _jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda f: f

        numba_stub.jit = _jit
        numba_stub.prange = range
        sys.modules["numba"] = numba_stub
    import src  # noqa: F401

    return src


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
