"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Multi-chip code paths are validated the way SURVEY.md section 4 prescribes for
"multi-node without a real cluster": shard_map over a virtual device mesh.
Must set flags before jax is imported anywhere.
"""

import os

# NOTE: this environment pins JAX_PLATFORMS=axon and a sitecustomize imports
# jax + registers the (single-tenant) TPU in every interpreter, so env-var
# overrides are ineffective — force CPU through jax.config instead.  Tests
# must never share the TPU tunnel: two concurrent processes deadlock on the
# device claim.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is deliberately NOT enabled here:
# jax 0.9's CPU-backend executable deserialization segfaults when reading
# cache entries (observed repeatedly on this host).  bench.py still uses the
# cache on the TPU backend, where the read path is different.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_state():
    """Clear jit/executable caches between test modules.

    The XLA CPU backend segfaults in backend_compile after ~50 of this
    suite's very large kernel compiles accumulate in one process (observed
    repeatedly at tests/test_kzg_gntt.py in full-suite runs; the same file
    passes in isolation).  See KNOWN_ISSUES.md for the localization status.
    Cross-module cache hits are rare anyway — each module exercises its own
    shapes.  Set AP_TEST_NO_CLEAR=1 to disable (repro experiments)."""
    yield
    if os.environ.get("AP_TEST_NO_CLEAR") == "1":
        return
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    import random

    return random.Random(0xA1607)
