"""Persistent XLA compilation cache for the prover path.

Compile latency is the dominant fixed cost of this stack on the remote-tunnel
TPU (a 2^17 MSM pipeline costs ~2 min of jit, the four-step NTT kernels
minutes more); the JAX persistent cache amortizes that to one cold run per
(shape, kernel) tuple.  Enabled for the TPU backend only: the CPU backend's
executable deserialization segfaults when reading cache entries (jax 0.9,
observed repeatedly on this host — tests/conftest.py documents the same).

Mirrors the reference's checkpointing intent (serialize expensive compile
artifacts once — /root/reference/utils/utils.go:89-157), applied to the
artifact that is actually expensive here: the compiled executable.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotently enable the JAX persistent compile cache (TPU only).

    Returns True when active.  Opt out with AP_PERSIST_CACHE=0; cache
    directory overridable via AP_JAX_CACHE_DIR (default <repo>/.jax_cache).
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("AP_PERSIST_CACHE", "1") != "1":
        return False
    import jax

    if jax.default_backend() != "tpu":
        return False
    cache_dir = os.environ.get(
        "AP_JAX_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)
            ))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _enabled = True
    return True
