"""Persistent XLA compilation cache setup.

Compiles on the tunneled TPU go through a remote-compile service and cost
60-130s for the fused codec graphs; the persistent cache makes that a
once-per-machine cost.  Call enable() before the first jit execution.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    """No-op on the axon-tunneled backend: persistent-cache deserialization
    hangs against the remote PJRT client (observed: executable loads never
    complete).  Kept as the hook point for directly-attached TPU hosts,
    enabled via JPEZY_TPU_COMPILE_CACHE=1."""
    if os.environ.get("JPEZY_TPU_COMPILE_CACHE") != "1":
        return
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "jpezy_tpu_xla"
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
