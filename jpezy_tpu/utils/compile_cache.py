"""Persistent XLA compilation cache setup.

Round-2 finding (scripts/cache_probe.py): the cache WORKS against the
tunneled backend -- a cache hit turns the fused encode graph's 6-9 s XLA
compile into ~2 s.  Round 1 blamed a "deserialization hang"; the hang was
actually the *deferred Mosaic compile* of the embedded Pallas kernel at
first execution (~140-410 s), which is independent of this cache and is
solved by ops.pack_pallas.warm_pack_kernel (the encode entry points call
it).  With both in place a fresh process reaches its first encoded byte
in ~15-25 s.

Call enable() before the first jit execution.  Opt-in via
JPEZY_TPU_COMPILE_CACHE=1 (cache writes add a little latency per new
program, so benches that measure cold compiles keep it off).
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("JPEZY_TPU_COMPILE_CACHE") != "1":
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JPEZY_TPU_COMPILE_CACHE_DIR")
    if cache_dir is None:
        # repo-local by default: it survives fresh shells/users on the same
        # checkout (the bench driver reuses the working tree), with ~/.cache
        # as the fallback for read-only checkouts
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".xla_cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
        except OSError:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "jpezy_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
