"""Probe the persistent XLA compilation cache against the tunneled backend.

Round 1 documented the cache as a no-op ('deserialization hangs').  This
re-tests it (VERDICT r1 weak-2): pass 1 compiles the single-image encode
graph with the cache enabled and exits; pass 2 (fresh process) compiles the
same graph and reports the time.  Run:  python scripts/cache_probe.py 1
then                                    python scripts/cache_probe.py 2
"""
from __future__ import annotations

import functools
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    step = sys.argv[1] if len(sys.argv) > 1 else "1"

    def _bail(signum, frame):
        print("cache_probe: TIMED OUT (deserialization hang?)", flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(420)

    import jax

    cache_dir = "/tmp/jpezy_xla_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import numpy as np
    import jax.numpy as jnp
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.core.geometry import EncodeGeometry

    rng = np.random.default_rng(0)
    r, g, b = (jnp.asarray(rng.integers(0, 256, (512, 512), np.uint8))
               for _ in range(3))
    geo = EncodeGeometry(width=512, height=512)
    fn = functools.partial(
        JC.encode_to_stream.__wrapped__, ph=geo.padded_height,
        pw=geo.padded_width, gray=False, precision="fast", rounded=False,
        quality=None, restart_interval=0)
    t0 = time.time()
    c = jax.jit(fn).lower(r, g, b).compile()
    print(f"pass {step}: compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = np.asarray(c(r, g, b)[0])
    print(f"pass {step}: first exec+fetch {time.time()-t0:.1f}s", flush=True)
    entries = os.listdir(cache_dir)
    print(f"cache entries: {len(entries)}", flush=True)
    signal.alarm(0)


if __name__ == "__main__":
    main()
