"""Tunnel link characterization: one-way bandwidths, per-dispatch overhead,
and whether upload and fetch genuinely overlap (full duplex) when issued
from two threads.  Decides how bench.py's pipeline should schedule transfers.
"""
from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    MB = 8
    probe = np.random.default_rng(1).integers(
        0, 255, MB << 20, dtype=np.uint8)

    # warm + park a device-resident array to fetch
    dev = jax.block_until_ready(jnp.asarray(probe))

    def t_upload():
        t0 = time.perf_counter()
        d = jax.block_until_ready(jnp.asarray(probe))
        return time.perf_counter() - t0, d

    def t_fetch(d):
        t0 = time.perf_counter()
        _ = np.asarray(d)
        return time.perf_counter() - t0

    ups, downs = [], []
    for _ in range(4):
        tu, d2 = t_upload()
        ups.append(tu)
        # fetch a FRESH array each time (jax caches host copies)
        downs.append(t_fetch(d2))
        del d2
    up_bw = probe.nbytes / min(ups) / 2**20
    down_bw = probe.nbytes / min(downs) / 2**20
    print(f"one-way: upload {up_bw:.1f} MiB/s, fetch {down_bw:.1f} MiB/s",
          flush=True)

    # per-dispatch overhead: tiny jitted program, K back-to-back + sync
    f = jax.jit(lambda x: x + 1)
    x = jax.block_until_ready(jnp.zeros((8, 128), jnp.int32))
    jax.block_until_ready(f(x))
    K = 16
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(K):
            y = f(y)
        _ = np.asarray(y[0, :1])
        ts.append(time.perf_counter() - t0)
    print(f"per-dispatch overhead (chained x{K} + 1 sync): "
          f"{min(ts)/K*1e3:.1f} ms/call", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(x)[0, :1])
        ts.append(time.perf_counter() - t0)
    print(f"single dispatch+tiny fetch: {min(ts)*1e3:.1f} ms", flush=True)

    # duplex test: thread A uploads 8 MiB while thread B fetches 8 MiB
    fresh = [jax.block_until_ready(jnp.asarray(probe ^ i))
             for i in range(1, 4)]
    results = {}

    def up_worker():
        t0 = time.perf_counter()
        d = jax.block_until_ready(jnp.asarray(probe))
        results["up"] = time.perf_counter() - t0

    def down_worker(d):
        t0 = time.perf_counter()
        _ = np.asarray(d)
        results["down"] = time.perf_counter() - t0

    best_tot = 1e9
    for d in fresh:
        ta = threading.Thread(target=up_worker)
        tb = threading.Thread(target=down_worker, args=(d,))
        t0 = time.perf_counter()
        ta.start(); tb.start(); ta.join(); tb.join()
        best_tot = min(best_tot, time.perf_counter() - t0)
    serial = probe.nbytes / (up_bw * 2**20) + probe.nbytes / (down_bw * 2**20)
    print(f"duplex 8 MiB up + 8 MiB down concurrently: {best_tot*1e3:.0f}ms "
          f"(serial would be {serial*1e3:.0f}ms -> overlap factor "
          f"{serial/best_tot:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
