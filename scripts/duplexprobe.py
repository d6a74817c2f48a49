"""Measure whether the host<->device link overlaps uploads with fetches.

VERDICT r3 #1: the round-3 pipelined round trip reached 65% of the
HALF-duplex bound and lost to serial batching; before re-architecting the
pipeline, establish what the transport layer actually permits:

  1. serial upload / fetch bandwidth (the round-3 linkprobe numbers);
  2. aggregate throughput with one thread uploading while another fetches
     (full-duplex if ~= the sum, serialized if ~= one direction);
  3. whether `jnp.asarray` (upload) returns at enqueue or after the bytes
     moved (dispatch asynchrony the pipeline can exploit).

Run alone (the chip claim is exclusive): python scripts/duplexprobe.py
"""
from __future__ import annotations

import threading
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    np.asarray(jnp.asarray(np.zeros(8, np.int32)))
    print(f"session sync: {time.time()-t0:.1f}s", flush=True)

    MB = 8
    probe = np.random.default_rng(0).integers(
        0, 255, MB << 20, dtype=np.uint8)

    # --- 1. serial bandwidths (best of 3)
    ups, downs = [], []
    darrs = []
    for _ in range(3):
        t0 = time.time()
        d = jax.block_until_ready(jnp.asarray(probe))
        ups.append(time.time() - t0)
        t0 = time.time()
        np.asarray(d)
        downs.append(time.time() - t0)
        darrs.append(d)
    up_bw = probe.nbytes / min(ups) / 2**20
    down_bw = probe.nbytes / min(downs) / 2**20
    print(f"serial: upload {up_bw:.1f} MiB/s, fetch {down_bw:.1f} MiB/s",
          flush=True)

    # --- 2. enqueue vs completion timing for an upload
    t0 = time.time()
    d2 = jnp.asarray(probe)
    t_enq = time.time() - t0
    jax.block_until_ready(d2)
    t_done = time.time() - t0
    np.asarray(d2[:1])
    t_sync = time.time() - t0
    print(f"upload 8MiB: asarray returned {t_enq*1e3:.0f}ms, "
          f"block_until_ready {t_done*1e3:.0f}ms, "
          f"1-elem fetch (true sync) {t_sync*1e3:.0f}ms", flush=True)

    # --- 3. concurrent upload + fetch, 6 rounds each on two threads
    N = 6
    # distinct device arrays to fetch (avoid host-copy caching)
    fetch_srcs = [jax.block_until_ready(jnp.asarray(probe + i))
                  for i in range(N)]
    up_times, down_times = [], []
    barrier = threading.Barrier(2)

    def up_worker():
        barrier.wait()
        for i in range(N):
            t0 = time.time()
            jax.block_until_ready(jnp.asarray(probe))
            up_times.append(time.time() - t0)

    def down_worker():
        barrier.wait()
        for i in range(N):
            t0 = time.time()
            np.asarray(fetch_srcs[i])
            down_times.append(time.time() - t0)

    t0 = time.time()
    th1 = threading.Thread(target=up_worker)
    th2 = threading.Thread(target=down_worker)
    th1.start(); th2.start(); th1.join(); th2.join()
    wall = time.time() - t0
    moved = 2 * N * probe.nbytes / 2**20
    agg = moved / wall
    # serialized expectation: total = N*(t_up + t_down)
    t_serial_pred = N * (min(ups) + min(downs))
    print(f"concurrent: {moved:.0f} MiB in {wall:.2f}s = {agg:.1f} MiB/s "
          f"aggregate (serialized prediction {moved/t_serial_pred:.1f} "
          f"MiB/s, full-duplex prediction "
          f"{moved/max(N*min(ups), N*min(downs)):.1f} MiB/s)", flush=True)
    overlap = (t_serial_pred - wall) / (t_serial_pred
                                        - max(N * min(ups), N * min(downs)))
    print(f"overlap achieved: {max(0, min(1, overlap))*100:.0f}% "
          "(0% = fully serialized, 100% = full duplex)", flush=True)

    # --- 4. two concurrent uploads (does the tunnel parallelize one
    # direction at all?)
    halves = [probe[: probe.nbytes // 2], probe[probe.nbytes // 2:]]
    t0 = time.time()
    ths = []
    for h in halves:
        th = threading.Thread(
            target=lambda a=h: jax.block_until_ready(jnp.asarray(a)))
        th.start()
        ths.append(th)
    for th in ths:
        th.join()
    t_par = time.time() - t0
    print(f"2 parallel half-size uploads: {t_par*1e3:.0f}ms vs serial "
          f"{min(ups)*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
