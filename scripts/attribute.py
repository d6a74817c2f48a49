"""Stage attribution for the batched encode/decode paths (VERDICT r1 #1).

Splits the batched encode and decode walltime into
  host color / upload / device compute / fetch / host assembly
plus raw link microbenchmarks (device_put and fetch of known sizes) so the
"tunnel ceiling" claim is measured, not asserted.  Prints a device-only
MP/s and an MFU estimate from utils.profiling.encode_flops.

Run alone on the TPU host (concurrent python processes compete for the
tunneled chip claim).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def bucket(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), np.median(ts)


def main():
    import jax
    import jax.numpy as jnp

    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.utils.profiling import encode_flops

    print("devices:", jax.devices(), flush=True)
    h = w = 512
    n = 16
    mp = n * h * w / 1e6
    rgbs = np.stack([make_test_image(h, w, seed=i) for i in range(n)])

    # ---- raw link microbench
    for mb in (1, 4, 8):
        buf = np.zeros((mb << 20,), np.uint8)
        up, _ = bucket(lambda: jax.block_until_ready(jnp.asarray(buf)), 3)
        dev = jax.block_until_ready(jnp.asarray(buf))
        down, _ = bucket(lambda: np.asarray(dev), 3)
        print(f"link {mb:2d} MiB: up {up*1e3:7.1f} ms ({mb/up:6.1f} MB/s)  "
              f"down {down*1e3:7.1f} ms ({mb/down:6.1f} MB/s)", flush=True)
    tiny = np.zeros((4,), np.uint8)
    rtt, _ = bucket(lambda: np.asarray(jnp.asarray(tiny)), 5)
    print(f"link RTT (4-byte round trip): {rtt*1e3:.1f} ms", flush=True)

    # ---- encode attribution
    y, cb, cr = JC.host_rgb_to_ycc420(rgbs)           # warm + cache check
    t_color, _ = bucket(lambda: JC.host_rgb_to_ycc420(rgbs))

    def upload():
        return jax.block_until_ready(
            (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)))
    dev_args = upload()
    t_upload, _ = bucket(lambda: upload())

    # compile first
    out = JC._encode_batch_blocks_ycc(*dev_args)
    jax.block_until_ready(out)
    t_device, _ = bucket(
        lambda: jax.block_until_ready(JC._encode_batch_blocks_ycc(*dev_args)))
    combined = out[0]
    t_fetch, _ = bucket(lambda: np.asarray(combined))

    ticket = (combined, out[1], out[2], n, h, w, False, None, 0, None)
    t_asm, _ = bucket(lambda: JC.encode_batch_finish(ticket))
    t_asm -= t_fetch  # finish includes the fetch

    fl = encode_flops(w, h)
    dct_tflops = n * fl["dct_flops"] / t_device / 1e12
    print(f"\nencode x{n} attribution (best-of-5):")
    print(f"  host color   {t_color*1e3:7.1f} ms")
    print(f"  upload       {t_upload*1e3:7.1f} ms "
          f"({(y.nbytes+cb.nbytes+cr.nbytes)/2**20:.1f} MiB)")
    print(f"  device       {t_device*1e3:7.1f} ms ({mp/t_device:6.1f} MP/s "
          f"device-only; DCT {dct_tflops:.3f} TFLOP/s)")
    print(f"  fetch        {t_fetch*1e3:7.1f} ms "
          f"({combined.size*4/2**20:.1f} MiB)")
    print(f"  host asm     {t_asm*1e3:7.1f} ms")
    seq = t_color + t_upload + t_device + t_fetch + t_asm
    print(f"  sum          {seq*1e3:7.1f} ms ({mp/seq:.1f} MP/s serial)",
          flush=True)

    t0 = time.perf_counter()
    streams = JC.encode_batch(rgbs)
    t_e2e = time.perf_counter() - t0
    print(f"  e2e measured {t_e2e*1e3:7.1f} ms ({mp/t_e2e:.1f} MP/s)")

    # ---- decode attribution
    tick = JC.decode_batch_dispatch(streams)
    JC.decode_batch_finish(tick)                      # compile
    t0 = time.perf_counter()
    tick = JC.decode_batch_dispatch(streams)
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    JC.decode_batch_finish(tick)
    t_fin = time.perf_counter() - t0

    # entropy frontend alone
    from jpezy_tpu.bitstream.reader import parse
    pjs = [parse(s) for s in streams]
    t_ent, _ = bucket(
        lambda: [JC.decode_entropy_host(pj) for pj in pjs], 3)

    print(f"\ndecode x{n} attribution:")
    print(f"  dispatch (host entropy+sparsify+upload-dispatch) "
          f"{t_disp*1e3:7.1f} ms")
    print(f"    of which host entropy decode {t_ent*1e3:7.1f} ms")
    print(f"  finish (device+fetch+color tail) {t_fin*1e3:7.1f} ms")
    print(f"  e2e {(t_disp+t_fin)*1e3:7.1f} ms "
          f"({mp/(t_disp+t_fin):.1f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
