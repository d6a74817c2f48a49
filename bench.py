"""Benchmark: encode+decode 512x512 round-trip throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Baseline (BASELINE.md): the reference encodes a 512x512 image in 0.042 s and
decodes in 0.055 s single-threaded (core time, excluding its 0.522 s PPM
parse), i.e. a round-trip of 0.097 s -> 2.70 MP/s.  vs_baseline is our
sustained round-trip MP/s divided by 2.70.

Detail timings go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_ROUNDTRIP_MPS = (512 * 512 / 1e6) / (0.042 + 0.055)  # 2.70 MP/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            128 + 90 * np.sin(2 * np.pi * xx / w * 2.3) * np.cos(2 * np.pi * yy / h),
            128 + 70 * np.cos(2 * np.pi * (xx + yy) / (w + h) * 3.1),
            128 + 80 * np.sin(2 * np.pi * yy / h * 1.7),
        ],
        axis=-1,
    )
    img = np.clip(base + rng.normal(0, 12, size=(h, w, 3)), 0, 255)
    return img.astype(np.uint8)


def main():
    import jax

    from jpezy_tpu.codec import jax_codec

    log(f"devices: {jax.devices()}")
    h = w = 512
    batch_n = 8
    imgs = np.stack([make_image(h, w, seed=i) for i in range(batch_n)])

    # ---- single-image warmup + timing
    r, g, b = imgs[0, ..., 0], imgs[0, ..., 1], imgs[0, ..., 2]
    t0 = time.time()
    data = jax_codec.encode(r, g, b)
    log(f"first encode (compile): {time.time()-t0:.1f}s, {len(data)} bytes")
    t0 = time.time()
    out = jax_codec.decode(data)
    log(f"first decode (compile): {time.time()-t0:.1f}s")

    def best_of(fn, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    t_enc = best_of(lambda: jax_codec.encode(r, g, b))
    t_dec = best_of(lambda: jax_codec.decode(data))
    mp = h * w / 1e6
    log(f"single encode: {t_enc*1000:.1f}ms ({mp/t_enc:.1f} MP/s)")
    log(f"single decode: {t_dec*1000:.1f}ms ({mp/t_dec:.1f} MP/s)")

    # ---- batched pipeline (production path)
    streams = jax_codec.encode_batch(imgs)  # compile
    t_benc = best_of(lambda: jax_codec.encode_batch(imgs), n=3)
    log(f"batched encode x{batch_n}: {t_benc*1000:.1f}ms "
        f"({batch_n*mp/t_benc:.1f} MP/s)")

    def dec_all():
        for s in streams:
            jax_codec.decode(s)

    dec_all()
    t_bdec = best_of(dec_all, n=3)
    log(f"batched decode x{batch_n}: {t_bdec*1000:.1f}ms "
        f"({batch_n*mp/t_bdec:.1f} MP/s)")

    total = t_benc + t_bdec
    value = batch_n * mp / total
    log(f"round-trip (batched): {value:.2f} MP/s")

    print(json.dumps({
        "metric": "encode+decode 512x512 round-trip throughput (1 chip, batch 8)",
        "value": round(value, 3),
        "unit": "MP/s",
        "vs_baseline": round(value / REF_ROUNDTRIP_MPS, 2),
    }))


if __name__ == "__main__":
    main()
