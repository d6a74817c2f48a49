"""Benchmark: encode+decode 512x512 round-trip throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Baseline (BASELINE.md): the reference encodes a 512x512 image in 0.042 s and
decodes in 0.055 s single-threaded (core time, excluding its 0.522 s PPM
parse), i.e. a round-trip of 0.097 s -> 2.70 MP/s.  vs_baseline is our
sustained round-trip MP/s divided by 2.70.

Notes on the measurement environment: the chip is reached through a tunnel
whose host<->device link costs ~35 ms per fetch and ~25-35 MB/s, so the
pipeline batches images and does exactly one device fetch per batch per
direction; on directly-attached hardware the same code is compute-bound.
Detail timings go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

REF_ROUNDTRIP_MPS = (512 * 512 / 1e6) / (0.042 + 0.055)  # 2.70 MP/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from jpezy_tpu.utils import compile_cache

    compile_cache.enable()

    import jax

    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec

    log(f"devices: {jax.devices()}")
    h = w = 512
    mp = h * w / 1e6
    batch_n = 16
    batches = [
        np.stack([make_test_image(h, w, seed=j * batch_n + i)
                  for i in range(batch_n)])
        for j in range(2)
    ]

    # ---- single image
    img = batches[0][0]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    t0 = time.time()
    data = jax_codec.encode(r, g, b)
    log(f"first encode (compile): {time.time()-t0:.1f}s, {len(data)} bytes")
    t0 = time.time()
    jax_codec.decode(data)
    log(f"first decode (compile): {time.time()-t0:.1f}s")

    ts = []
    for i in range(6):
        im = batches[0][i % batch_n]
        t0 = time.time()
        jax_codec.encode(im[..., 0], im[..., 1], im[..., 2])
        ts.append(time.time() - t0)
    t_enc1 = min(ts)
    ts = []
    for _ in range(6):
        t0 = time.time()
        jax_codec.decode(data)
        ts.append(time.time() - t0)
    t_dec1 = min(ts)
    log(f"single encode: {t_enc1*1000:.1f}ms ({mp/t_enc1:.1f} MP/s)")
    log(f"single decode: {t_dec1*1000:.1f}ms ({mp/t_dec1:.1f} MP/s)")

    # ---- batched pipeline (production path, one fetch per batch)
    streams = jax_codec.encode_batch(batches[0])   # compile
    jax_codec.decode_batch(streams)                # compile
    t_enc = []
    t_dec = []
    all_streams = []
    for trial in range(4):
        imgs = batches[trial % 2]
        t0 = time.time()
        streams = jax_codec.encode_batch(imgs)
        t_enc.append(time.time() - t0)
        t0 = time.time()
        out, _ = jax_codec.decode_batch(streams)
        t_dec.append(time.time() - t0)
        all_streams.append(streams)
    t_benc, t_bdec = min(t_enc), min(t_dec)
    log(f"batched encode x{batch_n}: {t_benc*1000:.0f}ms "
        f"({batch_n*mp/t_benc:.1f} MP/s)")
    log(f"batched decode x{batch_n}: {t_bdec*1000:.0f}ms "
        f"({batch_n*mp/t_bdec:.1f} MP/s)")

    total = t_benc + t_bdec
    value = batch_n * mp / total
    log(f"round-trip (batched): {value:.2f} MP/s")

    # sanity: quality gate (outputs must be real JPEGs of reference quality)
    try:
        from PIL import Image
        import io

        pil = np.asarray(Image.open(io.BytesIO(all_streams[0][0])).convert("RGB"))
        mse = np.mean((pil.astype(float) - batches[0][0].astype(float)) ** 2)
        log(f"PIL-decoded PSNR vs source: {10*np.log10(255**2/mse):.2f} dB")
    except ImportError:
        pass

    print(json.dumps({
        "metric": "encode+decode 512x512 round-trip throughput (1 chip, batch 16)",
        "value": round(value, 3),
        "unit": "MP/s",
        "vs_baseline": round(value / REF_ROUNDTRIP_MPS, 2),
    }))


if __name__ == "__main__":
    main()
