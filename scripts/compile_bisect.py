"""Bisect which jitted subgraph dominates the first-encode compile time.

Times AOT lower+compile of each encode stage separately on the default
backend, then the full encode_to_stream.  Run on the TPU to attribute the
multi-minute first compile (VERDICT.md round-1 item 2).
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def clock(name, fn, *args, **kw):
    t0 = time.time()
    lowered = jax.jit(fn, **kw).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_comp = time.time() - t0
    print(f"{name:36s} lower {t_lower:7.2f}s  compile {t_comp:7.2f}s",
          flush=True)
    return compiled


def main():
    print("devices:", jax.devices(), flush=True)
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.core.geometry import EncodeGeometry
    from jpezy_tpu.ops import entropy as E
    from jpezy_tpu.ops import dct as D
    from jpezy_tpu.ops import quantize as Q

    h = w = 512
    geo = EncodeGeometry(width=w, height=h)
    nm = geo.num_mcus           # 1024 MCUs
    nb = nm * 6                 # 6144 blocks
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    g = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))

    qb = jnp.asarray(rng.integers(-40, 40, (nb, 64), np.int32))
    pred = jnp.asarray(rng.integers(-40, 40, (nb,), np.int32))

    # stage 1: front half (color/pad/blockify/DCT/quant)
    clock("quantize_planes", functools.partial(
        JC.quantize_planes.__wrapped__, ph=geo.padded_height,
        pw=geo.padded_width, gray=False), r, g, b)

    # stage 2: emissions only
    clock("block_emissions", lambda q, p: E.block_emissions(q, p, False),
          qb, pred)

    # stage 3: emissions + pack (pallas on tpu)
    def emit_pack(q, p):
        hi, lo, n = E.block_emissions(q, p, False)
        return E.pack_block_words(hi, lo, n)
    clock("emissions+pack", emit_pack, qb, pred)

    # stage 4: device concat (the big scatter)
    words = jnp.asarray(rng.integers(0, 2**31, (nb, 64), np.int64),
                        dtype=jnp.uint32)
    bits = jnp.asarray(rng.integers(10, 300, (nb,), np.int32))
    maxw = JC.stream_budget_words(nb)
    clock("concat_device(scatter)",
          lambda ww, bb: E.concat_device(ww, bb, maxw), words, bits)

    # stage 5: encode_to_blocks (1-4 minus concat)
    clock("encode_to_blocks", functools.partial(
        JC.encode_to_blocks.__wrapped__, ph=geo.padded_height,
        pw=geo.padded_width, gray=False, precision="fast", rounded=False,
        quality=None, restart_interval=0), r, g, b)

    # stage 6: the full thing
    clock("encode_to_stream(FULL)", functools.partial(
        JC.encode_to_stream.__wrapped__, ph=geo.padded_height,
        pw=geo.padded_width, gray=False, precision="fast", rounded=False,
        quality=None, restart_interval=0), r, g, b)

    # batched versions
    N = 16
    wordsN = jnp.asarray(
        rng.integers(0, 2**31, (N, nb, 64), np.int64), dtype=jnp.uint32)
    bitsN = jnp.asarray(rng.integers(10, 300, (N, nb), np.int32))
    clock("concat_device_batch", lambda ww, bb: E.concat_device_batch(
        ww, bb, maxw), wordsN, bitsN)


if __name__ == "__main__":
    sys.exit(main())
