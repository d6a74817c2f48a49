"""Attribute the first-RUN cost (vs AOT compile) of the encode pipeline.

Round-1 bench saw a 281-408s 'first encode' while AOT lower+compile of the
same graph takes ~10s -- so the cost is in first execution.  Suspects: the
Pallas pack kernel (Mosaic compiles at first run under the remote-compile
plugin) and the scatter concat.  Each stage is timed: compile, then first
run, then second run.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def clock(name, fn, *args):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    t_comp = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(c(*args))
    t_run1 = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(c(*args))
    t_run2 = time.time() - t0
    print(f"{name:34s} compile {t_comp:7.2f}s  run1 {t_run1:8.3f}s  "
          f"run2 {t_run2*1000:8.1f}ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    no_pallas = os.environ.get("JPEZY_NO_PALLAS") == "1"
    print("JPEZY_NO_PALLAS:", no_pallas, flush=True)
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.core.geometry import EncodeGeometry
    from jpezy_tpu.ops import entropy as E

    h = w = 512
    geo = EncodeGeometry(width=w, height=h)
    nb = geo.num_mcus * 6
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    g = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    qb = jnp.asarray(rng.integers(-40, 40, (nb, 64), np.int32))
    pred = jnp.asarray(rng.integers(-40, 40, (nb,), np.int32))

    clock("quantize_planes", functools.partial(
        JC.quantize_planes.__wrapped__, ph=geo.padded_height,
        pw=geo.padded_width, gray=False), r, g, b)

    def emit_only(q, p):
        return E.block_emissions(q, p, False)
    clock("block_emissions", emit_only, qb, pred)

    def emit_pack(q, p):
        hi, lo, n = E.block_emissions(q, p, False)
        return E.pack_block_words(hi, lo, n)
    clock("emissions+pack", emit_pack, qb, pred)

    words = jnp.asarray(rng.integers(0, 2**31, (nb, 64), np.int64),
                        dtype=jnp.uint32)
    bits = jnp.asarray(rng.integers(10, 300, (nb,), np.int32))
    maxw = JC.stream_budget_words(nb)
    clock("concat_device(scatter)",
          lambda ww, bb: E.concat_device(ww, bb, maxw), words, bits)

    clock("encode_to_stream(FULL)", functools.partial(
        JC.encode_to_stream.__wrapped__, ph=geo.padded_height,
        pw=geo.padded_width, gray=False, precision="fast", rounded=False,
        quality=None, restart_interval=0), r, g, b)


if __name__ == "__main__":
    sys.exit(main())
