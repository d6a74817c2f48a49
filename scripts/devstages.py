"""Steady-state DEVICE time per encode stage at batch-16 shapes.

The round-2 attribution showed the batched encode device program takes
~194 ms for 16x512x512 (21.6 MP/s device-only) -- the bottleneck is ON
DEVICE, not the tunnel.  This isolates quantize / emissions / pack /
concat to find the hot stage.  Fresh output arrays every rep (jax caches
the host copy of fetched arrays, so re-fetching the same array is free
and min-of-N on np.asarray lies).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def clock(name, cfn, args, n=5):
    outs = cfn(*args)
    import jax

    jax.block_until_ready(outs)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(cfn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.2f} ms (med {np.median(ts)*1e3:.2f})",
          flush=True)
    return outs


def main():
    import jax
    import jax.numpy as jnp

    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.ops import entropy as E
    from jpezy_tpu.ops.pack_pallas import warm_pack_kernel
    from jpezy_tpu.parallel import sharded as SH

    print("devices:", jax.devices(), flush=True)
    if jax.default_backend() == "tpu":
        warm_pack_kernel()
    N, h, w = 16, 512, 512
    rgbs = np.stack([make_test_image(h, w, seed=i) for i in range(N)])
    y, cb, cr = JC.host_rgb_to_ycc420(rgbs)
    dy, dcb, dcr = (jax.block_until_ready(jnp.asarray(a)) for a in (y, cb, cr))

    quant = jax.jit(functools.partial(
        SH._quantize_local_ycc, gray=False, dtype=jnp.float32, rounded=False))
    yq, cbq, crq = clock("quantize (color+dct+quant)", quant, (dy, dcb, dcr))
    yq, cbq, crq = (jax.block_until_ready(x) for x in (yq, cbq, crq))

    def emits(yq, cbq, crq):
        outs = []
        for q, chroma in ((yq, False), (cbq, True), (crq, True)):
            n_loc, b_loc, _ = q.shape
            dc = q[:, :, 0]
            pred = jnp.concatenate(
                [jnp.zeros_like(dc[:, :1]), dc[:, :-1]], axis=1)
            outs.append(E.block_emissions(
                q.reshape(-1, 64), pred.reshape(-1), chroma))
        return outs

    ems = clock("emissions (3 comps)", jax.jit(emits), (yq, cbq, crq))

    def emit_interleave(yq, cbq, crq):
        ems = emits(yq, cbq, crq)
        n_loc = cbq.shape[0]
        nm = cbq.shape[1]
        return tuple(
            jnp.concatenate(
                [ems[0][j].reshape(n_loc, nm, 4, 64),
                 ems[1][j].reshape(n_loc, nm, 1, 64),
                 ems[2][j].reshape(n_loc, nm, 1, 64)], axis=2
            ).reshape(n_loc * nm * 6, 64)
            for j in range(3)
        )

    hi, lo, nb = clock("emissions+interleave", jax.jit(emit_interleave),
                       (yq, cbq, crq))
    hi, lo, nb = (jax.block_until_ready(x) for x in (hi, lo, nb))

    use_pallas = jax.default_backend() == "tpu"
    packp = jax.jit(functools.partial(E.pack_block_words,
                                      use_pallas=use_pallas))
    words, bits = clock(f"pack (pallas={use_pallas})", packp, (hi, lo, nb))
    packf = jax.jit(functools.partial(E.pack_block_words, use_pallas=False))
    clock("pack (fori_loop)", packf, (hi, lo, nb))
    words = jax.block_until_ready(words)
    nm6 = cbq.shape[1] * 6
    wordsN = words.reshape(N, nm6, -1)
    bitsN = bits.reshape(N, nm6)

    maxw = JC.stream_budget_words_batch(nm6)
    concat = jax.jit(lambda ww, bb: E.concat_device_batch(ww, bb, maxw))
    clock("concat_device_batch", concat, (wordsN, bitsN))

    full = jax.jit(functools.partial(
        JC._encode_batch_blocks_ycc.__wrapped__, gray=False,
        precision="fast", rounded=False, quality=None, restart_interval=0))
    clock("FULL batch encode", full, (dy, dcb, dcr))

    # decode side
    streams = JC.encode_batch(rgbs)
    tick = JC.decode_batch_dispatch(streams)
    JC.decode_batch_finish(tick)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        tick = JC.decode_batch_dispatch(streams)
        JC.decode_batch_finish(tick)
        ts.append(time.perf_counter() - t0)
    print(f"{'decode e2e':28s} {min(ts)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
