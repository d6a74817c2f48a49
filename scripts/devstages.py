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


def clock(name, cfn, args, n=3, K=8):
    """Fetch-bracketed steady-state timing: block_until_ready returns at
    ENQUEUE on the tunneled backend (DESIGN.md section 8), so bracket K
    back-to-back executions with a 1-element fetch of the last output --
    the fetch is the only true sync point.  Subtracts one ~25 ms RTT."""
    import jax

    outs = cfn(*args)
    jax.block_until_ready(outs)                       # compile/warm
    rtt = 0.025 if jax.default_backend() == "tpu" else 0.0

    def probe(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return np.asarray(leaf.ravel()[:1])

    loops = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(K):
            outk = cfn(*args)
        probe(outk)
        loops.append(time.perf_counter() - t0)
    t = max(1e-5, (min(loops) - rtt) / K)
    print(f"{name:28s} {t*1e3:8.2f} ms (bracketed x{K} best/{n})",
          flush=True)
    return outs


def main():
    import signal

    def _bail(signum, frame):
        print("[devstages] alarm fired; exiting gracefully", flush=True)
        os._exit(3)

    if "--cpu" in sys.argv:
        # must precede backend init; the tunneled-chip claim is exclusive
        # and must never be hard-killed (DESIGN.md section 8)
        import jax as _j

        _j.config.update("jax_platforms", "cpu")
    else:
        signal.signal(signal.SIGALRM, _bail)
        signal.alarm(int(os.environ.get("DEVSTAGES_ALARM_S", "1500")))

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

    # restart concat variants (the pipelined headline config)
    RI = 8
    concat_ri_vmap = jax.jit(lambda ww, bb: jax.vmap(
        lambda w2, b2: E.concat_device_restart(w2, b2, maxw, 6 * RI,
                                               tiered=False))(ww, bb))
    clock(f"concat_restart vmap RI={RI}", concat_ri_vmap, (wordsN, bitsN))
    concat_ri = jax.jit(lambda ww, bb: E.concat_device_restart_batch(
        ww, bb, maxw, 6 * RI))
    clock(f"concat_restart_batch RI={RI}", concat_ri, (wordsN, bitsN))

    # device decode stages at the same batch shape
    from jpezy_tpu.bitstream.reader import parse
    from jpezy_tpu.codec.jax_codec import (
        _decode_fused_batch_device, _device_host_frontend)
    from jpezy_tpu.ops.entropy_decode import (
        build_decode_lut, decode_segments, device_lut)

    streams_ri = JC.encode_batch(rgbs, restart_interval=RI)
    pjs = [parse(s) for s in streams_ri]
    nmcu = (h // 16) * (w // 16)
    nseg = nmcu // RI
    wordsH, nblkH, rawlenH = _device_host_frontend(pjs, nmcu, RI, nseg)
    wd = jax.block_until_ready(jnp.asarray(wordsH))
    nb = jax.block_until_ready(jnp.asarray(nblkH))
    rl = jax.block_until_ready(jnp.asarray(rawlenH))
    tsel = jax.block_until_ready(
        jnp.zeros(wd.shape[0], jnp.int32))
    lut = device_lut(build_decode_lut(pjs[0].huff))
    scan = jax.jit(functools.partial(decode_segments, max_blocks=RI * 6))
    clock(f"decode scan S={wd.shape[0]}", scan, (wd, nb, lut, tsel, rl))
    geom = ((h // 16, w // 16, 2, 2, 1, 1), (h // 16, w // 16, 1, 1, 2, 2),
            (h // 16, w // 16, 1, 1, 2, 2))
    qt = tuple(tuple(int(x) for x in pjs[0].quant[fc.Tq])
               for fc in pjs[0].frame_components)
    qarr = jax.block_until_ready(jnp.asarray(np.stack([
        np.stack([np.asarray(pjs[0].quant[fc.Tq], np.int32)
                  for fc in pjs[0].frame_components])] * N)))
    fulldec = jax.jit(functools.partial(
        _decode_fused_batch_device.__wrapped__, N=N, nseg=nseg, ri=RI,
        geom=geom, level=128))
    clock("FULL device decode (w/ scan)", fulldec,
          (wd, nb, lut, tsel, rl, qarr))

    # decode e2e (host+device+transfers)
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
