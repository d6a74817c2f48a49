"""Round-5 optimization probe: quantize sub-stages + scan modes (TPU).

devstages r5 baseline (16x512x512): quantize 8.52 ms standalone is the
biggest encode stage; decode scan 14.72 ms.  This isolates WHERE quantize
goes (blockify layout? DCT matmul? integer division?) and races the
gather-free 'chain' symbol decode against the window-LUT gather.
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


def main():
    import signal

    def _bail(signum, frame):
        print("[r5probe] alarm fired; exiting gracefully", flush=True)
        os._exit(3)

    if "--cpu" in sys.argv:
        import jax as _j

        _j.config.update("jax_platforms", "cpu")
    else:
        signal.signal(signal.SIGALRM, _bail)
        signal.alarm(int(os.environ.get("R5PROBE_ALARM_S", "2100")))

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from devstages import clock

    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.ops import blocks as B
    from jpezy_tpu.ops import dct as D
    from jpezy_tpu.ops import quantize as Q
    from jpezy_tpu.core import tables as T

    print("devices:", jax.devices(), flush=True)
    N, h, w = 16, 512, 512
    rgbs = np.stack([make_test_image(h, w, seed=i) for i in range(N)])
    y, cb, cr = JC.host_rgb_to_ycc420(rgbs)
    dy, dcb, dcr = (jax.block_until_ready(jnp.asarray(a))
                    for a in (y, cb, cr))

    # --- quantize sub-stages
    blkf = jax.jit(lambda a, b, c: (
        jax.vmap(B.blockify_luma)(a), jax.vmap(B.blockify_chroma)(b),
        jax.vmap(B.blockify_chroma)(c)))
    yb3 = clock("blockify only", blkf, (dy, dcb, dcr))
    yb3 = jax.block_until_ready(yb3)
    ybf = jax.block_until_ready(
        jnp.reshape(yb3[0], (-1, 64)))

    dctf = jax.jit(lambda x: D.forward_dct(x, jnp.float32))
    co = clock("fwd DCT matmul (luma blocks)", dctf, (ybf,))
    co = jax.block_until_ready(co)

    divf = jax.jit(lambda x: Q.quantize(x, False))
    clock("quantize int-div (luma)", divf, (co,))

    def q_recip(coeffs, qtable):
        q = jnp.asarray(qtable, jnp.int32)[None, :]
        a = jnp.abs(coeffs)
        rf = 1.0 / q.astype(jnp.float32)
        c = (a.astype(jnp.float32) * rf).astype(jnp.int32)
        c = (c + ((c + 1) * q <= a).astype(jnp.int32)
             - (c * q > a).astype(jnp.int32))
        return jnp.sign(coeffs) * c

    recipf = jax.jit(lambda x: q_recip(x, T.Y_QUANT))
    got = clock("quantize recip+fixup (luma)", recipf, (co,))
    ref = np.asarray(divf(co))
    assert np.array_equal(np.asarray(got), ref), "recip quantize mismatch!"
    print("  recip+fixup EXACT vs int-div", flush=True)

    # dct+quant fused both ways
    clock("dct+quant int-div", jax.jit(lambda x: Q.quantize(
        D.forward_dct(x, jnp.float32), False)), (ybf,))
    clock("dct+quant recip", jax.jit(lambda x: q_recip(
        D.forward_dct(x, jnp.float32), T.Y_QUANT)), (ybf,))

    # bf16 matmul variant (inputs are int8-range; products fit bf16? NO --
    # accumulate in f32; bf16 INPUT loses exactness, probe only for speed)
    def dct_bf16(x):
        m = jnp.asarray(D._FWD64, jnp.bfloat16)
        return jnp.dot(x.astype(jnp.bfloat16), m.T,
                       preferred_element_type=jnp.float32).astype(jnp.int32)

    clock("fwd DCT bf16-in f32-acc", jax.jit(dct_bf16), (ybf,))

    # --- full fused encode with recip quantize (monkeypatched)
    orig_q = Q.quantize

    def patched(coeffs, chroma, *, rounded=False, qtable=None):
        if rounded:
            return orig_q(coeffs, chroma, rounded=rounded, qtable=qtable)
        qt = qtable if qtable is not None else (
            T.C_QUANT if chroma else T.Y_QUANT)
        return q_recip(coeffs, qt)

    full0 = jax.jit(functools.partial(
        JC._encode_batch_blocks_ycc.__wrapped__, gray=False,
        precision="fast", rounded=False, quality=None, restart_interval=0))
    out_a = clock("FULL encode (int-div)", full0, (dy, dcb, dcr))
    Q.quantize = patched
    try:
        full1 = jax.jit(functools.partial(
            JC._encode_batch_blocks_ycc.__wrapped__, gray=False,
            precision="fast", rounded=False, quality=None,
            restart_interval=0))
        out_b = clock("FULL encode (recip)", full1, (dy, dcb, dcr))
    finally:
        Q.quantize = orig_q
    same = all(np.array_equal(np.asarray(x), np.asarray(yy))
               for x, yy in zip(jax.tree_util.tree_leaves(out_a),
                                jax.tree_util.tree_leaves(out_b)))
    print(f"  full encode outputs identical: {same}", flush=True)

    # --- decode scan: lut vs chain, same inputs
    from jpezy_tpu.bitstream.reader import parse
    from jpezy_tpu.codec.jax_codec import _device_host_frontend
    from jpezy_tpu.ops.entropy_decode import (
        build_decode_chain_tables, build_decode_lut, decode_segments,
        device_lut)

    RI = 8
    streams_ri = JC.encode_batch(rgbs, restart_interval=RI)
    pjs = [parse(s) for s in streams_ri]
    nmcu = (h // 16) * (w // 16)
    nseg = nmcu // RI
    wordsH, nblkH, rawlenH = _device_host_frontend(pjs, nmcu, RI, nseg)
    wd = jax.block_until_ready(jnp.asarray(wordsH))
    nb = jax.block_until_ready(jnp.asarray(nblkH))
    rl = jax.block_until_ready(jnp.asarray(rawlenH))
    tsel = jax.block_until_ready(jnp.zeros(wd.shape[0], jnp.int32))
    lut = device_lut(build_decode_lut(pjs[0].huff))
    ctab = device_lut(build_decode_chain_tables(pjs[0].huff))
    scan = jax.jit(functools.partial(decode_segments, max_blocks=RI * 6))
    a = clock(f"scan LUT S={wd.shape[0]}", scan, (wd, nb, lut, tsel, rl))
    b = clock(f"scan CHAIN S={wd.shape[0]}", scan, (wd, nb, ctab, tsel, rl))
    eq = np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    print(f"  chain blocks identical to lut: {eq}", flush=True)


if __name__ == "__main__":
    main()
