"""Round-5 probe #2: progressive-prefix attribution of the fused encode
(the standalone stage clocks carry per-program overhead and XLA fuses
across stages, so marginal deltas of progressively longer programs are
the honest split), plus scan unroll and concat tier races.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    import signal

    def _bail(signum, frame):
        print("[r5probe2] alarm fired; exiting gracefully", flush=True)
        os._exit(3)

    if "--cpu" in sys.argv:
        import jax as _j

        _j.config.update("jax_platforms", "cpu")
    else:
        signal.signal(signal.SIGALRM, _bail)
        signal.alarm(int(os.environ.get("R5PROBE_ALARM_S", "2100")))

    import jax
    import jax.numpy as jnp

    from devstages import clock
    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.ops import entropy as E
    from jpezy_tpu.parallel import sharded as SH

    print("devices:", jax.devices(), flush=True)
    N, h, w = 16, 512, 512
    rgbs = np.stack([make_test_image(h, w, seed=i) for i in range(N)])
    y, cb, cr = JC.host_rgb_to_ycc420(rgbs)
    dy, dcb, dcr = (jax.block_until_ready(jnp.asarray(a))
                    for a in (y, cb, cr))

    # ---- progressive prefixes of the fused encode
    def pfx_quant(y, cb, cr):
        return SH._quantize_local_ycc(y, cb, cr, gray=False,
                                      dtype=jnp.float32, rounded=False)

    def _emits(yq, cbq, crq):
        ems = []
        for q, chroma in ((yq, False), (cbq, True), (crq, True)):
            dc = q[:, :, 0]
            pred = jnp.concatenate(
                [jnp.zeros_like(dc[:, :1]), dc[:, :-1]], axis=1)
            ems.append(E.block_emissions(
                q.reshape(-1, 64), pred.reshape(-1), chroma))
        N_, nm = cbq.shape[0], cbq.shape[1]
        return tuple(
            jnp.concatenate(
                [ems[0][j].reshape(N_, nm, 4, 64),
                 ems[1][j].reshape(N_, nm, 1, 64),
                 ems[2][j].reshape(N_, nm, 1, 64)], axis=2
            ).reshape(N_ * nm * 6, 64)
            for j in range(3))

    def pfx_emit(y, cb, cr):
        return _emits(*pfx_quant(y, cb, cr))

    def pfx_pack(y, cb, cr):
        return E.pack_block_words(*pfx_emit(y, cb, cr))

    def pfx_full(y, cb, cr):
        words, bits = pfx_pack(y, cb, cr)
        nm6 = (h // 16) * (w // 16) * 6
        words = words.reshape(N, nm6, -1)
        bits = bits.reshape(N, nm6)
        maxw = JC.stream_budget_words_batch(nm6)
        return E.concat_device_batch(words, bits, maxw)

    t = {}
    for name, fn in (("P1 quantize", pfx_quant), ("P2 +emissions", pfx_emit),
                     ("P3 +pack", pfx_pack), ("P4 +concat", pfx_full)):
        cfn = jax.jit(fn)
        out = cfn(dy, dcb, dcr)
        jax.block_until_ready(out)
        import time

        rtt = 0.025 if jax.default_backend() == "tpu" else 0.0
        loops = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                outk = cfn(dy, dcb, dcr)
            leaf = jax.tree_util.tree_leaves(outk)[0]
            np.asarray(leaf.ravel()[:1])
            loops.append(time.perf_counter() - t0)
        t[name] = max(1e-5, (min(loops) - rtt) / 8)
        print(f"{name:20s} {t[name]*1e3:8.2f} ms", flush=True)
    print(f"deltas: quant {t['P1 quantize']*1e3:.2f}, emissions "
          f"{(t['P2 +emissions']-t['P1 quantize'])*1e3:.2f}, pack "
          f"{(t['P3 +pack']-t['P2 +emissions'])*1e3:.2f}, concat "
          f"{(t['P4 +concat']-t['P3 +pack'])*1e3:.2f}", flush=True)

    # ---- scan unroll race (chain mode)
    from jpezy_tpu.bitstream.reader import parse
    from jpezy_tpu.codec.jax_codec import _device_host_frontend
    from jpezy_tpu.ops.entropy_decode import (
        build_decode_chain_tables, decode_segments, device_lut)

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
    ctab = device_lut(build_decode_chain_tables(pjs[0].huff))
    ref = None
    for un in (1, 2, 3, 4):
        scan = jax.jit(functools.partial(
            decode_segments, max_blocks=RI * 6, unroll=un))
        out = clock(f"scan CHAIN unroll={un}", scan, (wd, nb, ctab, tsel, rl))
        got = np.asarray(out[0])
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), f"unroll={un} mismatch"
    print("  all unrolls bit-identical", flush=True)


if __name__ == "__main__":
    main()
