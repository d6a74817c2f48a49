"""Round-3 perf probe: decode-path stage attribution + transport A/B.

BENCH_r02 saw batched decode x16 regress 737 -> 1299 ms after the ycc420
sparse transport landed.  This isolates, for both transports:
  host entropy frontend / sparsify / upload bytes+time / device program
  (sync-bracketed) / fetch bytes+time / host color tail.
Run on the live chip:  python scripts/r3probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax
    import jax.numpy as jnp

    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.bitstream.reader import parse
    from jpezy_tpu.runtime import native

    print("devices:", jax.devices(), flush=True)
    N, h, w = 16, 512, 512
    mp = N * h * w / 1e6
    rgbs = np.stack([make_test_image(h, w, seed=i) for i in range(N)])
    streams = JC.encode_batch(rgbs)
    print(f"streams: {sum(map(len, streams))/2**20:.2f} MiB total", flush=True)

    def best(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), r

    # ---------- host stages
    t_parse, pjs = best(lambda: [parse(s) for s in streams])
    print(f"parse x{N}: {t_parse*1e3:.0f}ms", flush=True)
    t_ent, per_image = best(lambda: JC._decode_entropy_batch(pjs))
    print(f"entropy frontend x{N} (threaded): {t_ent*1e3:.0f}ms", flush=True)
    t_sp, _ = best(lambda: [[native.sparsify(b, 10) for b in pi]
                            for pi in per_image])
    print(f"sparsify x{N} (serial): {t_sp*1e3:.0f}ms", flush=True)

    # ---------- ycc420 transport, stage by stage
    for name, dispatch in (
        ("ycc420", lambda: JC.decode_batch_dispatch(streams,
                                                    transport="ycc420")),
        ("rgb", lambda: JC.decode_batch_dispatch(streams, transport="rgb")),
    ):
        tick = dispatch()
        JC.decode_batch_finish(tick)  # compile
        # end-to-end
        def e2e():
            return JC.decode_batch_finish(dispatch())
        t_all, _ = best(e2e)
        # dispatch only (host work + upload enqueue)
        t_disp, tick = best(dispatch)
        # finish only (device + fetch), on a fresh ticket each time
        ts = []
        for _ in range(3):
            tk = dispatch()
            t0 = time.perf_counter()
            JC.decode_batch_finish(tk)
            ts.append(time.perf_counter() - t0)
        t_fin = min(ts)
        print(f"decode[{name}] e2e {t_all*1e3:.0f}ms ({mp/t_all:.1f} MP/s)  "
              f"dispatch {t_disp*1e3:.0f}ms  finish {t_fin*1e3:.0f}ms",
              flush=True)

    # device program alone (bracketed), ycc420
    tick = JC.decode_batch_dispatch(streams, transport="ycc420")
    if tick[0] == "ycc420":
        pjs0 = [parse(s) for s in streams]
        p0 = pjs0[0]
        # rebuild the packed upload buffer once, then time the jitted program
        from jpezy_tpu.core.geometry import ComponentGeometry
        geos = [ComponentGeometry(fc.H, fc.V, p0.hmax, p0.vmax,
                                  p0.props.width, p0.props.height)
                for fc in p0.frame_components]
        # reuse dispatch to get device-resident inputs via the ticket is
        # awkward; instead bracket the full dispatch+finish minus host work:
        K = 4
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                tk = JC.decode_batch_dispatch(streams, transport="ycc420")
            out = JC.decode_batch_finish(tk)
            ts.append(time.perf_counter() - t0)
        print(f"decode[ycc420] K-pipelined {min(ts)/K*1e3:.0f}ms/batch "
              f"(host+device overlapped)", flush=True)

    # upload/fetch raw link probes at the transport's actual sizes
    up_ycc = N * (h * w + 2 * (h // 2) * (w // 2))  # enc upload i8
    print(f"[sizes] enc upload {up_ycc/2**20:.1f} MiB; dec fetch "
          f"{up_ycc/2**20:.1f} MiB (same planes back)", flush=True)


if __name__ == "__main__":
    main()
