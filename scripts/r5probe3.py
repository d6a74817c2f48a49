"""Round-5 probe #3: what the scan iteration actually costs.

r5probe2 killed the loop-overhead theory (unroll does not pay).  This
isolates the per-iteration cost components of the lockstep scan:
  - a no-refill scan variant (gather share),
  - a no-blockaccum variant (one-hot accumulate share),
  - gather shape costs: S element-gathers vs one slice-2 gather per lane
    (if slice-2 costs ~1 index, a 128-bit register refilling two words
    per body halves the dominant gather cost).
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
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    import signal

    def _bail(signum, frame):
        print("[r5probe3] alarm fired; exiting gracefully", flush=True)
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

    print("devices:", jax.devices(), flush=True)
    S, L = 2048, 64
    rng = np.random.default_rng(0)
    words = jax.block_until_ready(jnp.asarray(
        rng.integers(0, 2**32, (S, L), np.uint64).astype(np.uint32)))
    idx = jax.block_until_ready(jnp.asarray(
        rng.integers(0, L - 2, S, np.int64).astype(np.int32)))

    # gather shapes: run K gathers back to back inside one jit
    def g_elem(words, idx):
        acc = jnp.zeros((S,), jnp.uint32)
        for k in range(64):
            w = jnp.take_along_axis(
                words, ((idx + k) % (L - 2))[:, None], axis=1)[:, 0]
            acc = acc ^ w
        return acc

    def g_slice2(words, idx):
        acc = jnp.zeros((S, 2), jnp.uint32)
        f = jax.vmap(lambda row, i: jax.lax.dynamic_slice(row, (i,), (2,)))
        for k in range(64):
            acc = acc ^ f(words, (idx + k) % (L - 2))
        return acc

    def g_slice4(words, idx):
        acc = jnp.zeros((S, 4), jnp.uint32)
        f = jax.vmap(lambda row, i: jax.lax.dynamic_slice(row, (i,), (4,)))
        for k in range(64):
            acc = acc ^ f(words, (idx + k) % (L - 4))
        return acc

    for name, fn in (("64x elem-gather", g_elem),
                     ("64x slice2-gather", g_slice2),
                     ("64x slice4-gather", g_slice4)):
        clock(name, jax.jit(fn), (words, idx))

    # scan variants on real data
    from imagegen import make_test_image
    from jpezy_tpu.bitstream.reader import parse
    from jpezy_tpu.codec import jax_codec as JC
    from jpezy_tpu.codec.jax_codec import _device_host_frontend
    from jpezy_tpu.ops import entropy_decode as ED

    N, h, w = 16, 512, 512
    rgbs = np.stack([make_test_image(h, w, seed=i) for i in range(N)])
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
    ctab = ED.device_lut(ED.build_decode_chain_tables(pjs[0].huff))
    ltab = ED.device_lut(ED.build_decode_lut(pjs[0].huff))

    scan = jax.jit(functools.partial(
        ED.decode_segments, max_blocks=RI * 6, unroll=1))
    scanout = clock("scan chain baseline", scan, (wd, nb, ctab, tsel, rl))
    clock("scan lut baseline", scan, (wd, nb, ltab, tsel, rl))

    # ablations by MARGINAL ADDITION (removing work would change the
    # data-dependent iteration count; adding work masked by a runtime-zero
    # the compiler cannot fold keeps iterations identical, so the delta is
    # the cost of exactly one extra <thing> per iteration)
    import jpezy_tpu.ops.entropy_decode as EDm

    src = open(EDm.__file__).read()
    REFILL = ("w = jnp.take_along_axis(\n"
              "            words, jnp.minimum(widx, Lw - 1)[:, None],"
              " axis=1)[:, 0]")
    assert REFILL in src, "refill line moved"
    ZMASK = ("\n        _zm = (nblk.astype(jnp.uint32)"
             " & jnp.uint32(0x80000000))  # runtime zero\n        ")

    def _load(code, tag):
        ns = {"__name__": "jpezy_tpu.ops." + tag,
              "__package__": "jpezy_tpu.ops"}
        exec(compile(code, tag, "exec"), ns)
        return ns

    variants = {
        "+1 elem gather/iter": src.replace(REFILL, REFILL + ZMASK +
            "wx = jnp.take_along_axis(words, jnp.minimum(widx + 1, Lw - 1)"
            "[:, None], axis=1)[:, 0]\n        w = w | (wx & _zm)"),
        "+1 slice2 gather/iter": src.replace(REFILL, REFILL + ZMASK +
            "wx = jax.vmap(lambda row, i: jax.lax.dynamic_slice(row, (i,),"
            " (2,)))(words, jnp.minimum(widx, Lw - 2))\n        "
            "w = w | (wx[:, 0] & wx[:, 1] & _zm)"),
        "+1 onehot acc/iter": src.replace(
            "blk = blk + jnp.where(onehot_nat, wval[:, None], 0)",
            "blk = blk + jnp.where(onehot_nat, wval[:, None], 0)\n        "
            "blk = blk + jnp.where(onehot_nat, (wval & (run & 0x10000))"
            "[:, None], 0)"),
        "+1 chain/iter": src.replace(
            "ln, val, badsym = sym_fn((win >> 16).astype(jnp.int32), is_dc,\n"
            "                                 row, tab_c)",
            "ln, val, badsym = sym_fn((win >> 16).astype(jnp.int32), is_dc,\n"
            "                                 row, tab_c)\n        "
            "_l2, _v2, _b2 = sym_fn(((win >> 16).astype(jnp.int32)) | "
            "(val & 0x10000), is_dc, row, tab_c)\n        "
            "val = val | (_v2 & (val & 0x10000))"),
    }
    for name, code in variants.items():
        ns = _load(code, "ed_" + name.replace(" ", "_").replace("/", "_")
                   .replace("+", "p"))
        fn = jax.jit(functools.partial(
            ns["decode_segments"].__wrapped__, max_blocks=RI * 6, unroll=1))
        out = clock(f"scan chain {name}", fn, (wd, nb, ctab, tsel, rl))
        assert np.array_equal(np.asarray(out[0]),
                              np.asarray(scanout[0])), name


if __name__ == "__main__":
    main()
