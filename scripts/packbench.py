"""A/B the pack_block_words implementations (fori / prefix / reduce / pallas)
for bit-equality and steady-state device time at bench shapes.

Usage: python scripts/packbench.py [B]   (default 98304 = 16x512x512 blocks)
On CPU backends the pallas variant is skipped.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("JPEZY_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from jpezy_tpu.ops import entropy as E

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    print("devices:", jax.devices(), "B =", B, flush=True)

    # realistic emissions: quantize a noise+gradient mix like the bench images
    rng = np.random.default_rng(0)
    q = (rng.normal(0, 2, (B, 64)) ** 3).astype(np.int32)
    q[:, 0] = rng.integers(-200, 200, B)
    q[:, 32:] = 0  # typical high-frequency sparsity
    dq = jnp.asarray(q)
    pred = E.dc_predictors(dq[:, 0])
    hi, lo, nb = jax.jit(functools.partial(E.block_emissions, chroma=False))(
        dq, pred)
    hi, lo, nb = map(jax.block_until_ready, (hi, lo, nb))

    methods = ["fori", "prefix", "reduce"]
    if jax.default_backend() == "tpu":
        from jpezy_tpu.ops.pack_pallas import warm_pack_kernel

        t0 = time.time()
        warm_pack_kernel()
        print(f"pallas warm: {time.time()-t0:.1f}s", flush=True)
        methods.append("pallas")

    ref = None
    for m in methods:
        os.environ["JPEZY_PACK"] = m
        fn = jax.jit(E.pack_block_words)
        t0 = time.time()
        words, bits = map(jax.block_until_ready, fn(hi, lo, nb))
        t_first = time.time() - t0
        # block_until_ready is enqueue-only on the tunneled backend, so
        # bracket K back-to-back executions with a 1-element fetch (a real
        # sync point), best of 3 (same method as bench.py's attribution)
        K = 8
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                wk, bk = fn(hi, lo, nb)
            _ = np.asarray(bk[:1])
            ts.append((time.perf_counter() - t0 - 0.025) / K)
        wn, bn = np.asarray(words), np.asarray(bits)
        if ref is None:
            ref = (wn, bn)
            ok = "ref"
        else:
            ok = ("OK" if (np.array_equal(wn, ref[0])
                           and np.array_equal(bn, ref[1])) else "MISMATCH")
        print(f"pack[{m:7s}] first {t_first*1e3:9.1f}ms  "
              f"steady {min(ts)*1e3:8.2f}ms  equality: {ok}", flush=True)
        # fresh jit cache per method (env is read at trace time)
        E.pack_block_words.__dict__.pop("_cache", None)
    os.environ.pop("JPEZY_PACK", None)


if __name__ == "__main__":
    main()
