"""Tiny TPU liveness probe with graceful self-timeout.

Exits 0 when the chip answers a 4-byte round trip, 3 when the claim did
not come through within --wait seconds.  Uses SIGALRM + os._exit so the
client never dies mid-claim (a hard kill can wedge the remote chip claim;
see bench.py).
"""
import os
import signal
import sys
import time


def main():
    wait = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    def _bail(signum, frame):
        print(f"probe: no chip within {wait}s", flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(wait)
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    d = jax.devices()
    x = np.asarray(jnp.asarray(np.ones(4, np.uint8)))
    signal.alarm(0)
    print(f"probe: chip ok {d} in {time.time()-t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
