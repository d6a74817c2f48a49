"""Images/s scaling measurement across mesh sizes (BASELINE config 5).

Runs the sharded encode pipeline at mesh sizes 1, 2, 4, ... over the
available devices and reports images/s + scaling efficiency.  On the CPU
backend this measures orchestration overhead (upper-bounds the collective
cost); on a pod slice it measures true scaling (run one process per host
with jpezy_tpu.parallel.distributed.initialize first).

Usage: python scripts/scaling.py [--devices N] [--batch N] [--size HxW]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices or 8}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from imagegen import make_test_image
    from jpezy_tpu.parallel.api import encode_sharded
    from jpezy_tpu.parallel.mesh import make_mesh

    h, w = (int(x) for x in args.size.split("x"))
    ndev = args.devices or len(jax.devices())
    batch = np.stack([make_test_image(h, w, seed=i) for i in range(args.batch)])

    base = None
    mesh_sizes = []
    n = 1
    while n <= ndev:
        mesh_sizes.append(n)
        n *= 2
    for n in mesh_sizes:
        # favor tile sharding within an image; data across if batch allows
        tile = n
        data = 1
        if (h // 16) % tile != 0:
            data = min(n, args.batch)
            tile = n // data
        try:
            mesh = make_mesh(data=data, tile=tile)
            streams = encode_sharded(mesh, batch)  # compile
            t0 = time.time()
            for _ in range(3):
                streams = encode_sharded(mesh, batch)
            dt = (time.time() - t0) / 3
        except Exception as e:  # mesh shape not applicable
            print(f"mesh {data}x{tile}: skipped ({e})")
            continue
        ips = args.batch / dt
        if base is None:
            base = ips
        eff = ips / (base * n) * 100
        print(f"mesh data={data} tile={tile}: {ips:8.1f} images/s "
              f"(x{ips/base:4.1f}, efficiency {eff:5.1f}%)")
        assert len(streams) == args.batch
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
