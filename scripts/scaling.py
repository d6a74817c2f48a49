"""Images/s scaling measurement across mesh sizes (BASELINE config 5).

Runs the sharded encode pipeline at mesh sizes 1, 2, 4, ... over the
available devices and reports images/s + scaling efficiency.  On the CPU
backend this measures orchestration overhead (upper-bounds the collective
cost); on a pod slice it measures true scaling (run one process per host
with jpezy_tpu.parallel.distributed.initialize first).

Usage: python scripts/scaling.py [--devices N] [--batch N] [--size HxW]
       [--cpu] [--json OUT.json]

The driver-facing artifact (SCALING_r0N.json) is produced each round with:
    python scripts/scaling.py --cpu --devices 8 --batch 8 --size 1024x512 \
        --json SCALING_r0N.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
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
    results = []
    mesh_sizes = []
    n = 1
    while n <= ndev:
        mesh_sizes.append(n)
        n *= 2
    configs = []
    for n in mesh_sizes:
        # tile sharding within an image when the MCU rows divide evenly
        if (h // 16) % n == 0:
            configs.append((n, 1, n))
        # data sharding across images when the batch divides evenly
        d = min(n, args.batch)
        if n > 1 and d * (n // d) == n and args.batch % d == 0 and n // d == 1:
            configs.append((n, d, 1))
    for n, data, tile in configs:
        try:
            mesh = make_mesh(data=data, tile=tile)
            streams = encode_sharded(mesh, batch)  # compile
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                streams = encode_sharded(mesh, batch)
                ts.append(time.time() - t0)
            dt = min(ts)
        except Exception as e:  # mesh shape not applicable
            print(f"mesh {data}x{tile}: skipped ({e})")
            continue
        ips = args.batch / dt
        if base is None:
            base = ips
        eff = ips / (base * n) * 100
        print(f"mesh data={data} tile={tile}: {ips:8.1f} images/s "
              f"(x{ips/base:4.1f}, efficiency {eff:5.1f}%)")
        results.append({
            "devices": n, "data": data, "tile": tile,
            "images_per_s": round(ips, 2), "speedup": round(ips / base, 3),
            "efficiency_pct": round(eff, 1),
        })
        assert len(streams) == args.batch
    if args.json:
        payload = {
            "backend": jax.default_backend(),
            "size": args.size, "batch": args.batch,
            "note": ("CPU virtual mesh: measures orchestration + collective "
                     "overhead, not TPU compute scaling"),
            "results": results,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
