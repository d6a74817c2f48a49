"""High-level sharded codec entry points.

encode_sharded: image batch + ('data','tile') mesh -> JFIF streams, with the
DC-carry collective across tile shards and per-shard device packing; the
host splices shard streams (byte-granular).

For pod slices: build the mesh with 'data' across hosts (DCN) and 'tile'
across the ICI ring; see jpezy_tpu.parallel.distributed for multi-host init.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from ..bitstream import writer
from ..bitstream.splice import splice_blocks
from ..core.props import make_encode_props
from . import sharded


def decode_sharded(mesh: Mesh, streams: list[bytes], *,
                   precision: str = "fast") -> np.ndarray:
    """Decode same-geometry JPEGs with the device stages sharded over the
    mesh (images x MCU-row tiles) -> [N, H, W, 3] uint8.

    The entropy frontend runs on the host (see docs/DESIGN.md section 4);
    coefficient blocks shard over 'tile' (contiguous MCU-row ranges), the
    dequant/IDCT/upsample stages run shard-local with no collectives, and
    the color conversion happens after a gather of the luma-resolution
    planes.
    """
    import jax.numpy as jnp

    from ..bitstream.reader import parse
    from ..codec import jax_codec
    from ..core.geometry import ComponentGeometry
    from . import sharded as _sh

    pjs = [parse(s) for s in streams]
    p0 = pjs[0]
    hmax, vmax = p0.hmax, p0.vmax
    geos = [
        ComponentGeometry(fc.H, fc.V, hmax, vmax, p0.props.width,
                          p0.props.height)
        for fc in p0.frame_components
    ]
    mcus_x, mcus_y = geos[0].mcus_x, geos[0].mcus_y
    level = 128 if p0.props.sample_precision == 8 else 2048
    per_image = [jax_codec.decode_entropy_host(pj) for pj in pjs]

    planes = []
    for c, fc in enumerate(p0.frame_components):
        blocks = np.stack([pi[c] for pi in per_image])
        fn = _sh.make_sharded_decode_component(
            mesh, v=fc.V, h=fc.H, dup_y=geos[c].dup_y, dup_x=geos[c].dup_x,
            mcus_x=mcus_x, level=level, precision=precision,
        )
        arr = jax.device_put(
            blocks,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data", "tile", None)
            ),
        )
        planes.append(np.asarray(fn(arr, jnp.asarray(p0.quant[fc.Tq]))))

    H, W = p0.props.height, p0.props.width
    from ..ops import colorspace as C
    import jax.numpy as jnp2

    y = jnp2.asarray(planes[0][:, :H, :W])
    if len(planes) == 1:
        g = np.asarray(C.clamp_gray(y))
        return np.repeat(g[..., None], 3, axis=-1)
    cb = jnp2.asarray(planes[1][:, :H, :W])
    cr = jnp2.asarray(planes[2][:, :H, :W])
    r, g, b = C.ycc_to_rgb(y, cb, cr)
    return np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)


def encode_sharded(mesh: Mesh, batch_rgb: np.ndarray, *, gray: bool = False,
                   precision: str = "fast", rounded: bool = False) -> list[bytes]:
    """Encode [N, H, W, 3] uint8 over the mesh -> list of JFIF streams.

    Constraints: N % data_axis == 0, H % 16 == 0, W % 16 == 0,
    (H/16) % tile_axis == 0.
    """
    n, h, w = batch_rgb.shape[:3]
    fn = sharded.make_sharded_encode(
        mesh, gray=gray, precision=precision, rounded=rounded
    )
    r = sharded.shard_batch(mesh, batch_rgb[..., 0])
    g = sharded.shard_batch(mesh, batch_rgb[..., 1])
    b = sharded.shard_batch(mesh, batch_rgb[..., 2])
    words, bits = fn(r, g, b)
    words, bits = np.asarray(words), np.asarray(bits)
    header = writer.write_header(make_encode_props(w, h, gray=gray))
    out = []
    for i in range(n):
        packed, _ = splice_blocks(words[i], bits[i])
        out.append(writer.assemble(header, packed))
    return out
