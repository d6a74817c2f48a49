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
