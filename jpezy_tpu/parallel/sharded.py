"""Mesh-sharded codec pipelines (shard_map over a ('data', 'tile') mesh).

Everything in the codec is block-local except two sequential dependencies
(SURVEY.md section 2.7):

  - the per-component DC predictor chain on encode: handled by exchanging one
    carry value per component between neighboring 'tile' shards with a single
    `ppermute` (shard k's first predictor = shard k-1's last DC);
  - the entropy bit cursor: per-shard bitstrings are packed independently on
    device and spliced on the host (byte-granular work).

Sharding layout: images over 'data' (no collectives), contiguous MCU-row
ranges of each image over 'tile'.  On a pod slice put 'data' on DCN and
'tile' on ICI.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import blocks as B
from ..ops import colorspace as C
from ..ops import dct as D
from ..ops import entropy as E
from ..ops import quantize as Q


def _encode_local(r, g, b, *, gray: bool, dtype, rounded: bool, tile_axis: str | None,
                  use_pallas: bool | None = None):
    """Encode the local shard: [N_loc, H_loc, W] planes -> (words, bits).

    H_loc must be a multiple of 16 (whole MCU rows per shard).
    """
    y, cb, cr = C.rgb_to_ycc(r, g, b, dtype)
    cb = jax.vmap(B.decimate_420)(cb)
    cr = jax.vmap(B.decimate_420)(cr)
    return _encode_local_ycc(
        y, cb, cr, gray=gray, dtype=dtype, rounded=rounded,
        tile_axis=tile_axis, use_pallas=use_pallas,
    )


def _encode_local_ycc(y, cb, cr, *, gray: bool, dtype, rounded: bool,
                      tile_axis: str | None, use_pallas: bool | None = None):
    """Encode from level-shifted YCC planes (chroma already 4:2:0 decimated).

    y: [N_loc, H_loc, W] int (Y-128); cb/cr: [N_loc, H_loc/2, W/2] int.
    Entry point for the host-converted int8 upload transport (half the
    link bytes of RGB; see codec.jax_codec.host_rgb_to_ycc420).
    """
    yq, cbq, crq = _quantize_local_ycc(
        y, cb, cr, gray=gray, dtype=dtype, rounded=rounded)
    return _emit_local(yq, cbq, crq, tile_axis=tile_axis,
                       use_pallas=use_pallas)


def _quantize_local_ycc(y, cb, cr, *, gray: bool, dtype, rounded: bool):
    """YCC planes -> per-component quantized blocks [N_loc, B_loc, 64]."""
    yb = jax.vmap(B.blockify_luma)(y)
    cbb = jax.vmap(B.blockify_chroma)(cb)
    crb = jax.vmap(B.blockify_chroma)(cr)
    if gray:
        cbb = jnp.zeros_like(cbb)
        crb = jnp.zeros_like(crb)
    out = []
    for blk, chroma in ((yb, False), (cbb, True), (crb, True)):
        n_loc, b_loc, _ = blk.shape
        out.append(Q.quantize(
            D.forward_dct(blk.reshape(-1, 64), dtype), chroma, rounded=rounded
        ).reshape(n_loc, b_loc, 64))
    return tuple(out)


def _emit_local(yq, cbq, crq, *, tile_axis: str | None,
                use_pallas: bool | None = None, tables=(None, None)):
    """Quantized blocks -> (words, bits), with the DC-carry ppermute when
    tile-sharded.  tables: optional (ytables, ctables) custom flat Huffman
    tables (see ops.entropy.block_emissions)."""
    ems = []
    for q, chroma, tabs in ((yq, False, tables[0]), (cbq, True, tables[1]),
                            (crq, True, tables[1])):
        n_loc, b_loc, _ = q.shape
        dc = q[:, :, 0]
        if tile_axis is not None:
            axis_size = jax.lax.axis_size(tile_axis)
            # carry: previous shard's last DC is this shard's first predictor
            prev = jax.lax.ppermute(
                dc[:, -1], tile_axis, [(i, i + 1) for i in range(axis_size - 1)]
            )
        else:
            prev = jnp.zeros_like(dc[:, -1])
        pred = jnp.concatenate([prev[:, None], dc[:, :-1]], axis=1)
        # flatten images into the block axis: emissions are block-local
        # (the DC chain is already captured in `pred`), and vmap would
        # serialize the Pallas pack kernel
        hi, lo, nb = E.block_emissions(
            q.reshape(-1, 64), pred.reshape(-1), chroma, tables=tabs
        )
        ems.append(tuple(x.reshape(n_loc, b_loc, 64) for x in (hi, lo, nb)))

    n_loc = ems[1][0].shape[0]
    nm = ems[1][0].shape[1]
    # interleave emissions to MCU order (Y0..Y3, Cb, Cr), then pack once
    hi, lo, nb = (
        jnp.concatenate(
            [ems[0][j].reshape(n_loc, nm, 4, 64),
             ems[1][j].reshape(n_loc, nm, 1, 64),
             ems[2][j].reshape(n_loc, nm, 1, 64)], axis=2
        ).reshape(n_loc * nm * 6, 64)
        for j in range(3)
    )
    words, bits = E.pack_block_words(hi, lo, nb, use_pallas=use_pallas)
    W = words.shape[-1]
    return words.reshape(n_loc, nm * 6, W), bits.reshape(n_loc, nm * 6)


def make_sharded_encode(mesh: Mesh, *, gray: bool = False,
                        precision: str = "fast", rounded: bool = False):
    """Build a jitted sharded encode step.

    fn(r, g, b): [N, H, W] uint8 (H, W multiples of 16; N divisible by the
    'data' axis; H/16 divisible by the 'tile' axis) ->
    (words [N, nmcu*6, 64] uint32, bits [N, nmcu*6] int32), both sharded
    P('data', 'tile').
    """
    dtype = jnp.float64 if precision == "exact" else jnp.float32

    # pick the packer for the devices that will actually run the shard_map
    # (the process default backend may differ from the mesh's platform,
    # e.g. a CPU validation mesh on a TPU host)
    mesh_platform = np.asarray(mesh.devices).flat[0].platform
    use_pallas = (mesh_platform == "tpu"
                  and os.environ.get("JPEZY_NO_PALLAS") != "1")
    local = functools.partial(
        _encode_local, gray=gray, dtype=dtype, rounded=rounded,
        tile_axis="tile", use_pallas=use_pallas,
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", "tile", None),) * 3,
        out_specs=(P("data", "tile", None), P("data", "tile")),
        # pallas_call inside shard_map can't infer vma on this jax version
        check_vma=False,
    )
    return jax.jit(fn)


def _decode_local(coeff, qtable, *, v, h, dup_y, dup_x, mcus_x, level, dtype):
    """[N_loc, B_loc, 64] absolute-DC coefficient blocks -> local planes."""
    n_loc, b_loc, _ = coeff.shape
    mcus_y_loc = b_loc // (v * h) // mcus_x
    deq = Q.dequantize(coeff.reshape(-1, 64), qtable)
    spat = D.inverse_dct(deq, level, dtype).reshape(n_loc, b_loc, 64)
    plane = jax.vmap(
        lambda s: B.deblockify(s, mcus_y_loc, mcus_x, v, h)
    )(spat)
    return jax.vmap(lambda p: B.upsample_nearest(p, dup_y, dup_x))(plane)


def make_sharded_decode_component(mesh: Mesh, *, v: int, h: int, dup_y: int,
                                  dup_x: int, mcus_x: int, level: int = 128,
                                  precision: str = "fast"):
    """Build a jitted sharded per-component decode backend.

    fn(coeff [N, B, 64] int32 sharded P('data','tile'), qtable [64]) ->
    upsampled planes [N, H_mcu, W_mcu] sharded P('data','tile').
    Block axis sharding = contiguous MCU-row ranges.
    """
    dtype = jnp.float64 if precision == "exact" else jnp.float32
    local = functools.partial(
        _decode_local, v=v, h=h, dup_y=dup_y, dup_x=dup_x,
        mcus_x=mcus_x, level=level, dtype=dtype,
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", "tile", None), P(None)),
        out_specs=P("data", "tile", None),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_batch(mesh: Mesh, arr: np.ndarray) -> jax.Array:
    """Place [N, H, W] host batch onto the mesh with P('data', 'tile')."""
    return jax.device_put(arr, NamedSharding(mesh, P("data", "tile", None)))
