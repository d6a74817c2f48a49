"""Single-chip JAX codec pipelines (the device fast path).

Encode: one jitted program from RGB planes to per-block packed entropy words;
the host then splices block bitstrings, stuffs bytes, and prepends the JFIF
header (jpezy_tpu.bitstream).  Decode: host entropy frontend produces [B, 64]
coefficient blocks; one jitted program dequantizes, IDCTs, upsamples and
color-converts back to RGB planes.

precision:
  "fast"  - float32 transforms (default; identical stream validity/quality,
            rare +-1 coefficient/pixel differences vs the reference's doubles)
  "exact" - float64 transforms, bit-identical to the numpy oracle / the
            reference's double math (requires jax_enable_x64).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import tables as T
from ..core.geometry import ComponentGeometry, EncodeGeometry
from ..core.props import ImageProps, make_encode_props
from ..bitstream import writer
from ..bitstream.reader import ParsedJpeg, parse, split_entropy_segments
from ..bitstream.splice import splice_blocks
from ..ops import blocks as B
from ..ops import colorspace as C
from ..ops import dct as D
from ..ops import entropy as E
from ..ops import quantize as Q


def _dtype(precision: str):
    if precision == "exact":
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "precision='exact' needs float64: set jax.config.update('jax_enable_x64', True)"
            )
        return jnp.float64
    return jnp.float32


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ph", "pw", "gray", "precision", "rounded"))
def encode_to_blocks(r, g, b, *, ph: int, pw: int, gray: bool,
                     precision: str = "fast", rounded: bool = False):
    """RGB planes [H, W] uint8 -> per-block entropy words + bit counts.

    Returns (words [nmcu*6, 64] uint32, bits [nmcu*6] int32) in MCU emission
    order Y0 Y1 Y2 Y3 Cb Cr.
    """
    dt = _dtype(precision)
    y, cb, cr = C.rgb_to_ycc(r, g, b, dt)
    y = B.pad_replicate(y, ph, pw)
    cb = B.decimate_420(B.pad_replicate(cb, ph, pw))
    cr = B.decimate_420(B.pad_replicate(cr, ph, pw))

    yb = B.blockify_luma(y)
    cbb = B.blockify_chroma(cb)
    crb = B.blockify_chroma(cr)
    if gray:
        cbb = jnp.zeros_like(cbb)
        crb = jnp.zeros_like(crb)

    yq = Q.quantize(D.forward_dct(yb, dt), chroma=False, rounded=rounded)
    cbq = Q.quantize(D.forward_dct(cbb, dt), chroma=True, rounded=rounded)
    crq = Q.quantize(D.forward_dct(crb, dt), chroma=True, rounded=rounded)

    streams = []
    for q, chroma in ((yq, False), (cbq, True), (crq, True)):
        hi, lo, n = E.block_emissions(q, E.dc_predictors(q[:, 0]), chroma)
        streams.append(E.pack_block_words(hi, lo, n))

    (yw, ybits), (cbw, cbbits), (crw, crbits) = streams
    nm = cbw.shape[0]
    W = E.WORDS_PER_BLOCK
    words = jnp.concatenate(
        [yw.reshape(nm, 4, W), cbw.reshape(nm, 1, W), crw.reshape(nm, 1, W)],
        axis=1,
    ).reshape(nm * 6, W)
    bits = jnp.concatenate(
        [ybits.reshape(nm, 4), cbbits.reshape(nm, 1), crbits.reshape(nm, 1)],
        axis=1,
    ).reshape(nm * 6)
    return words, bits


def encode(r: np.ndarray, g: np.ndarray, b: np.ndarray,
           props: ImageProps | None = None, *, gray: bool = False,
           precision: str = "fast", rounded: bool = False) -> bytes:
    """Full encode: RGB planes [H, W] uint8 -> baseline JFIF bytes."""
    h, w = r.shape
    if props is None:
        props = make_encode_props(w, h, gray=gray)
    geo = EncodeGeometry(width=w, height=h)
    words, bits = encode_to_blocks(
        jnp.asarray(r), jnp.asarray(g), jnp.asarray(b),
        ph=geo.padded_height, pw=geo.padded_width, gray=gray,
        precision=precision, rounded=rounded,
    )
    packed, _ = splice_blocks(np.asarray(words), np.asarray(bits))
    header = writer.write_header(props)
    return writer.assemble(header, packed)


@functools.partial(jax.jit, static_argnames=("gray", "precision", "rounded"))
def _encode_batch_blocks(r, g, b, *, gray=False, precision="fast", rounded=False):
    from ..parallel.sharded import _encode_local

    return _encode_local(r, g, b, gray=gray, dtype=_dtype(precision),
                         rounded=rounded, tile_axis=None)


def encode_batch(rgbs: np.ndarray, *, gray: bool = False,
                 precision: str = "fast", rounded: bool = False) -> list[bytes]:
    """Encode a uniform batch [N, H, W, 3] uint8 -> list of JFIF streams.

    H, W must be multiples of 16 (use encode() per image otherwise; batched
    mixed sizes go through bucketing in jpezy_tpu.runtime.batch).
    """
    n, h, w = rgbs.shape[:3]
    if h % 16 or w % 16:
        raise ValueError("encode_batch needs multiple-of-16 dims")
    words, bits = _encode_batch_blocks(
        jnp.asarray(rgbs[..., 0]), jnp.asarray(rgbs[..., 1]),
        jnp.asarray(rgbs[..., 2]), gray=gray, precision=precision,
        rounded=rounded,
    )
    words = np.asarray(words)
    bits = np.asarray(bits)
    header = writer.write_header(make_encode_props(w, h, gray=gray))
    out = []
    for i in range(n):
        packed, _ = splice_blocks(words[i], bits[i])
        out.append(writer.assemble(header, packed))
    return out


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("mcus_y", "mcus_x", "v", "h", "dup_y", "dup_x", "level", "precision"),
)
def decode_component_plane(coeff_blocks, qtable, *, mcus_y, mcus_x, v, h,
                           dup_y, dup_x, level, precision="fast"):
    """[B, 64] coefficient blocks -> upsampled int32 component plane."""
    dt = _dtype(precision)
    deq = Q.dequantize(coeff_blocks, qtable)
    spat = D.inverse_dct(deq, level, dt)
    plane = B.deblockify(spat, mcus_y, mcus_x, v, h)
    return B.upsample_nearest(plane, dup_y, dup_x)


@functools.partial(jax.jit, static_argnames=("precision",))
def planes_to_rgb(y, cb, cr, *, precision="fast"):
    return C.ycc_to_rgb(y, cb, cr, _dtype(precision))


@functools.partial(jax.jit, static_argnames=("precision",))
def plane_to_gray(y, *, precision="fast"):
    return C.clamp_gray(y, _dtype(precision))


def decode_entropy_host(pj: ParsedJpeg) -> list[np.ndarray]:
    """Host entropy frontend: serial Huffman decode -> [B, 64] blocks/component.

    Uses the C++ native scanner when available, else the numpy LUT decoder.
    """
    from . import oracle as _o

    hmax, vmax = pj.hmax, pj.vmax
    geos = [
        ComponentGeometry(fc.H, fc.V, hmax, vmax, pj.props.width, pj.props.height)
        for fc in pj.frame_components
    ]
    mcus_x, mcus_y = geos[0].mcus_x, geos[0].mcus_y

    try:
        from ..runtime import native

        return native.entropy_decode(pj, mcus_x * mcus_y)
    except (ImportError, OSError, RuntimeError):
        pass

    dc_lut = [_o._huff_lut(pj.huff[0][sc.Td]) for sc in pj.scan_components]
    ac_lut = [_o._huff_lut(pj.huff[1][sc.Ta]) for sc in pj.scan_components]
    comp_order = [(i, geos[i].blocks_per_mcu) for i in range(len(pj.scan_components))]
    segments, _ = split_entropy_segments(pj.data, pj.entropy_start)
    out: list[list[np.ndarray]] = [[] for _ in pj.frame_components]
    pred = np.zeros(3, dtype=np.int64)
    n_total = mcus_x * mcus_y
    ri = pj.restart_interval if pj.restart_interval else n_total
    done = 0
    for seg in segments:
        if done >= n_total:
            break
        todo = min(ri, n_total - done)
        br = _o._BitReader(seg)
        _o.decode_segment_blocks(br, todo, comp_order, dc_lut, ac_lut, pred, out)
        done += todo
        pred[:] = 0
    if done < n_total:
        raise ValueError("truncated entropy data")
    return [np.stack(o) for o in out]


def decode(data: bytes, *, gray: bool = False, precision: str = "fast"):
    """Decode baseline JPEG bytes -> (r, g, b [H, W] uint8, ImageProps)."""
    pj = parse(data)
    props = pj.props
    hmax, vmax = pj.hmax, pj.vmax
    geos = [
        ComponentGeometry(fc.H, fc.V, hmax, vmax, props.width, props.height)
        for fc in pj.frame_components
    ]
    mcus_x, mcus_y = geos[0].mcus_x, geos[0].mcus_y
    level = 128 if props.sample_precision == 8 else 2048

    comp_blocks = decode_entropy_host(pj)
    planes = []
    for i, fc in enumerate(pj.frame_components):
        plane = decode_component_plane(
            jnp.asarray(comp_blocks[i]),
            jnp.asarray(pj.quant[fc.Tq]),
            mcus_y=mcus_y, mcus_x=mcus_x, v=fc.V, h=fc.H,
            dup_y=geos[i].dup_y, dup_x=geos[i].dup_x,
            level=level, precision=precision,
        )
        planes.append(plane)

    H, W = props.height, props.width
    ncomp = len(pj.frame_components)
    y = planes[0][:H, :W]
    if gray or ncomp == 1:
        gv = np.asarray(plane_to_gray(y, precision=precision))
        return gv, gv.copy(), gv.copy(), props
    cb = planes[1][:H, :W]
    cr = planes[2][:H, :W]
    r, g, b = planes_to_rgb(y, cb, cr, precision=precision)
    return np.asarray(r), np.asarray(g), np.asarray(b), props
