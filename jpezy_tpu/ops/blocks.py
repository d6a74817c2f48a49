"""Plane <-> block layout transforms (device, jnp).

Pure reshape/transpose, so XLA fuses them into neighboring kernels for free.
Block ordering matches the reference MCU walk: MCUs raster row-major, luma
blocks TL,TR,BL,BR within an MCU (src/encoder/jpezy_encoder.hpp:94-133),
component blocks raster within an MCU on decode (jpezy_decoder.hpp:513-514).
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_replicate(plane: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Edge replication to (ph, pw) (jpezy_encoder.hpp:101,104)."""
    h, w = plane.shape
    return jnp.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def blockify_luma(y: jnp.ndarray) -> jnp.ndarray:
    """[H16, W16] -> [nmcu*4, 64], MCU order TL,TR,BL,BR."""
    my, mx = y.shape[0] // 16, y.shape[1] // 16
    b = y.reshape(my, 2, 8, mx, 2, 8)
    b = b.transpose(0, 3, 1, 4, 2, 5)
    return b.reshape(my * mx * 4, 64)


def blockify_chroma(c: jnp.ndarray) -> jnp.ndarray:
    """[H8, W8] decimated chroma -> [nmcu, 64]."""
    my, mx = c.shape[0] // 8, c.shape[1] // 8
    return c.reshape(my, 8, mx, 8).transpose(0, 2, 1, 3).reshape(my * mx, 64)


def deblockify(blocks: jnp.ndarray, mcus_y: int, mcus_x: int,
               v: int, h: int) -> jnp.ndarray:
    """[B, 64] MCU-ordered component blocks -> plane [mcus_y*v*8, mcus_x*h*8]."""
    b = blocks.reshape(mcus_y, mcus_x, v, h, 8, 8)
    return b.transpose(0, 2, 4, 1, 3, 5).reshape(mcus_y * v * 8, mcus_x * h * 8)


def upsample_nearest(plane: jnp.ndarray, dup_y: int, dup_x: int) -> jnp.ndarray:
    """Nearest-neighbor duplication (jpezy_decoder.hpp:519-524)."""
    if dup_y == 1 and dup_x == 1:
        return plane
    return jnp.repeat(jnp.repeat(plane, dup_y, axis=0), dup_x, axis=1)


def decimate_420(plane: jnp.ndarray) -> jnp.ndarray:
    """4:2:0 decimation: top-left of each 2x2, no averaging
    (jpezy_encoder.hpp:116-143)."""
    return plane[0::2, 0::2]
