"""Color conversion ops (device, jnp).

Batched over whole planes; the reference does this per pixel inside the MCU
loop (src/encoder/jpezy_encoder.hpp:244-263, src/decoder/jpezy_decoder.hpp:567-578).
XLA fuses these elementwise stages into neighboring ops on the VPU.

dtype float32 is the fast path; float64 ("exact" mode) reproduces the
reference's double-precision truncation bit-for-bit.
"""
from __future__ import annotations

import jax.numpy as jnp


def rgb_to_ycc(r, g, b, dtype=jnp.float32):
    """RGB -> (Y-128, Cb, Cr) with C int() truncation.

    Expression order matches jpezy_encoder.hpp:245-256 so float64 mode is
    bit-exact vs the reference.
    """
    rf = r.astype(dtype)
    gf = g.astype(dtype)
    bf = b.astype(dtype)
    y = ((0.2990 * rf) + (0.5870 * gf) + (0.1140 * bf) - 128.0).astype(jnp.int32)
    cb = (-(0.1687 * rf) - (0.3313 * gf) + (0.5000 * bf)).astype(jnp.int32)
    cr = ((0.5000 * rf) - (0.4187 * gf) - (0.0813 * bf)).astype(jnp.int32)
    return y, cb, cr


def ycc_to_rgb(y, cb, cr, dtype=jnp.float32):
    """(Y+128-domain, Cb, Cr) int samples -> clamped uint8 RGB.

    Matches jpezy_decoder.hpp:567-578 (to_r/to_g/to_b) with revise_value
    clamping (:672-676): <0 -> 0, >255 -> 255, else truncate toward zero.
    """
    yf = y.astype(dtype)
    cbf = cb.astype(dtype)
    crf = cr.astype(dtype)
    r = yf + (crf - 128.0) * 1.4020
    g = yf - (cbf - 128.0) * 0.3441 - (crf - 128.0) * 0.7139
    b = yf + (cbf - 128.0) * 1.7718

    def clamp(v):
        return jnp.clip(jnp.trunc(v), 0.0, 255.0).astype(jnp.uint8)

    return clamp(r), clamp(g), clamp(b)


def clamp_gray(y, dtype=jnp.float32):
    """GRAY_MODE output: clamp luma directly (jpezy_decoder.hpp:560-562)."""
    return jnp.clip(jnp.trunc(y.astype(dtype)), 0.0, 255.0).astype(jnp.uint8)
