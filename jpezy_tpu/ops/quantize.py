"""Quantization ops (device, jnp).

The reference quantizes with C integer division, which truncates toward zero
(src/encoder/jpezy_encoder.hpp:168-172) --- NOT floor division.  jnp's ``//``
floors, so we compute sign * (|v| // q).

``rounded=True`` is an extension beyond the reference: round-to-nearest
quantization (libjpeg-style) gains ~1-2 dB PSNR at identical stream size and
remains fully standard-compliant.  Default off for reference parity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import tables as T


def quantize(coeffs: jnp.ndarray, chroma: bool, *, rounded: bool = False,
             qtable=None) -> jnp.ndarray:
    if qtable is None:
        qtable = T.C_QUANT if chroma else T.Y_QUANT
    q = jnp.asarray(qtable)[None, :]
    if rounded:
        a = jnp.abs(coeffs)
        return (jnp.sign(coeffs) * ((2 * a + q) // (2 * q))).astype(jnp.int32)
    return (jnp.sign(coeffs) * (jnp.abs(coeffs) // q)).astype(jnp.int32)


def dequantize(coeffs: jnp.ndarray, qtable: np.ndarray) -> jnp.ndarray:
    """Elementwise multiply by the (de-zigzagged) table
    (jpezy_decoder.hpp:645-650)."""
    return coeffs * jnp.asarray(qtable, dtype=jnp.int32)[None, :]
