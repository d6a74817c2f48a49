"""Quantization ops (device, jnp).

The reference quantizes with C integer division, which truncates toward zero
(src/encoder/jpezy_encoder.hpp:168-172) --- NOT floor division.

Integer division lowers to a long instruction sequence on the VPU (the
round-5 probe measured the div formulation 6.6x slower than the
reciprocal form at [393k, 64]), so the device path computes
``c = trunc(|v| * (1/q))`` in float32 and then EXACTLY repairs the +-1
boundary cases with two integer fixups: |v| <= 2^15 and q <= 510 keep
every float32 product within 2^-24 relative error < 0.003 absolute, so
the candidate is off by at most one, and ``(c+1)*q <= |v|`` / ``c*q > |v|``
restore C semantics bit-exactly (asserted against the // form in
tests/test_jax_codec.py).

``rounded=True`` is an extension beyond the reference: round-to-nearest
quantization (libjpeg-style) gains ~1-2 dB PSNR at identical stream size and
remains fully standard-compliant.  Default off for reference parity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import tables as T


def _trunc_div_recip(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Exact a // q for 0 <= a < 2^15, 1 <= q <= 510 without integer div."""
    rf = 1.0 / q.astype(jnp.float32)
    c = (a.astype(jnp.float32) * rf).astype(jnp.int32)
    return (c + ((c + 1) * q <= a).astype(jnp.int32)
            - (c * q > a).astype(jnp.int32))


def quantize(coeffs: jnp.ndarray, chroma: bool, *, rounded: bool = False,
             qtable=None) -> jnp.ndarray:
    if qtable is None:
        qtable = T.C_QUANT if chroma else T.Y_QUANT
    q = jnp.asarray(qtable, jnp.int32)[None, :]
    a = jnp.abs(coeffs).astype(jnp.int32)
    if rounded:
        c = _trunc_div_recip(2 * a + q, 2 * q)
    else:
        c = _trunc_div_recip(a, q)
    return (jnp.sign(coeffs).astype(jnp.int32) * c).astype(jnp.int32)


def dequantize(coeffs: jnp.ndarray, qtable: np.ndarray) -> jnp.ndarray:
    """Elementwise multiply by the (de-zigzagged) table
    (jpezy_decoder.hpp:645-650)."""
    return coeffs * jnp.asarray(qtable, dtype=jnp.int32)[None, :]
