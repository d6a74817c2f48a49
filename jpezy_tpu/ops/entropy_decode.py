"""Device-side Huffman entropy DECODE over restart segments (pure XLA).

The reference's decode frontend is a strictly serial bit chain
(jpezy_decoder.hpp:583-642): one cursor, one symbol at a time.  DESIGN.md
section 4 keeps that on the host for arbitrary streams -- but restart
segments (T.81 F.2.1.3.1) are byte-aligned, reset the DC predictors, and
are therefore *independently decodable*: an image encoded with
restart_interval R yields ceil(nmcu/R) segments, and a batch yields
thousands -- exactly the width a TPU vector unit wants.

This module decodes ALL segments in lockstep:

  outer `lax.scan` over block slots (R MCUs x 6 blocks per segment);
    inner `lax.while_loop` over Huffman symbols until every lane finished
    its current block;
      per symbol and per lane: gather a 32-bit window from the destuffed
      big-endian word matrix (2 word gathers), one combined-LUT gather
      ([4, 65536]: Y/C x DC/AC, value = (HUFFVAL<<8)|bits, the same layout
      as the host LUT in runtime/native.py), then branch-free vector ops:
      category extraction, T.81 F.2.2.1 sign extension, ZRL/EOB control,
      and a one-hot accumulate into the current [S, 64] block register
      (the zigzag->natural permutation is a compile-time column permute,
      so there is NO scatter anywhere).

Completed blocks flush through the scan's ys into [S, R*6, 64] int16 --
MCU slot order (Y0 Y1 Y2 Y3 Cb Cr), which reshapes directly into the
per-component layout the dequant/IDCT backend consumes.  The upload for a
full decode is raw destuffed entropy bytes (~0.07 B/px) instead of sparse
coefficients (~0.6 B/px).

Everything is int32 arithmetic on [S]-vectors: no data-dependent Python
control flow, static shapes, one compiled program per (S, Lw, max_blocks)
bucket.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import tables as T

# natural-position one-hot from a zigzag-index one-hot: column permutation
# taking zigzag position k to natural position ZIGZAG[k] (static, free).
_ZZ_INV = np.asarray(T.NATURAL_TO_ZIGZAG)  # [natural j] -> zigzag k


def build_decode_lut(huff) -> np.ndarray:
    """[4, 65536] int32 combined decode LUT from parsed DHT tables.

    huff: ParsedJpeg.huff ({0: dc tables, 1: ac tables} keyed by table id);
    rows: 0 = Y-DC (id 0), 1 = Y-AC, 2 = C-DC (id 1), 3 = C-AC.
    Entry = (HUFFVAL << 8) | code_bits for the 16-bit window, -1 invalid
    (same contract as the host LUT, runtime/native.py:_huff_lut).
    """
    from ..runtime.native import _huff_lut

    rows = [huff[0][0], huff[1][0], huff[0][1], huff[1][1]]
    return np.stack([_huff_lut(t) for t in rows])


@functools.lru_cache(maxsize=8)
def _device_lut(key, lut_bytes: bytes) -> jax.Array:
    """Device-resident LUT, cached by content hash: standard streams all
    share the Annex K tables, so the 1 MiB upload happens once per
    process, not once per batch (the tunnel moves ~30 MiB/s)."""
    return jnp.asarray(
        np.frombuffer(lut_bytes, np.int32).reshape(4, 65536))


def device_lut(lut: np.ndarray) -> jax.Array:
    b = np.ascontiguousarray(lut, np.int32).tobytes()
    import hashlib

    return _device_lut(hashlib.sha1(b).hexdigest(), b)


@functools.partial(jax.jit, static_argnames=("max_blocks",))
def decode_segments(words, nblk, lut, *, max_blocks: int):
    """Lockstep-decode S restart segments -> dense coefficient blocks.

    words: [S, Lw] uint32, big-endian-packed DESTUFFED segment bytes,
      zero-padded (>= 4 pad bytes past the last entropy byte per row).
    nblk:  [S] int32, blocks to decode per segment (tail segments and
      batch padding lanes decode fewer; their remaining blocks are zeros).
    lut:   [4, 65536] int32 (build_decode_lut / device_lut).
    max_blocks: R * blocks_per_mcu, the scan length.

    Returns [S, max_blocks, 64] int16 natural-order blocks, DC absolute
    within each segment (restart semantics: predictors reset per segment).
    """
    S, Lw = words.shape
    lutf = lut.reshape(-1)
    iota64 = jnp.arange(64, dtype=jnp.int32)
    zero_s = jnp.zeros((S,), jnp.int32)
    zero_u = jnp.zeros((S,), jnp.uint32)

    # Bit cursor = a per-lane 64-bit window register (hi, lo uint32 pair):
    # `navail` valid bits at the TOP, zeros below, next stream bit = MSB of
    # hi.  One symbol consumes <= 27 bits (16-bit code + 11 extra), so ONE
    # 32-bit refill per iteration keeps navail >= 32 -- a single word
    # gather per symbol instead of the two adjacent-word gathers of the
    # bitpos formulation (gathers dominate the scan: ~9 ns/lane each).

    def refill(hi, lo, navail, widx, active):
        need = active & (navail < 32)
        w = jnp.take_along_axis(
            words, jnp.minimum(widx, Lw - 1)[:, None], axis=1)[:, 0]
        na = navail.astype(jnp.uint32)
        hi2 = hi | (w >> na)
        lo2 = lo | jnp.where(navail > 0, w << ((32 - na) & 31), 0)
        return (jnp.where(need, hi2, hi), jnp.where(need, lo2, lo),
                jnp.where(need, navail + 32, navail),
                jnp.where(need, widx + 1, widx))

    def consume(hi, lo, navail, k, active):
        ku = jnp.maximum(k, 1).astype(jnp.uint32)   # k==0 -> masked out
        hi2 = (hi << ku) | (lo >> ((32 - ku) & 31))
        lo2 = lo << ku
        take = active & (k > 0)
        return (jnp.where(take, hi2, hi), jnp.where(take, lo2, lo),
                jnp.where(take, navail - k, navail))

    def block_body(carry):
        hi, lo, navail, widx, kk, blk, pred, done, chroma = carry
        active = ~done
        hi, lo, navail, widx = refill(hi, lo, navail, widx, active)
        win = hi
        is_dc = kk == 0
        sel = chroma.astype(jnp.int32) * 2 + (~is_dc).astype(jnp.int32)
        e = lutf[sel * 65536 + (win >> 16).astype(jnp.int32)]
        # invalid windows (-1) only occur on corrupt streams; treat as an
        # 8-bit skip so the loop still terminates (host paths validate)
        bad = e < 0
        ln = jnp.where(bad, 8, e & 0xFF)
        val = jnp.where(bad, 0, e >> 8)
        run = val >> 4
        s_ = val & 15
        ncat = jnp.where(is_dc, val, s_)          # extra (category) bits
        # extra bits follow the code inside the same 32-bit window
        # (ln <= 16, ncat <= 15 -> ln + ncat <= 31)
        extra = ((win << ln.astype(jnp.uint32))
                 >> ((32 - ncat) & 31).astype(jnp.uint32)).astype(jnp.int32)
        extra = jnp.where(ncat == 0, 0, extra)
        # T.81 F.2.2.1 sign extension (jpezy_decoder.hpp:590-592 semantics)
        top = (extra >> jnp.maximum(ncat - 1, 0)) & 1
        v = jnp.where((ncat > 0) & (top == 0),
                      extra - ((1 << ncat) - 1), extra)
        is_eob = (~is_dc) & (s_ == 0) & (run != 15)
        is_zrl = (~is_dc) & (s_ == 0) & (run == 15)
        dc_new = pred + v
        kk_ac = kk + run                           # this AC's zigzag index
        write = active & ~is_eob & ~is_zrl & jnp.where(is_dc, True, kk_ac <= 63)
        wval = jnp.where(is_dc, dc_new, v)
        wpos_zz = jnp.where(is_dc, 0, kk_ac)       # zigzag index written
        onehot_zz = (iota64[None, :] == wpos_zz[:, None]) & write[:, None]
        # zigzag->natural: static column permutation, no gather
        onehot_nat = onehot_zz[:, _ZZ_INV]
        blk = blk + jnp.where(onehot_nat, wval[:, None], 0)
        pred = jnp.where(active & is_dc, dc_new, pred)
        kk = jnp.where(
            active,
            jnp.where(is_dc, 1,
                      jnp.where(is_zrl, kk + 16, kk_ac + 1)),
            kk)
        hi, lo, navail = consume(hi, lo, navail, ln + ncat, active)
        # kk > 63 ends the block; the word-index bound makes corrupt input
        # (invalid windows never advancing kk) terminate instead of hanging
        done = done | (active & (is_eob | (kk > 63))) | (widx > Lw)
        return hi, lo, navail, widx, kk, blk, pred, done, chroma

    def outer(carry, b):
        hi, lo, navail, widx, preds = carry        # preds [S, 3]
        slot = b % 6                               # Y0..Y3, Cb, Cr
        chroma_scalar = slot >= 4
        comp = jnp.where(slot < 4, 0, slot - 3)
        pred0 = jnp.take_along_axis(
            preds, jnp.full((S, 1), comp, jnp.int32), axis=1)[:, 0]
        chroma = jnp.full((S,), chroma_scalar)
        done0 = b >= nblk
        init = (hi, lo, navail, widx, zero_s,
                jnp.zeros((S, 64), jnp.int32), pred0, done0, chroma)
        hi, lo, navail, widx, _, blk, pred, _, _ = jax.lax.while_loop(
            lambda c: jnp.any(~c[7]), block_body, init)
        col = jnp.arange(3, dtype=jnp.int32)[None, :]
        preds = jnp.where(col == comp, pred[:, None], preds)
        return (hi, lo, navail, widx, preds), blk.astype(jnp.int16)

    init = (zero_u, zero_u, zero_s, zero_s, jnp.zeros((S, 3), jnp.int32))
    _, blocks = jax.lax.scan(
        outer, init, jnp.arange(max_blocks, dtype=jnp.int32))
    return blocks.transpose(1, 0, 2)               # [S, max_blocks, 64]
