"""Literal quad-loop reimplementation of the reference DCT/IDCT vs the
oracle's float64 einsum.

The reference sums 64 double-precision terms in a fixed scalar order
(jpezy_encoder.hpp:146-166, jpezy_decoder.hpp:652-670); the oracle uses
einsum.  float64 summation-order differences are ~1e-10 absolute while the
int() truncation decisions happen at integer boundaries, so the two can
only disagree on a tie within 1e-10 of an integer.  This test asserts zero
disagreement over a large randomized corpus (plus structured blocks that
produce exact-integer sums, the most tie-prone inputs).
"""
import numpy as np
import pytest

from jpezy_tpu.codec import oracle


def quadloop_dct(block: np.ndarray) -> np.ndarray:
    """Literal transcription of jpezy_encoder.hpp:146-166 (loop order kept)."""
    cos = oracle._COS
    dis_sqrt = 1.0 / np.sqrt(2.0)
    out = np.zeros(64, dtype=np.int32)
    pic = block.astype(np.float64)
    for i in range(8):
        cv = dis_sqrt if i == 0 else 1.0
        for j in range(8):
            cu = dis_sqrt if j == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += pic[y * 8 + x] * cos[j, x] * cos[i, y]
            out[i * 8 + j] = int(s * cu * cv / 4)
    return out


def quadloop_idct(dct: np.ndarray, sl: int = 128) -> np.ndarray:
    """Literal transcription of jpezy_decoder.hpp:652-670."""
    cos = oracle._COS
    disqrt2 = 1.0 / np.sqrt(2.0)
    out = np.zeros(64, dtype=np.int32)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = disqrt2 if v == 0 else 1.0
                for u in range(8):
                    cu = disqrt2 if u == 0 else 1.0
                    s += cu * cv * dct[v * 8 + u] * cos[u, x] * cos[v, y]
            out[y * 8 + x] = int(s / 4 + sl)
    return out


def _structured_blocks():
    """Tie-prone inputs: flat blocks (exact-integer DC sums), ramps,
    single-coefficient blocks."""
    blocks = []
    for v in (-128, -1, 0, 1, 100, 127):
        blocks.append(np.full(64, v, dtype=np.int32))
    ramp = np.arange(64, dtype=np.int32) - 32
    blocks.append(ramp)
    for pos in (0, 1, 8, 63):
        b = np.zeros(64, dtype=np.int32)
        b[pos] = 1000
        blocks.append(b)
    return blocks


class TestForwardDct:
    def test_random_corpus(self):
        rng = np.random.default_rng(0)
        blocks = rng.integers(-128, 128, size=(300, 64)).astype(np.int32)
        ours = oracle.forward_dct(blocks)
        for i in range(len(blocks)):
            ref = quadloop_dct(blocks[i])
            assert np.array_equal(ours[i], ref), f"block {i}"

    def test_structured(self):
        for blk in _structured_blocks():
            assert np.array_equal(
                oracle.forward_dct(blk[None])[0], quadloop_dct(blk)
            )


class TestInverseDct:
    def test_random_quantized_corpus(self):
        rng = np.random.default_rng(1)
        # realistic dequantized coefficients: sparse, scaled by quant steps
        coef = rng.integers(-30, 30, size=(300, 64)).astype(np.int32)
        coef[:, 1:] *= rng.random((300, 63)) < 0.2
        from jpezy_tpu.core.tables import Y_QUANT

        deq = coef * Y_QUANT[None, :]
        ours = oracle.inverse_dct(deq)
        for i in range(len(deq)):
            ref = quadloop_idct(deq[i])
            assert np.array_equal(ours[i], ref), f"block {i}"

    def test_structured(self):
        for blk in _structured_blocks():
            assert np.array_equal(
                oracle.inverse_dct(blk[None] * 16)[0], quadloop_idct(blk * 16)
            )

    def test_level_shift_2048(self):
        blk = np.zeros(64, dtype=np.int32)
        blk[0] = 256
        assert np.array_equal(
            oracle.inverse_dct(blk[None], 2048)[0], quadloop_idct(blk, 2048)
        )
