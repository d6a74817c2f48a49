"""Adversarial entropy-coding unit vectors.

Hand-constructed coefficient blocks hitting every branch of the emission
logic: ZRL chains (run 16/32/48), run-15 + symbol, no-EOB (nonzero at
zigzag 63), negative extra bits (one's complement), DC category edges, and
maximal-magnitude coefficients.  Each vector round-trips through
oracle pack -> oracle decode AND through the device emission path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jpezy_tpu.core import tables as T
from jpezy_tpu.codec import oracle
from jpezy_tpu.bitstream import writer
from jpezy_tpu.ops import entropy as E


def make_block(zigzag_vals: dict[int, int]) -> np.ndarray:
    """Block from {zigzag_position: value} (natural-order storage)."""
    blk = np.zeros(64, dtype=np.int32)
    for zz_pos, v in zigzag_vals.items():
        blk[T.ZIGZAG[zz_pos]] = v
    return blk


VECTORS = [
    ("dc_only_positive", {0: 5}),
    ("dc_only_negative", {0: -5}),
    ("dc_zero", {}),
    ("single_ac_at_63", {63: 3}),                  # no EOB emitted
    ("single_ac_at_62", {62: 3}),                  # EOB after
    ("run_15_symbol", {0: 1, 16: 2}),              # run 15 -> idx 15*10+s+1
    ("zrl_once", {0: 1, 17: 2}),                   # run 16 -> ZRL + (0, s)
    ("zrl_run_31", {0: 1, 32: -2}),                # ZRL + run 15
    ("zrl_twice", {0: 1, 33: 4}),                  # run 32 -> 2x ZRL
    ("zrl_thrice", {0: 1, 50: -7}),                # run 49 -> 3x ZRL + run 1
    ("max_run_62", {63: 1}),                       # handled as 3x ZRL + 14
    ("neg_ones_complement", {1: -1, 2: -255, 3: -1023}),
    ("alternating_sign", {k: (-1) ** k * k for k in range(1, 20)}),
    ("dense_block", {k: ((k * 7) % 19) - 9 for k in range(64)}),
    ("large_magnitudes", {0: 1020, 1: -1023, 63: 1023}),
]


@pytest.mark.parametrize("name,vals", VECTORS, ids=[v[0] for v in VECTORS])
class TestVectors:
    def _roundtrip_oracle(self, blk, chroma):
        codes, lens = oracle.encode_block_emissions(
            blk[None], np.zeros(1, np.int32), chroma
        )
        packed, total = writer.pack_bits(codes.reshape(-1), lens.reshape(-1))
        # decode the single block back
        lut_dc = oracle._huff_lut(_table(0, chroma))
        lut_ac = oracle._huff_lut(_table(1, chroma))
        br = oracle._BitReader(packed)
        out = [[], [], []]
        pred = np.zeros(3, dtype=np.int64)
        oracle.decode_segment_blocks(
            br, 1, [(0, 1)], [lut_dc], [lut_ac], pred, out
        )
        return out[0][0]

    def test_oracle_roundtrip(self, name, vals):
        for chroma in (False, True):
            blk = make_block(vals)
            got = self._roundtrip_oracle(blk, chroma)
            assert np.array_equal(got, blk), f"{name} chroma={chroma}"

    def test_device_emissions_match_oracle_bytes(self, name, vals):
        blk = make_block(vals)
        for chroma in (False, True):
            codes, lens = oracle.encode_block_emissions(
                blk[None], np.zeros(1, np.int32), chroma
            )
            ref, t_ref = writer.pack_bits(codes.reshape(-1), lens.reshape(-1))
            hi, lo, n = E.block_emissions(
                jnp.asarray(blk[None]), jnp.zeros(1, jnp.int32), chroma
            )
            words, bits = E.pack_block_words(hi, lo, n)
            from jpezy_tpu.bitstream.splice import splice_blocks

            got, t_got = splice_blocks(np.asarray(words), np.asarray(bits))
            assert t_got == t_ref, name
            assert got == ref, name


def _table(tc, chroma):
    from jpezy_tpu.bitstream.reader import HuffTable

    if tc == 0:
        bits = T.DC_CHROMA_BITS if chroma else T.DC_LUMA_BITS
        vals = T.DC_CHROMA_VALS if chroma else T.DC_LUMA_VALS
    else:
        bits = T.AC_CHROMA_BITS if chroma else T.AC_LUMA_BITS
        vals = T.AC_CHROMA_VALS if chroma else T.AC_LUMA_VALS
    sizes, codes = T.build_canonical_codes(bits)
    return HuffTable(sizes, codes, np.frombuffer(vals, np.uint8).astype(np.int32))


class TestDcChain:
    def test_dc_prediction_sequence(self):
        """Multi-block DC chain with sign changes."""
        dcs = [0, 5, 5, -3, 100, -100, 1020, 0]
        blocks = np.zeros((len(dcs), 64), np.int32)
        blocks[:, 0] = dcs
        codes, lens = oracle.encode_block_emissions(
            blocks, oracle.dc_predictors(blocks[:, 0]), False
        )
        packed, _ = writer.pack_bits(codes.reshape(-1), lens.reshape(-1))
        lut_dc = oracle._huff_lut(_table(0, False))
        lut_ac = oracle._huff_lut(_table(1, False))
        br = oracle._BitReader(packed)
        out = [[], [], []]
        pred = np.zeros(3, dtype=np.int64)
        oracle.decode_segment_blocks(
            br, len(dcs), [(0, 1)], [lut_dc], [lut_ac], pred, out
        )
        got = [int(b[0]) for b in out[0]]
        assert got == dcs
