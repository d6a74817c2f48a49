"""Two-pass optimized Huffman tables (extension; the reference only ever
uses the fixed Annex K.3-K.6 tables, src/encoder/huffman_table.hpp).

The optimize path must produce strictly valid streams with custom DHT
segments, decode to the SAME pixels as the fixed-table stream (entropy
coding is lossless), and (on real content) be smaller.
"""
import io

import numpy as np
import pytest
from PIL import Image

from jpezy_tpu.codec import jax_codec
from jpezy_tpu.core import tables as T
from jpezy_tpu.bitstream.reader import parse


def split(rgb):
    return rgb[..., 0], rgb[..., 1], rgb[..., 2]


class TestOptimalTableBuilder:
    def test_lengths_legal(self):
        rng = np.random.default_rng(0)
        freq = rng.integers(0, 1000, 256).astype(np.int64)
        bits, vals = T.optimal_huffman_table(freq)
        assert len(bits) == 16
        assert sum(bits) == len(vals)
        # every symbol with nonzero frequency got a code
        assert set(vals) == set(np.nonzero(freq)[0].tolist())
        # Kraft inequality strictly < 1 (the all-ones code stays reserved)
        kraft = sum(n / (1 << (i + 1)) for i, n in enumerate(bits))
        assert kraft < 1.0
        # canonical build must not overflow any code length
        sizes, codes = T.build_canonical_codes(bits)
        assert ((codes >> sizes) == 0).all()

    def test_single_symbol(self):
        freq = np.zeros(256, dtype=np.int64)
        freq[5] = 100
        bits, vals = T.optimal_huffman_table(freq)
        assert vals == bytes([5])
        assert sum(bits) == 1

    def test_skewed_gets_short_codes(self):
        freq = np.zeros(256, dtype=np.int64)
        freq[1] = 10000
        freq[2] = 100
        freq[3] = 1
        bits, vals = T.optimal_huffman_table(freq)
        sizes, _ = T.build_canonical_codes(bits)
        len_of = {v: int(s) for v, s in zip(vals, sizes)}
        assert len_of[1] <= len_of[2] <= len_of[3]


class TestOptimizedEncode:
    def test_pixels_identical_to_fixed_tables(self, small_rgb):
        """Entropy coding is lossless: same quantized coefficients, so the
        optimized stream must decode to the exact same pixels."""
        fixed = jax_codec.encode(*split(small_rgb))
        opt = jax_codec.encode(*split(small_rgb), optimize=True)
        a = np.asarray(Image.open(io.BytesIO(fixed)).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
        assert np.array_equal(a, b)
        r1, g1, b1, _ = jax_codec.decode(fixed)
        r2, g2, b2, _ = jax_codec.decode(opt)
        assert np.array_equal(r1, r2)
        assert np.array_equal(g1, g2)
        assert np.array_equal(b1, b2)

    def test_smaller_on_content(self, lena_rgb):
        fixed = jax_codec.encode(*split(lena_rgb))
        opt = jax_codec.encode(*split(lena_rgb), optimize=True)
        assert len(opt) < len(fixed)

    def test_custom_dht_in_stream(self, small_rgb):
        opt = jax_codec.encode(*split(small_rgb), optimize=True)
        assert T.AC_LUMA_BITS not in opt  # Annex K table absent
        pj = parse(opt)  # our reader rebuilds the canonical codes
        assert pj.huff[0][0] is not None and pj.huff[1][1] is not None

    def test_with_restart_interval(self, small_rgb):
        opt = jax_codec.encode(*split(small_rgb), optimize=True,
                               restart_interval=2)
        ref = jax_codec.encode(*split(small_rgb), restart_interval=2)
        a = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB"))
        assert np.array_equal(a, b)

    def test_with_quality(self, small_rgb):
        opt = jax_codec.encode(*split(small_rgb), optimize=True, quality=80)
        ref = jax_codec.encode(*split(small_rgb), quality=80)
        a = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB"))
        assert np.array_equal(a, b)

    def test_gray(self, small_rgb):
        opt = jax_codec.encode(*split(small_rgb), gray=True, optimize=True)
        ref = jax_codec.encode(*split(small_rgb), gray=True)
        a = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB"))
        assert np.array_equal(a, b)
        assert len(opt) < len(ref)  # all-zero chroma compresses to ~nothing


class TestSymbolHistograms:
    def test_histogram_matches_emissions(self, small_rgb):
        """Total histogram mass must equal the number of emitted symbols:
        per block 1 DC + (#nonzero AC + #ZRL + maybe EOB)."""
        import jax.numpy as jnp
        from jpezy_tpu.core.geometry import EncodeGeometry
        from jpezy_tpu.ops import entropy as E

        h, w = small_rgb.shape[:2]
        geo = EncodeGeometry(width=w, height=h)
        yq, cbq, crq = jax_codec.quantize_planes(
            *(jnp.asarray(small_rgb[..., i]) for i in range(3)),
            ph=geo.padded_height, pw=geo.padded_width, gray=False)
        hists = np.asarray(jax_codec._symbol_histograms(yq, cbq, crq))
        yq = np.asarray(yq)
        # DC: one category symbol per block
        assert hists[0].sum() == yq.shape[0]
        assert hists[2].sum() == np.asarray(cbq).shape[0] * 2
        # AC luma: nonzero count + ZRL count + EOB count
        zz = yq[:, np.asarray(T.ZIGZAG)][:, 1:]
        nz = (zz != 0)
        eobs = int((zz[:, -1] == 0).sum())
        assert hists[1][0x00] >= eobs  # EOB (plus any (0,*) size-coded runs)
