"""Decode JPEGs produced by a foreign encoder (PIL/libjpeg).

Exercises decoder paths our own encoder never emits: 4:4:4 and 4:2:2
sampling, optimized (non-Annex-K) Huffman tables, quality-scaled quant
tables, single-component grayscale streams, and restart intervals from a
foreign encoder.  Reference analog: jpezy's decoder accepts arbitrary
sampling factors and any DHT/DQT (jpezy_decoder.hpp:190-305).
"""
import io

import numpy as np
import pytest
from PIL import Image

from jpezy_tpu.codec import jax_codec, oracle


def pil_jpeg(rgb, **kw):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", **kw)
    return buf.getvalue()


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("subsampling,quality", [
    (0, 75),   # 4:4:4
    (1, 75),   # 4:2:2
    (2, 75),   # 4:2:0
    (0, 95),
    (2, 30),
])
class TestPilStreams:
    def test_decode_vs_pil_decode(self, small_rgb, subsampling, quality):
        data = pil_jpeg(small_rgb, quality=quality, subsampling=subsampling)
        r, g, b, props = jax_codec.decode(data)
        assert (props.width, props.height) == (48, 64)
        ours = np.stack([r, g, b], -1)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        # different (valid) IDCT/upsampling choices; must agree closely
        assert psnr(ours, pil) > 28.0

    def test_oracle_decode_agrees(self, small_rgb, subsampling, quality):
        # rgb transport (reference clamp order): only f32-vs-f64 ties left
        data = pil_jpeg(small_rgb, quality=quality, subsampling=subsampling)
        r1, g1, b1, _ = jax_codec.decode(data, transport="rgb")
        r2, g2, b2, _ = oracle.decode(data)
        assert np.abs(r1.astype(int) - r2.astype(int)).max() <= 1

    def test_default_transport_within_clamp_envelope(self, small_rgb,
                                                     subsampling, quality):
        """Default fast transport on FOREIGN streams: the clamp-before-
        color envelope (pinned adversarially in test_jax_codec) plus
        f32 ties; must stay small and PSNR-neutral on natural content."""
        data = pil_jpeg(small_rgb, quality=quality, subsampling=subsampling)
        r1, g1, b1, _ = jax_codec.decode(data)
        r2, g2, b2, _ = oracle.decode(data)
        d = np.abs(np.stack([r1, g1, b1]).astype(int)
                   - np.stack([r2, g2, b2]).astype(int))
        assert d.max() <= 16
        assert (d > 1).mean() < 0.01


class TestOptimizedTables:
    def test_optimized_huffman(self, small_rgb):
        """optimize=True makes libjpeg emit custom DHT tables."""
        data = pil_jpeg(small_rgb, quality=80, optimize=True)
        r, g, b, _ = jax_codec.decode(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert psnr(np.stack([r, g, b], -1), pil) > 28.0

    def test_restart_markers_from_pil(self, small_rgb):
        data = pil_jpeg(small_rgb, quality=75, restart_marker_blocks=2)
        from jpezy_tpu.bitstream.reader import parse

        pj = parse(data)
        assert pj.restart_interval == 2
        r, g, b, _ = jax_codec.decode(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert psnr(np.stack([r, g, b], -1), pil) > 28.0


class TestGrayscaleStream:
    def test_single_component_jpeg(self, small_rgb):
        """1-component stream decodes gray in color mode (chroma = 0x80
        fill, reference jpezy_decoder.hpp:103-105)."""
        gray_img = np.asarray(Image.fromarray(small_rgb).convert("L"))
        buf = io.BytesIO()
        Image.fromarray(gray_img).save(buf, "JPEG", quality=85)
        data = buf.getvalue()
        r, g, b, props = jax_codec.decode(data)
        assert props.dimension == 1
        assert np.array_equal(r, g) and np.array_equal(g, b)
        pil = np.asarray(Image.open(io.BytesIO(data)))
        assert psnr(r, pil) > 30.0

    def test_gray_flag_on_color_stream(self, small_rgb):
        data = pil_jpeg(small_rgb, quality=85)
        r, g, b, _ = jax_codec.decode(data, gray=True)
        assert np.array_equal(r, g) and np.array_equal(g, b)
