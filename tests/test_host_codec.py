"""Host C++ codec path (codec/host_codec.py): the no-accelerator CLI
backend.  Contract: streams byte-identical to the numpy oracle (== the jax
precision='exact' path), decodes bit-identical to oracle.decode.

Referent: the reference runs its whole codec on the host in C++
(jpezy_encoder.hpp, jpezy_decoder.hpp); this is our host-axis equivalent
with the same numerics.
"""
import io

import numpy as np
import pytest

from imagegen import make_test_image
from jpezy_tpu.codec import host_codec, oracle

pytest.importorskip("PIL.Image")


class TestHostEncode:
    @pytest.mark.parametrize("kw", [
        {},
        {"gray": True},
        {"restart_interval": 4},
    ])
    def test_byte_identical_to_oracle(self, kw):
        img = make_test_image(96, 80, seed=11)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        assert host_codec.encode(r, g, b, **kw) == oracle.encode(r, g, b, **kw)

    def test_odd_dims_edge_replication(self, odd_rgb):
        r, g, b = odd_rgb[..., 0], odd_rgb[..., 1], odd_rgb[..., 2]
        assert host_codec.encode(r, g, b) == oracle.encode(r, g, b)

    def test_lena_byte_identical(self, lena_rgb):
        r, g, b = lena_rgb[..., 0], lena_rgb[..., 1], lena_rgb[..., 2]
        assert host_codec.encode(r, g, b) == oracle.encode(r, g, b)

    @pytest.mark.parametrize("kw", [
        {"quality": 75},
        {"optimize": True},
        {"optimize": True, "restart_interval": 4},
        {"quality": 30, "optimize": True},
    ])
    def test_extensions_match_jax_exact(self, kw):
        """quality/optimize have no oracle implementation; the jax
        precision='exact' path is the second independent implementation."""
        from jpezy_tpu.codec import jax_codec

        img = make_test_image(96, 96, seed=13)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        d_host = host_codec.encode(r, g, b, **kw)
        d_jax = jax_codec.encode(r, g, b, precision="exact", **kw)
        assert d_host == d_jax

    def test_pil_decodes_it(self):
        from PIL import Image

        img = make_test_image(64, 64, seed=14)
        data = host_codec.encode(img[..., 0], img[..., 1], img[..., 2])
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        mse = np.mean((pil.astype(float) - img.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / mse) > 24


class TestHostDecode:
    @pytest.mark.parametrize("ri", [0, 4])
    def test_bit_identical_to_oracle(self, ri):
        img = make_test_image(96, 80, seed=21)
        data = oracle.encode(img[..., 0], img[..., 1], img[..., 2],
                             restart_interval=ri)
        got = host_codec.decode(data)
        want = oracle.decode(data)
        for a, b in zip(got[:3], want[:3]):
            np.testing.assert_array_equal(a, b)

    def test_foreign_pil_stream(self):
        """A libjpeg 4:2:0 stream (custom encoder, optimized tables)."""
        from PIL import Image

        img = make_test_image(80, 96, seed=22)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=80, optimize=True,
                                  subsampling=2)
        data = buf.getvalue()
        got = host_codec.decode(data)
        want = oracle.decode(data)
        for a, b in zip(got[:3], want[:3]):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("sub,name", [(0, "444"), (1, "422")])
    def test_foreign_sampling(self, sub, name):
        """4:4:4 / 4:2:2 libjpeg streams through the host decode tail
        (arbitrary sampling, like the reference decoder)."""
        import io

        from PIL import Image

        img = make_test_image(64, 64, seed=31)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85, subsampling=sub)
        got = host_codec.decode(buf.getvalue())
        want = oracle.decode(buf.getvalue())
        for a, b in zip(got[:3], want[:3]):
            np.testing.assert_array_equal(a, b)

    def test_one_component_stream(self):
        import io

        from PIL import Image

        img = make_test_image(64, 64, seed=32)
        buf = io.BytesIO()
        Image.fromarray(img[..., 0], mode="L").save(buf, "JPEG", quality=85)
        r, g, b, _ = host_codec.decode(buf.getvalue())
        ro, go, bo, _ = oracle.decode(buf.getvalue())
        np.testing.assert_array_equal(r, ro)
        assert np.array_equal(r, g) and np.array_equal(g, b)

    def test_progressive_rejected(self):
        import io

        from PIL import Image
        from jpezy_tpu.bitstream.reader import JpegFormatError

        img = make_test_image(64, 64, seed=33)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", progressive=True, quality=80)
        with pytest.raises((JpegFormatError, ValueError)):
            host_codec.decode(buf.getvalue())

    def test_gray_flag(self):
        img = make_test_image(64, 64, seed=23)
        data = oracle.encode(img[..., 0], img[..., 1], img[..., 2])
        r, g, b, _ = host_codec.decode(data, gray=True)
        ro, go, bo, _ = oracle.decode(data, gray=True)
        np.testing.assert_array_equal(r, ro)
        np.testing.assert_array_equal(g, go)

    def test_corrupt_stream_raises(self):
        img = make_test_image(64, 64, seed=24)
        data = bytearray(
            oracle.encode(img[..., 0], img[..., 1], img[..., 2]))
        data = bytes(data[: len(data) // 2])  # truncate entropy data
        with pytest.raises((ValueError, RuntimeError)):
            host_codec.decode(data)


class TestPpmMagicScan:
    """_after_p3_magic must not line-split megabyte bodies (the old
    _strip_comments path cost ~1 s/MP on the CLI hot path)."""

    def test_comment_before_magic(self, tmp_path):
        from jpezy_tpu.runtime import ppm

        w, h, mx, rgb = ppm.parse(b"# hi\n# there\nP3\n2 1\n255\n1 2 3 4 5 6\n")
        assert (w, h, mx) == (2, 1, 255)
        assert rgb.tolist() == [[[1, 2, 3], [4, 5, 6]]]

    def test_comment_in_body(self):
        from jpezy_tpu.runtime import ppm

        w, h, mx, rgb = ppm.parse(b"P3\n2 1\n255\n1 2 3 # x\n4 5 6\n")
        assert rgb.tolist() == [[[1, 2, 3], [4, 5, 6]]]

    def test_not_p3(self):
        from jpezy_tpu.runtime import ppm

        with pytest.raises(ppm.PpmFormatError):
            ppm.parse(b"P9\n1 1\n255\n1 2 3\n")


class TestHostNoiseAndFacade:
    def test_noise_roundtrip_byte_identical(self):
        """Dense noise maxes out coefficient magnitudes, code lengths and
        the bit writer's stuffing paths."""
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, (96, 96, 3), np.uint8)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        assert host_codec.encode(r, g, b) == oracle.encode(r, g, b)
        data = host_codec.encode(r, g, b, restart_interval=2)
        assert data == oracle.encode(r, g, b, restart_interval=2)
        got = host_codec.decode(data)
        want = oracle.decode(data)
        for a, bb in zip(got[:3], want[:3]):
            np.testing.assert_array_equal(a, bb)

    def test_facade(self):
        import jpezy_tpu

        img = make_test_image(48, 48, seed=3)
        d = jpezy_tpu.encode_host(img[..., 0], img[..., 1], img[..., 2])
        assert d == oracle.encode(img[..., 0], img[..., 1], img[..., 2])
        r, g, b, _ = jpezy_tpu.decode_host(d)
        ro, go, bo, _ = oracle.decode(d)
        np.testing.assert_array_equal(r, ro)
