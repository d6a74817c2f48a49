"""C++ host runtime vs the numpy reference implementations."""
import numpy as np
import pytest

from jpezy_tpu.codec import oracle
from jpezy_tpu.bitstream.reader import parse
from jpezy_tpu.bitstream import writer

native = pytest.importorskip("jpezy_tpu.runtime.native")

try:
    native.get_lib()
    HAVE_LIB = True
except Exception:
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(not HAVE_LIB, reason="g++ build unavailable")


def split(rgb):
    return rgb[..., 0], rgb[..., 1], rgb[..., 2]


class TestScanInts:
    def test_basic(self):
        out = native.scan_ints(b"P3\n# comment 1 2\n3 4\n 567", 10)
        # 'P3' is non-numeric -> skipped; comment line dropped entirely
        assert out.tolist() == [3, 3, 4, 567] or out.tolist() == [3, 4, 567]

    def test_matches_ppm_parse(self):
        body = b"1 2 3\n# c\n 44 55 66\n255 0 128\n"
        out = native.scan_ints(body, 100)
        assert out.tolist() == [1, 2, 3, 44, 55, 66, 255, 0, 128]


class TestSerializeP3:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
        got = native.serialize_p3_pixels(rgb)
        want = b"".join(
            f"{r} {g} {b}\n".encode() for r, g, b in rgb.reshape(-1, 3).tolist()
        )
        assert got == want


class TestByteStuff:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 1000, dtype=np.uint8)
        data[::37] = 0xFF
        assert native.byte_stuff(data.tobytes()) == writer.byte_stuff(data.tobytes())

    def test_empty(self):
        assert native.byte_stuff(b"") == b""


class TestSpliceBits:
    def test_matches_numpy_splice(self, small_rgb):
        from jpezy_tpu.bitstream.splice import splice_blocks
        import jax.numpy as jnp
        from jpezy_tpu.ops import entropy as E
        from jpezy_tpu.codec.jax_codec import encode_to_blocks
        from jpezy_tpu.core.geometry import EncodeGeometry

        r, g, b = split(small_rgb)
        geo = EncodeGeometry(small_rgb.shape[1], small_rgb.shape[0])
        words, bits = encode_to_blocks(
            jnp.asarray(r), jnp.asarray(g), jnp.asarray(b),
            ph=geo.padded_height, pw=geo.padded_width, gray=False,
        )
        wn, bn = np.asarray(words), np.asarray(bits)
        ref, t_ref = splice_blocks(wn, bn)
        got, t_got = native.splice_bits(wn, bn)
        assert t_got == t_ref
        assert got == ref


class TestEntropyDecode:
    def test_matches_oracle_coefficients(self, small_rgb):
        data = oracle.encode(*split(small_rgb))
        pj = parse(data)
        # numpy-oracle decode of the same stream
        from jpezy_tpu.codec.jax_codec import decode_entropy_host
        from jpezy_tpu.core.geometry import ComponentGeometry

        geo = ComponentGeometry(2, 2, 2, 2, pj.props.width, pj.props.height)
        n_mcus = geo.mcus_x * geo.mcus_y
        got = native.entropy_decode(pj, n_mcus)

        # independent python decode (the oracle's LUT path)
        from jpezy_tpu.codec import oracle as o

        dc_lut = [o._huff_lut(pj.huff[0][sc.Td]) for sc in pj.scan_components]
        ac_lut = [o._huff_lut(pj.huff[1][sc.Ta]) for sc in pj.scan_components]
        from jpezy_tpu.bitstream.reader import split_entropy_segments

        segments, _ = split_entropy_segments(pj.data, pj.entropy_start)
        out = [[] for _ in range(3)]
        pred = np.zeros(3, dtype=np.int64)
        br = o._BitReader(segments[0])
        o.decode_segment_blocks(
            br, n_mcus, [(0, 4), (1, 1), (2, 1)], dc_lut, ac_lut, pred, out
        )
        for c in range(3):
            ref = np.stack(out[c])
            assert np.array_equal(got[c], ref), f"component {c} differs"

    def test_full_decode_path_uses_native(self, small_rgb):
        from jpezy_tpu.codec import jax_codec

        data = oracle.encode(*split(small_rgb))
        r1, g1, b1, _ = jax_codec.decode(data)          # native fast path
        r2, g2, b2, _ = oracle.decode(data)             # pure python
        assert np.abs(r1.astype(int) - r2.astype(int)).max() <= 1


class TestRgbToYcc420:
    def test_matches_numpy_float64(self):
        """Native encode-side color transport == the numpy float64 path
        (the reference's exact double math + truncation), bit for bit."""
        from jpezy_tpu.codec import jax_codec
        from jpezy_tpu.runtime import native

        rng = np.random.default_rng(7)
        rgbs = rng.integers(0, 256, size=(3, 32, 48, 3), dtype=np.uint8)
        yn, cbn, crn = native.rgb_to_ycc420(rgbs)
        # numpy reference (the fallback body of host_rgb_to_ycc420)
        rf = rgbs[..., 0].astype(np.float64)
        gf = rgbs[..., 1].astype(np.float64)
        bf = rgbs[..., 2].astype(np.float64)
        y = ((0.2990 * rf) + (0.5870 * gf) + (0.1140 * bf) - 128.0).astype(
            np.int32).astype(np.int8)
        sub = rgbs[:, 0::2, 0::2, :].astype(np.float64)
        rs, gs, bs = sub[..., 0], sub[..., 1], sub[..., 2]
        cb = (-(0.1687 * rs) - (0.3313 * gs) + (0.5000 * bs)).astype(
            np.int32).astype(np.int8)
        cr = ((0.5000 * rs) - (0.4187 * gs) - (0.0813 * bs)).astype(
            np.int32).astype(np.int8)
        assert np.array_equal(yn, y)
        assert np.array_equal(cbn, cb)
        assert np.array_equal(crn, cr)

    def test_single_thread_matches_mt(self):
        from jpezy_tpu.runtime import native

        rng = np.random.default_rng(8)
        rgbs = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
        a = native.rgb_to_ycc420(rgbs, nthreads=1)
        b = native.rgb_to_ycc420(rgbs, nthreads=8)
        for x, z in zip(a, b):
            assert np.array_equal(x, z)


class TestYcc420ToRgbBatch:
    def test_matches_single(self):
        from jpezy_tpu.runtime import native

        rng = np.random.default_rng(9)
        ys = rng.integers(0, 256, (3, 32, 48), dtype=np.uint8)
        cbs = rng.integers(0, 256, (3, 16, 24), dtype=np.uint8)
        crs = rng.integers(0, 256, (3, 16, 24), dtype=np.uint8)
        batch = native.ycc420_to_rgb_batch(ys, cbs, crs)
        for i in range(3):
            single = native.ycc420_to_rgb(ys[i], cbs[i], crs[i])
            assert np.array_equal(batch[i], single)
