"""encode_batch extension matrix (VERDICT r1 #6): quality, restart_interval
and PER-IMAGE optimize must behave exactly like the single-image encode().

transport="rgb" converts color on device exactly like encode(), so streams
are byte-comparable in fast mode; ycc420-transport equivalence is covered
in exact mode (float64 host color == float64 device color).
"""
import numpy as np
import pytest

from jpezy_tpu.codec import jax_codec, oracle


@pytest.fixture(scope="module")
def batch3():
    from imagegen import make_test_image

    return np.stack([make_test_image(64, 64, seed=20 + i) for i in range(3)])


def _singles(batch, **kw):
    return [jax_codec.encode(b[..., 0], b[..., 1], b[..., 2], **kw)
            for b in batch]


class TestBatchQuality:
    def test_byte_equal_default_transport(self, batch3):
        # encode() routes through the same ycc420 packed transport at N=1
        # (VERDICT r3 #2), so batch and single are byte-identical; the rgb
        # transport's device-f32 color may differ on truncation ties
        got = jax_codec.encode_batch(batch3, quality=80)
        assert got == _singles(batch3, quality=80)

    def test_ycc420_exact_byte_equal(self, batch3):
        got = jax_codec.encode_batch(batch3, precision="exact", quality=80)
        ref = _singles(batch3, precision="exact", quality=80)
        # exact mode: host float64 color == device float64 color
        assert got == ref

    def test_invalid_quality_raises(self, batch3):
        with pytest.raises(ValueError):
            jax_codec.encode_batch(batch3, quality=0)


class TestBatchRestart:
    def test_byte_equal(self, batch3):
        got = jax_codec.encode_batch(batch3, transport="rgb",
                                     restart_interval=4)
        assert got == _singles(batch3, restart_interval=4)

    def test_roundtrip_decode_batch(self, batch3):
        streams = jax_codec.encode_batch(batch3, restart_interval=4)
        out, _ = jax_codec.decode_batch(streams)
        ref, _ = jax_codec.decode_batch(jax_codec.encode_batch(batch3))
        assert np.array_equal(out, ref)

    def test_negative_raises(self, batch3):
        with pytest.raises(ValueError):
            jax_codec.encode_batch(batch3, restart_interval=-2)


class TestBatchOptimizePerImage:
    def test_byte_equal_to_single_optimize(self, batch3):
        # per-image tables: stream i must equal encode(img_i, optimize=True)
        got = jax_codec.encode_batch(batch3, precision="exact", optimize=True)
        ref = _singles(batch3, precision="exact", optimize=True)
        assert got == ref

    def test_tables_differ_across_images(self, batch3):
        # distinct images -> distinct optimal DHT segments in the headers
        streams = jax_codec.encode_batch(batch3, optimize=True)
        dhts = []
        for s in streams:
            i = s.find(b"\xff\xc4")
            assert i > 0
            dhts.append(s[i : i + 64])
        assert len(set(dhts)) > 1

    def test_smaller_and_same_pixels(self, batch3):
        plain = jax_codec.encode_batch(batch3)
        opt = jax_codec.encode_batch(batch3, optimize=True)
        assert sum(map(len, opt)) < sum(map(len, plain))
        a, _ = jax_codec.decode_batch(opt)
        b, _ = jax_codec.decode_batch(plain)
        assert np.array_equal(a, b)

    def test_optimize_with_restart_and_quality(self, batch3):
        got = jax_codec.encode_batch(batch3, precision="exact",
                                     optimize=True, quality=70,
                                     restart_interval=2)
        ref = _singles(batch3, precision="exact", optimize=True, quality=70,
                       restart_interval=2)
        assert got == ref


class TestOverflowCompOrderSplice:
    """The fast transport keeps packed words in COMPONENT order on device
    (no MCU interleave); the overflow fallback must reorder them on host
    before splicing.  256x256 noise overflows the 2-word/block stream
    budget deterministically; exact mode pins byte equality vs the
    oracle through the host-splice path."""

    @pytest.mark.parametrize("ri", [0, 4])
    def test_overflow_byte_identical(self, ri):
        rng = np.random.default_rng(11)
        noise = rng.integers(0, 256, (256, 256, 3), np.uint8)
        r, g, b = noise[..., 0], noise[..., 1], noise[..., 2]
        d = jax_codec.encode(r, g, b, precision="exact",
                             restart_interval=ri)
        assert d == oracle.encode(r, g, b, restart_interval=ri)
