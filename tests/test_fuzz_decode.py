"""Decoder robustness fuzzing: corrupted inputs must raise typed errors
promptly — never crash, hang, or emit wrong-size output.

(The reference's quirk ledger includes two silently-swallowed error paths,
jpezy_decoder.hpp:420,617 — we promise the opposite.)
"""
import numpy as np
import pytest

from jpezy_tpu.codec import jax_codec, oracle
from jpezy_tpu.bitstream.reader import JpegFormatError


def split(rgb):
    return rgb[..., 0], rgb[..., 1], rgb[..., 2]


@pytest.fixture(scope="module")
def stream(small_rgb=None):
    import sys

    sys.path.insert(0, "tests")
    from imagegen import make_test_image

    img = make_test_image(64, 48, seed=1)
    return oracle.encode(*split(img))


ACCEPTABLE = (JpegFormatError, ValueError, RuntimeError, IndexError)


class TestCorruption:
    def test_truncations(self, stream):
        """Every truncation point either decodes (entropy cut after last
        MCU's data may still complete via padding) or raises."""
        rng = np.random.default_rng(0)
        for cut in sorted(rng.integers(2, len(stream) - 1, size=40).tolist()):
            data = stream[:cut]
            try:
                r, g, b, props = jax_codec.decode(data)
                assert r.shape == (64, 48)
            except ACCEPTABLE:
                pass

    def test_single_byte_flips(self, stream):
        rng = np.random.default_rng(1)
        for _ in range(60):
            pos = int(rng.integers(2, len(stream)))
            val = int(rng.integers(0, 256))
            data = bytearray(stream)
            data[pos] = val
            try:
                r, g, b, _ = jax_codec.decode(bytes(data))
                assert r.shape == (64, 48)
            except ACCEPTABLE:
                pass

    def test_header_zeroed(self, stream):
        """Zeroing the APP0 region leaves a still-valid headerless JPEG: the
        marker scan skips garbage (like the reference's get_marker loop).
        Either outcome (decode without JFIF metadata, or typed error) is
        acceptable; a crash/hang is not."""
        data = stream[:2] + b"\x00" * 50 + stream[52:]
        try:
            r, _, _, props = jax_codec.decode(data)
            assert r.shape == (64, 48)
            assert int(props.format) == 0  # JFIF APP0 destroyed
        except ACCEPTABLE:
            pass

    def test_no_sos(self, stream):
        # cut before the SOS marker
        idx = stream.find(b"\xff\xda")
        with pytest.raises(ACCEPTABLE):
            jax_codec.decode(stream[:idx])

    def test_missing_dht(self, stream):
        # strip the four DHT segments: decodable gate must fire
        data = stream
        while True:
            i = data.find(b"\xff\xc4")
            if i < 0:
                break
            ln = (data[i + 2] << 8) | data[i + 3]
            data = data[:i] + data[i + 2 + ln:]
        with pytest.raises(ACCEPTABLE) as exc:
            jax_codec.decode(data)
        assert "HTABLE" in str(exc.value) or "huffman" in str(exc.value).lower()

    def test_empty_and_tiny(self):
        for data in (b"", b"\xff", b"\xff\xd8", b"\xff\xd8\xff\xd9"):
            with pytest.raises(ACCEPTABLE):
                jax_codec.decode(data)
