"""Restart-interval (DRI/RSTn) encode extension + decode support.

The reference encoder never emits restarts (README.md:33) but its decoder
handles them (jpezy_decoder.hpp:152-163,400-404); ours does both.
"""
import io

import numpy as np
import pytest
from PIL import Image

from jpezy_tpu.codec import oracle
from jpezy_tpu.bitstream.reader import parse


def split(rgb):
    return rgb[..., 0], rgb[..., 1], rgb[..., 2]


class TestRestartEncode:
    @pytest.mark.parametrize("ri", [1, 3, 7])
    def test_pil_decodes_restart_stream(self, small_rgb, ri):
        data = oracle.encode(*split(small_rgb), restart_interval=ri)
        out = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ref = np.asarray(
            Image.open(io.BytesIO(oracle.encode(*split(small_rgb)))).convert("RGB")
        )
        # restart markers change framing, not content
        assert np.array_equal(out, ref)

    def test_dri_marker_present(self, small_rgb):
        data = oracle.encode(*split(small_rgb), restart_interval=4)
        pj = parse(data)
        assert pj.restart_interval == 4
        assert b"\xff\xd0" in data  # first RST marker

    @pytest.mark.parametrize("ri", [2, 5])
    def test_own_decoder_handles_restarts(self, small_rgb, ri):
        data = oracle.encode(*split(small_rgb), restart_interval=ri)
        r1, g1, b1, _ = oracle.decode(data)
        ref = oracle.encode(*split(small_rgb))
        r2, g2, b2, _ = oracle.decode(ref)
        assert np.array_equal(r1, r2)
        assert np.array_equal(g1, g2)
        assert np.array_equal(b1, b2)

    def test_jax_decoder_handles_restarts(self, small_rgb):
        from jpezy_tpu.codec import jax_codec

        data = oracle.encode(*split(small_rgb), restart_interval=3)
        r1, g1, b1, _ = jax_codec.decode(data)
        r2, g2, b2, _ = jax_codec.decode(oracle.encode(*split(small_rgb)))
        assert np.array_equal(r1, r2)

    @pytest.mark.parametrize("ri", [1, 3, 7, 100])
    def test_jax_encode_bitexact_vs_oracle(self, small_rgb, ri):
        """Device restart encode (exact mode) == numpy oracle, byte for byte."""
        from jpezy_tpu.codec import jax_codec

        ours = jax_codec.encode(*split(small_rgb), precision="exact",
                                restart_interval=ri)
        ref = oracle.encode(*split(small_rgb), restart_interval=ri)
        assert ours == ref

    def test_jax_encode_restart_odd_dims(self, odd_rgb):
        from jpezy_tpu.codec import jax_codec

        ours = jax_codec.encode(*split(odd_rgb), precision="exact",
                                restart_interval=2)
        assert ours == oracle.encode(*split(odd_rgb), restart_interval=2)

    def test_jax_encode_restart_pil_and_own_decode(self, small_rgb):
        """Fast-path restart stream: valid for PIL and our own decoder,
        pixel-identical to the restart-free stream."""
        from jpezy_tpu.codec import jax_codec

        data = jax_codec.encode(*split(small_rgb), restart_interval=2)
        ref = jax_codec.encode(*split(small_rgb))
        out = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        exp = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB"))
        assert np.array_equal(out, exp)
        r1, g1, b1, _ = jax_codec.decode(data)
        r2, g2, b2, _ = jax_codec.decode(ref)
        assert np.array_equal(r1, r2)
        assert np.array_equal(g1, g2)
        assert np.array_equal(b1, b2)

    def test_rst_marker_indices_cycle(self, lena_rgb):
        # 512x512 -> 1024 MCUs; ri=100 -> 11 segments, 10 RST markers cycling 0..7
        data = oracle.encode(*split(lena_rgb), restart_interval=100)
        found = []
        i = 0
        while i + 1 < len(data):
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                found.append(data[i + 1] - 0xD0)
                i += 2
            else:
                i += 1
        assert found == [k % 8 for k in range(10)]
        out = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert out.shape == lena_rgb.shape


class TestRestartValidation:
    def test_negative_restart_interval_rejected(self, small_rgb):
        from jpezy_tpu.codec import jax_codec

        with pytest.raises(ValueError, match="restart_interval"):
            jax_codec.encode(*split(small_rgb), restart_interval=-1)

    def test_cli_rejects_bad_flags(self, small_rgb, tmp_path, capsys):
        from jpezy_tpu import cli
        from jpezy_tpu.runtime import ppm

        src = tmp_path / "in.ppm"
        ppm.write(str(src), small_rgb, fmt="P3")
        for flags in (["--restart-interval", "-1"], ["--quality", "0"],
                      ["--quality", "101"], ["--quality", "x"]):
            rc = cli.main(["encode", str(src), str(tmp_path / "o.jpg")] + flags)
            assert rc == 1
            assert "Usage" in capsys.readouterr().err
