"""Bitstream differ + profiling utilities."""
import numpy as np

from jpezy_tpu.bitstream import differ
from jpezy_tpu.codec import oracle
from jpezy_tpu.utils.profiling import Stopwatch, encode_flops


def split(rgb):
    return rgb[..., 0], rgb[..., 1], rgb[..., 2]


class TestDiffer:
    def test_identical(self, small_rgb):
        a = oracle.encode(*split(small_rgb))
        assert differ.diff(a, a) == []

    def test_segment_names(self, small_rgb):
        a = oracle.encode(*split(small_rgb))
        names = [s.name for s in differ.segment_list(a)]
        assert names[:4] == ["SOI", "APP0", "COM", "DQT"]
        assert "SOF0" in names and "SOS" in names and "SCAN" in names
        assert names[-1] == "EOI"

    def test_detects_payload_diff(self, small_rgb):
        a = oracle.encode(*split(small_rgb))
        b = oracle.encode(*split(small_rgb), gray=True)  # COM text differs
        report = differ.diff(a, b)
        assert any("COM" in line for line in report)

    def test_detects_missing_segment(self, small_rgb):
        a = oracle.encode(*split(small_rgb))
        b = oracle.encode(*split(small_rgb), restart_interval=4)
        report = differ.diff(a, b)
        assert report  # DRI segment and scan framing differ


class TestProfiling:
    def test_flop_model(self):
        c = encode_flops(512, 512)
        assert c["blocks"] == 6144
        assert c["dct_flops"] == 6144 * 8192

    def test_stopwatch(self):
        sw = Stopwatch()
        with sw.section("a"):
            pass
        with sw.section("a"):
            pass
        assert "a" in sw.report()
