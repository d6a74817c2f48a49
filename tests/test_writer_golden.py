"""Byte-level golden test of the JFIF header writer.

Hand-assembled expected bytes for a 32x16 image with the default encode
props (mirrors the reference's segment emission, jpezy_writer.hpp:20-94).
"""
from jpezy_tpu.bitstream import writer
from jpezy_tpu.core import tables as T
from jpezy_tpu.core.props import make_encode_props


def test_header_bytes_golden():
    pr = make_encode_props(32, 16)
    hdr = writer.write_header(pr)

    i = 0
    # SOI
    assert hdr[i:i+2] == b"\xff\xd8"; i += 2
    # APP0: FF E0 0010 "JFIF\0" 01 02 01 0060 0060 00 00
    assert hdr[i:i+4] == b"\xff\xe0\x00\x10"; i += 4
    assert hdr[i:i+5] == b"JFIF\x00"; i += 5
    assert hdr[i:i+2] == bytes([1, 2]); i += 2          # version 1.02
    assert hdr[i] == 1; i += 1                          # dots/inch
    assert hdr[i:i+4] == b"\x00\x60\x00\x60"; i += 4    # 96x96
    assert hdr[i:i+2] == b"\x00\x00"; i += 2            # no thumbnail
    # COM: "Encoded by jpezy" + NUL, length 16+3
    assert hdr[i:i+2] == b"\xff\xfe"; i += 2
    assert hdr[i:i+2] == bytes([0, 19]); i += 2
    assert hdr[i:i+17] == b"Encoded by jpezy\x00"; i += 17
    # DQT luma: FF DB 0043 00 then 64 zigzag bytes
    assert hdr[i:i+5] == b"\xff\xdb\x00\x43\x00"; i += 5
    assert hdr[i] == T.Y_QUANT[T.ZIGZAG[0]] == 16
    assert hdr[i+1] == T.Y_QUANT[T.ZIGZAG[1]] == 11
    assert hdr[i+63] == T.Y_QUANT[T.ZIGZAG[63]] == 99
    i += 64
    # DQT chroma
    assert hdr[i:i+5] == b"\xff\xdb\x00\x43\x01"; i += 5
    assert hdr[i] == 17; i += 64
    # DHT x4: exact reference blob lengths 33/33/183/183
    for tc_th, ln in ((0x00, 0x1f), (0x01, 0x1f), (0x10, 0xb5), (0x11, 0xb5)):
        assert hdr[i:i+2] == b"\xff\xc4", hex(i)
        assert hdr[i+2:i+4] == bytes([0, ln])
        assert hdr[i+4] == tc_th
        i += 2 + ln
    # SOF0: FF C0 0011 08 0010(H=16) 0020(W=32) 03, comps (0,0x22,0)(1,0x11,1)(2,0x11,1)
    assert hdr[i:i+2] == b"\xff\xc0"; i += 2
    assert hdr[i:i+2] == bytes([0, 17]); i += 2
    assert hdr[i] == 8; i += 1
    assert hdr[i:i+2] == bytes([0, 16]); i += 2
    assert hdr[i:i+2] == bytes([0, 32]); i += 2
    assert hdr[i] == 3; i += 1
    assert hdr[i:i+3] == bytes([0, 0x22, 0]); i += 3
    assert hdr[i:i+3] == bytes([1, 0x11, 1]); i += 3
    assert hdr[i:i+3] == bytes([2, 0x11, 1]); i += 3
    # SOS: FF DA 000C 03 (0,00)(1,11)(2,11) 00 3F 00
    assert hdr[i:i+2] == b"\xff\xda"; i += 2
    assert hdr[i:i+2] == bytes([0, 12]); i += 2
    assert hdr[i] == 3; i += 1
    assert hdr[i:i+6] == bytes([0, 0x00, 1, 0x11, 2, 0x11]); i += 6
    assert hdr[i:i+3] == bytes([0, 63, 0]); i += 3
    assert i == len(hdr)


def test_header_with_dri():
    hdr = writer.write_header(make_encode_props(32, 16), restart_interval=5)
    # DRI segment sits immediately before SOS
    sos = hdr.find(b"\xff\xda")
    assert hdr[sos-6:sos] == b"\xff\xdd\x00\x04\x00\x05"
