"""encode_sharded / decode_sharded API tests on the virtual 8-device mesh.

VERDICT r1 #4/#6: the sharded entry points must carry the full extension
matrix (quality / restart_interval / optimize) with byte-identical streams
to the UNsharded device path, use on-device stream concat (compact fetch),
and the fused decode_sharded must match single-chip decode pixels exactly.

The byte-equality baseline is encode_batch(transport="rgb"): the same
device color+transform code (parallel/sharded.py:_encode_local) without a
mesh, so any difference isolates the sharding machinery (DC-carry
ppermute, per-shard concat, host splice).  encode() itself now converts
color on the host in float64 (VERDICT r3 #2), which may legitimately
differ from the device float32 color on truncation ties.
"""
import numpy as np
import jax
import pytest

from jpezy_tpu.codec import jax_codec
from jpezy_tpu.parallel.api import decode_sharded, encode_sharded
from jpezy_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def batch4():
    from imagegen import make_test_image

    return np.stack([make_test_image(128, 64, seed=10 + i) for i in range(4)])


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(data=2, tile=4)


def _single(img, **kw):
    # unsharded same-code-path baseline (see module docstring)
    return jax_codec.encode_batch(img[None], transport="rgb", **kw)[0]


class TestEncodeSharded:
    def test_byte_equal_plain(self, mesh24, batch4):
        assert encode_sharded(mesh24, batch4) == [_single(b) for b in batch4]

    def test_byte_equal_quality(self, mesh24, batch4):
        got = encode_sharded(mesh24, batch4, quality=85)
        assert got == [_single(b, quality=85) for b in batch4]

    def test_byte_equal_restart(self, mesh24, batch4):
        # 128x64 -> 8x4 = 32 MCUs, 8 per tile shard; ri=4 divides 8
        got = encode_sharded(mesh24, batch4, restart_interval=4)
        assert got == [_single(b, restart_interval=4) for b in batch4]

    def test_restart_misaligned_raises(self, mesh24, batch4):
        with pytest.raises(ValueError, match="segment"):
            encode_sharded(mesh24, batch4, restart_interval=3)

    def test_negative_restart_raises(self, mesh24, batch4):
        with pytest.raises(ValueError, match="restart_interval"):
            encode_sharded(mesh24, batch4, restart_interval=-1)

    def test_optimize_decodes_identically_and_smaller(self, mesh24, batch4):
        plain = encode_sharded(mesh24, batch4)
        opt = encode_sharded(mesh24, batch4, optimize=True)
        assert sum(map(len, opt)) < sum(map(len, plain))
        for s_opt, s_plain in zip(opt, plain):
            a = jax_codec.decode(s_opt)[:3]
            b = jax_codec.decode(s_plain)[:3]
            for pa, pb in zip(a, b):
                assert np.array_equal(pa, pb)

    def test_gray(self, mesh24, batch4):
        got = encode_sharded(mesh24, batch4, gray=True)
        assert got == [_single(b, gray=True) for b in batch4]


class TestDecodeSharded:
    def test_fused_decode_matches_single_chip(self, mesh24, batch4):
        streams = encode_sharded(mesh24, batch4)
        pix = decode_sharded(mesh24, streams)
        assert pix.shape == (4, 128, 64, 3)
        for i, s in enumerate(streams):
            r, g, b, _ = jax_codec.decode(s)
            assert np.array_equal(pix[i, ..., 0], r)
            assert np.array_equal(pix[i, ..., 1], g)
            assert np.array_equal(pix[i, ..., 2], b)

    def test_roundtrip_on_mesh_with_restarts(self, mesh24, batch4):
        streams = encode_sharded(mesh24, batch4, restart_interval=4)
        pix = decode_sharded(mesh24, streams)
        ref = decode_sharded(mesh24, encode_sharded(mesh24, batch4))
        assert np.array_equal(pix, ref)  # same quant -> same pixels
