"""Mixed-size batched encoding (BASELINE config 3) + uniform batch APIs."""
import io

import numpy as np
import pytest
from PIL import Image

from imagegen import make_test_image
from jpezy_tpu.codec import jax_codec
from jpezy_tpu.runtime.batch import encode_mixed


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


class TestUniformBatch:
    def test_batch_matches_single(self, small_rgb):
        # encode() routes through the same ycc420 packed transport at N=1
        # (VERDICT r3 #2), so batch and single streams are byte-identical
        batch = np.stack([small_rgb, small_rgb[::-1].copy()])
        streams = jax_codec.encode_batch(batch)
        for i in range(2):
            single = jax_codec.encode(
                batch[i, ..., 0], batch[i, ..., 1], batch[i, ..., 2]
            )
            assert streams[i] == single

    def test_decode_batch_roundtrip(self, small_rgb):
        batch = np.stack([small_rgb, 255 - small_rgb])
        streams = jax_codec.encode_batch(batch)
        out, props = jax_codec.decode_batch(streams)
        assert out.shape == batch.shape
        assert psnr(out[0], batch[0]) > 23.0
        assert psnr(out[1], batch[1]) > 23.0

    def test_decode_batch_matches_single_decode(self, small_rgb):
        batch = np.stack([small_rgb] * 3)
        streams = jax_codec.encode_batch(batch)
        out, _ = jax_codec.decode_batch(streams)
        r, g, b, _ = jax_codec.decode(streams[0])
        assert np.array_equal(out[0], np.stack([r, g, b], -1))


class TestYcc420Transport:
    """Default batch upload path: host float64 RGB->YCC 4:2:0, int8 planes."""

    def test_exact_mode_byte_equal_to_rgb_transport(self, small_rgb):
        batch = np.stack([small_rgb, 255 - small_rgb])
        a = jax_codec.encode_batch(batch, precision="exact", transport="ycc420")
        b = jax_codec.encode_batch(batch, precision="exact", transport="rgb")
        assert a == b

    def test_host_conversion_matches_device_float64(self, small_rgb):
        import jax.numpy as jnp
        from jpezy_tpu.ops import colorspace as C
        from jpezy_tpu.ops.blocks import decimate_420

        r, g, b = (small_rgb[..., i] for i in range(3))
        y, cb, cr = C.rgb_to_ycc(jnp.asarray(r), jnp.asarray(g),
                                 jnp.asarray(b), jnp.float64)
        hy, hcb, hcr = jax_codec.host_rgb_to_ycc420(small_rgb[None])
        assert np.array_equal(hy[0], np.asarray(y, dtype=np.int32))
        assert np.array_equal(hcb[0], np.asarray(decimate_420(cb)))
        assert np.array_equal(hcr[0], np.asarray(decimate_420(cr)))

    def test_fast_mode_decodes_to_reference_quality(self, small_rgb):
        batch = np.stack([small_rgb] * 2)
        streams = jax_codec.encode_batch(batch)  # default = ycc420
        out, _ = jax_codec.decode_batch(streams)
        assert psnr(out[0], small_rgb) > 23.0
        pil = np.asarray(Image.open(io.BytesIO(streams[0])).convert("RGB"))
        assert psnr(pil, small_rgb) > 23.0

    def test_gray_mode(self, small_rgb):
        batch = np.stack([small_rgb] * 2)
        streams = jax_codec.encode_batch(batch, gray=True)
        r, g, b, _ = jax_codec.decode(streams[0])
        assert np.array_equal(r, g) and np.array_equal(g, b)


class TestMixedBatch:
    def test_mixed_sizes_all_decode(self):
        sizes = [(64, 48), (64, 48), (41, 67), (128, 128), (50, 60), (64, 48)]
        images = [make_test_image(h, w, seed=i) for i, (h, w) in enumerate(sizes)]
        streams = encode_mixed(images)
        assert len(streams) == len(images)
        for im, s in zip(images, streams):
            out = np.asarray(Image.open(io.BytesIO(s)).convert("RGB"))
            assert out.shape == im.shape
            assert psnr(out, im) > 20.0

    def test_same_grid_batching_matches_single(self):
        """Images sharing a padded MCU grid but different true dims must
        round-trip with correct dims."""
        a = make_test_image(60, 44, seed=1)   # pads to 64x48
        b = make_test_image(64, 48, seed=2)
        c = make_test_image(49, 33, seed=3)   # pads to 64x48
        streams = encode_mixed([a, b, c])
        for im, s in zip([a, b, c], streams):
            out = np.asarray(Image.open(io.BytesIO(s)).convert("RGB"))
            assert out.shape == im.shape

    def test_mixed_matches_individual_encode(self):
        """Bucketed encoding must produce the same bytes as per-image
        encode (same padded grid -> same MCU data, same header)."""
        a = make_test_image(60, 44, seed=1)
        b = make_test_image(57, 47, seed=2)
        streams = encode_mixed([a, b])
        for im, s in zip([a, b], streams):
            single = jax_codec.encode(im[..., 0], im[..., 1], im[..., 2])
            assert s == single


class TestDecodeTransports:
    def test_ycc420_close_to_rgb_transport(self, small_rgb):
        batch = np.stack([small_rgb, 255 - small_rgb])
        streams = jax_codec.encode_batch(batch)
        fast, _ = jax_codec.decode_batch(streams, transport="ycc420")
        ref, _ = jax_codec.decode_batch(streams, transport="rgb")
        d = np.abs(fast.astype(int) - ref.astype(int))
        # fast transport clamps planes before color conversion: IDCT
        # overshoot pixels may differ slightly
        assert d.max() <= 8
        assert (d > 1).mean() < 0.01

    def test_exact_precision_uses_rgb(self, small_rgb):
        """precision='exact' must keep the reference-faithful transport."""
        batch = np.stack([small_rgb])
        streams = jax_codec.encode_batch(batch)
        out, _ = jax_codec.decode_batch(streams, precision="exact")
        from jpezy_tpu.codec import oracle

        r, g, b, _ = oracle.decode(streams[0])
        assert np.array_equal(out[0], np.stack([r, g, b], -1))


class TestDecodeMixed:
    def test_mixed_geometry_groups(self):
        from jpezy_tpu.runtime.batch import decode_mixed, encode_mixed

        sizes = [(64, 48), (64, 48), (32, 32), (64, 48)]
        images = [make_test_image(h, w, seed=10 + i) for i, (h, w) in enumerate(sizes)]
        streams = encode_mixed(images)
        outs = decode_mixed(streams)
        for im, o in zip(images, outs):
            assert o.shape == im.shape
            assert psnr(o, im) > 20.0


@pytest.mark.slow
class TestLargeMixedBatch:
    def test_100_mixed_images(self):
        """BASELINE config 3 scaled for CI: 100 mixed-size images through
        the bucketing pipeline; every stream decodes to correct dims."""
        rng = np.random.default_rng(0)
        sizes = [(int(rng.integers(17, 97)), int(rng.integers(17, 97)))
                 for _ in range(100)]
        images = [make_test_image(h, w, seed=i) for i, (h, w) in enumerate(sizes)]
        streams = encode_mixed(images)
        ok = 0
        for im, s in zip(images, streams):
            out = np.asarray(Image.open(io.BytesIO(s)).convert("RGB"))
            assert out.shape == im.shape
            ok += 1
        assert ok == 100
