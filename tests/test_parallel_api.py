"""High-level sharded API + 4K-image tiling (BASELINE config 4 analog)."""
import numpy as np
import jax
import pytest

from imagegen import make_test_image
from jpezy_tpu.codec import jax_codec
from jpezy_tpu.parallel.mesh import make_mesh
from jpezy_tpu.parallel.api import encode_sharded
from jpezy_tpu.parallel.distributed import make_global_mesh, make_global_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestShardedApi:
    def test_encode_sharded_matches_single(self, small_rgb):
        mesh = make_mesh(data=2, tile=4)
        batch = np.stack([small_rgb] * 2)
        streams = encode_sharded(mesh, batch)
        ref = jax_codec.encode(
            small_rgb[..., 0], small_rgb[..., 1], small_rgb[..., 2]
        )
        assert streams[0] == ref and streams[1] == ref

    def test_4k_image_mcu_row_tiling(self):
        """A large image tiled over 8 'tile' shards decodes correctly.

        (4K-class dims scaled to keep CI fast: 1024x768 = 48x64 MCU rows.)
        """
        img = make_test_image(1024, 768, seed=5)
        mesh = make_mesh(data=1, tile=8)
        streams = encode_sharded(mesh, img[None])
        # unsharded same-code-path baseline (device f32 color; encode()
        # itself uses host f64 color since r4 and may differ on ties)
        ref = jax_codec.encode_batch(img[None], transport="rgb")[0]
        assert streams[0] == ref
        r, g, b, props = jax_codec.decode(streams[0])
        assert (props.width, props.height) == (768, 1024)
        err = np.abs(np.stack([r, g, b], -1).astype(int) - img.astype(int)).mean()
        assert err < 15


class TestDistributedHelpers:
    def test_global_mesh_single_process(self):
        mesh = make_global_mesh(data=2, tile=4)
        assert mesh.shape == {"data": 2, "tile": 4}

    def test_make_global_batch_places(self, small_rgb):
        mesh = make_global_mesh(data=2, tile=4)
        batch = np.stack([small_rgb[..., 0]] * 2)
        arr = make_global_batch(mesh, batch)
        assert arr.shape == batch.shape


class TestDecodeSharded:
    def test_matches_single_device_decode(self, small_rgb):
        from jpezy_tpu.parallel.api import decode_sharded

        mesh = make_mesh(data=2, tile=4)
        batch = np.stack([small_rgb, 255 - small_rgb])
        streams = jax_codec.encode_batch(batch)
        out = decode_sharded(mesh, streams)
        ref, _ = jax_codec.decode_batch(streams, transport="rgb")
        assert np.array_equal(out, ref)
