"""Pipelined batch codec (runtime/pipeline.py): results must be identical to
the unpipelined batch APIs, for every lookahead depth and batch count."""
import numpy as np
import pytest

from imagegen import make_test_image
from jpezy_tpu.codec import jax_codec
from jpezy_tpu.runtime import pipeline


def _batches(n_batches, n=3, h=64, w=64):
    return [
        np.stack([make_test_image(h, w, seed=100 * j + i) for i in range(n)])
        for j in range(n_batches)
    ]


@pytest.mark.parametrize("lookahead", [0, 1, 2])
@pytest.mark.parametrize("n_batches", [1, 3])
def test_encode_batches_matches_serial(lookahead, n_batches):
    batches = _batches(n_batches)
    piped = list(pipeline.encode_batches(iter(batches), lookahead=lookahead))
    assert len(piped) == n_batches
    for rgbs, streams in zip(batches, piped):
        assert streams == jax_codec.encode_batch(rgbs)


@pytest.mark.parametrize("lookahead", [0, 2])
def test_decode_batches_matches_serial(lookahead):
    batches = _batches(3)
    stream_lists = [jax_codec.encode_batch(b) for b in batches]
    piped = list(pipeline.decode_batches(iter(stream_lists),
                                         lookahead=lookahead))
    assert len(piped) == 3
    for streams, (pix, props) in zip(stream_lists, piped):
        ref, ref_props = jax_codec.decode_batch(streams)
        np.testing.assert_array_equal(pix, ref)
        assert (props.width, props.height) == (ref_props.width,
                                               ref_props.height)


def test_roundtrip_batches():
    batches = _batches(2, n=2)
    out = list(pipeline.roundtrip_batches(iter(batches), lookahead=1))
    assert len(out) == 2
    for rgbs, (streams, pix) in zip(batches, out):
        assert streams == jax_codec.encode_batch(rgbs)
        ref, _ = jax_codec.decode_batch(streams)
        np.testing.assert_array_equal(pix, ref)
        # quality sanity: decoded pixels approximate the source
        err = np.abs(pix.astype(float) - rgbs.astype(float)).mean()
        assert err < 30


def test_pipeline_empty_input():
    assert list(pipeline.encode_batches(iter([]))) == []
    assert list(pipeline.decode_batches(iter([]))) == []
