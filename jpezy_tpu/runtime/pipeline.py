"""Pipelined batch codec: overlap host<->device transfers with compute.

On a production serving path the codec is a streaming system: batches of
images arrive continuously, and sustained throughput -- not single-batch
latency -- is the metric.  JAX dispatch is asynchronous (device_put and
jitted calls return futures immediately), so keeping `lookahead` batches in
flight overlaps

  - batch i's result fetch (device->host) with batch i+1's upload
    (host->device): the transfers ride the link full-duplex;
  - the host byte work (JFIF assembly, entropy frontend, PPM serialization)
    with the device compute of the batches in flight.

The reference is a strictly sequential read->compute->write program
(src/encoder/main.cpp, src/decoder/main.cpp); this module is its
steady-state production analog.

Usage:
    for streams in encode_batches(batch_iter):   # list[bytes] per batch
        ...
    for pixels, props in decode_batches(stream_lists):
        ...
Chaining the two generators pipelines a full transcode: while one batch's
pixels download, the next batch's pixels upload and a third is in compute.
"""
from __future__ import annotations

import collections
from typing import Iterable, Iterator

import numpy as np

from ..codec import jax_codec


def encode_batches(batches: Iterable[np.ndarray], *, lookahead: int = 1,
                   gray: bool = False, precision: str = "fast",
                   rounded: bool = False, quality: int | None = None,
                   restart_interval: int = 0,
                   optimize: bool = False) -> Iterator[list[bytes]]:
    """Encode an iterable of uniform [N, H, W, 3] u8 batches, pipelined.

    Yields one list[bytes] of JFIF streams per input batch, in order, with
    up to `lookahead + 1` batches in flight on the device.  Extension
    kwargs as encode_batch (docs/PARITY.md matrix).
    """
    pending: collections.deque = collections.deque()
    for rgbs in batches:
        pending.append(jax_codec.encode_batch_dispatch(
            rgbs, gray=gray, precision=precision, rounded=rounded,
            quality=quality, restart_interval=restart_interval,
            optimize=optimize))
        if len(pending) > lookahead:
            yield jax_codec.encode_batch_finish(pending.popleft())
    while pending:
        yield jax_codec.encode_batch_finish(pending.popleft())


def decode_batches(stream_lists: Iterable[list[bytes]], *, lookahead: int = 1,
                   gray: bool = False, precision: str = "fast",
                   transport: str | None = None) -> Iterator[tuple[np.ndarray, object]]:
    """Decode an iterable of uniform-geometry JPEG batch lists, pipelined.

    Yields ([N, H, W, 3] uint8, ImageProps) per batch, in order.  The host
    entropy frontend of batch i+1 runs while batch i's pixels are still in
    device compute / on the wire.
    """
    pending: collections.deque = collections.deque()
    for streams in stream_lists:
        pending.append(jax_codec.decode_batch_dispatch(
            streams, gray=gray, precision=precision, transport=transport))
        if len(pending) > lookahead:
            yield jax_codec.decode_batch_finish(pending.popleft())
    while pending:
        yield jax_codec.decode_batch_finish(pending.popleft())


def roundtrip_batches(batches: Iterable[np.ndarray], *, lookahead: int = 1,
                      gray: bool = False, precision: str = "fast",
                      rounded: bool = False,
                      transport: str | None = None) -> Iterator[tuple[list[bytes], np.ndarray]]:
    """Encode then decode each batch, fully pipelined end to end.

    Yields (streams, decoded_pixels) per batch.  Every image is really
    encoded to complete JFIF bytes on the host and re-decoded from those
    bytes (no device-side short-circuit)."""
    stream_iter = encode_batches(
        batches, lookahead=lookahead, gray=gray, precision=precision,
        rounded=rounded)

    # tee the streams to pair them back up with the decoded pixels
    seen: collections.deque = collections.deque()

    def _streams():
        for s in stream_iter:
            seen.append(s)
            yield s

    for pixels, _props in decode_batches(
            _streams(), lookahead=lookahead, gray=gray, precision=precision,
            transport=transport):
        yield seen.popleft(), pixels
