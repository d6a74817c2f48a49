"""Mixed-size batch encoding with shape bucketing.

XLA compiles per static shape; a stream of arbitrary-size images would
recompile constantly.  Images are bucketed by padded (MCU-aligned) size into
a small set of canonical shapes (powers-of-two-ish ladder), edge-replicated
to the bucket shape, encoded in uniform device batches, and the per-image
streams re-headered with the TRUE dimensions.

Correctness note: padding an image to the bucket shape with edge replication
and encoding at the padded size produces the same MCU set for the true-size
region ONLY when the pad equals the MCU-aligned size, so the stream is
re-headered only when padded dims == bucket dims is not required --- instead
we encode at the bucket size and rewrite SOF dims to the true size.  A
baseline decoder ignores MCUs beyond ceil(dim/16) of the SOF dims, so bucket
MCUs beyond the true image's MCU grid would corrupt the scan; therefore
buckets quantize exactly to the image's padded MCU grid in the common case
and fall back to per-shape encoding otherwise.
"""
from __future__ import annotations

import collections

import numpy as np


def mcu_pad(x: int) -> int:
    return -(-x // 16) * 16


def decode_mixed(streams: list[bytes], *, gray: bool = False,
                 precision: str = "fast") -> list[np.ndarray]:
    """Decode a list of JPEGs of mixed geometry.

    Streams sharing (dims, component layout) are decoded as device batches;
    singletons use the single-image pipeline.  Output order matches input.
    """
    from ..bitstream.reader import parse
    from ..codec import jax_codec

    groups: dict[tuple, list[int]] = collections.defaultdict(list)
    keys = []
    for i, s in enumerate(streams):
        pj = parse(s)
        key = (
            pj.props.width, pj.props.height,
            tuple((fc.H, fc.V, fc.Tq) for fc in pj.frame_components),
        )
        keys.append(key)
        groups[key].append(i)

    out: list[np.ndarray | None] = [None] * len(streams)
    for key, idxs in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            r, g, b, _ = jax_codec.decode(streams[i], gray=gray,
                                          precision=precision)
            out[i] = np.stack([r, g, b], axis=-1)
        else:
            batch, _ = jax_codec.decode_batch(
                [streams[i] for i in idxs], gray=gray, precision=precision
            )
            for j, i in enumerate(idxs):
                out[i] = batch[j]
    return out  # type: ignore[return-value]


def encode_mixed(images: list[np.ndarray], *, gray: bool = False,
                 precision: str = "fast", rounded: bool = False) -> list[bytes]:
    """Encode a list of [H, W, 3] uint8 images of mixed sizes.

    Images whose padded MCU grids coincide are batched together on device;
    singletons fall back to the single-image pipeline.  Output order matches
    input order.
    """
    from ..codec import jax_codec

    groups: dict[tuple[int, int], list[int]] = collections.defaultdict(list)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        groups[(mcu_pad(h), mcu_pad(w))].append(i)

    out: list[bytes | None] = [None] * len(images)
    for (ph, pw), idxs in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            im = images[i]
            out[i] = jax_codec.encode(
                im[..., 0], im[..., 1], im[..., 2], gray=gray,
                precision=precision, rounded=rounded,
            )
            continue
        # same padded grid: encode as one batch at padded size, but each
        # image keeps its true dims in the header.  Pad = edge replication
        # (identical semantics to the single-image path,
        # jpezy_encoder.hpp:101,104).
        batch = np.stack([
            np.pad(images[i],
                   ((0, ph - images[i].shape[0]), (0, pw - images[i].shape[1]),
                    (0, 0)), mode="edge")
            for i in idxs
        ])
        streams = jax_codec.encode_batch(
            batch, gray=gray, precision=precision, rounded=rounded
        )
        from ..bitstream import writer
        from ..core.props import make_encode_props

        for j, i in enumerate(idxs):
            h, w = images[i].shape[:2]
            if (h, w) == (ph, pw):
                out[i] = streams[j]
            else:
                # re-header with true dims (same MCU grid, so the scan is
                # unchanged -- the decoder crops the padded edges)
                hdr = writer.write_header(make_encode_props(w, h, gray=gray))
                old_hdr = writer.write_header(
                    make_encode_props(pw, ph, gray=gray)
                )
                out[i] = hdr + streams[j][len(old_hdr):]
    return out  # type: ignore[return-value]
