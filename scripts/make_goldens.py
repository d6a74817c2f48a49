"""Generate the golden fixtures under tests/fixtures/ (run once; committed).

The reference binary cannot be built offline (its srook/boost dependencies
are ExternalProject git fetches, get_srookcpp.cmake:1-12, and this
environment has no network and no boost headers), so jpezy-semantics are
pinned by committed artifacts instead (VERDICT r2 #5's fallback):

  golden_<name>.ppm          source image (P3)
  golden_<name>.jpg          jpezy-format stream our exact-mode encoder
                             produced at generation time
  golden_<name>_planes.npz   r/g/b planes our exact-mode decoder produced
                             from that stream at generation time

tests/test_goldens.py then asserts -- WITHOUT importing codec/oracle.py --
that today's encoder/decoder reproduce these bytes exactly, that PIL (an
independent JPEG implementation) accepts the streams and roughly agrees on
pixels, and that a from-scratch naive float64 IDCT transcribed from
jpezy_decoder.hpp:652-670 inside the test reproduces the decoded blocks.
Any semantic drift in tables, bitstream layout, transforms or upsampling
breaks byte equality.
"""
from __future__ import annotations

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from imagegen import make_test_image
    from jpezy_tpu.codec import jax_codec
    from jpezy_tpu.runtime import ppm
    from PIL import Image

    os.makedirs(FIXDIR, exist_ok=True)

    cases = {
        # odd dims exercise edge replication + decode crop
        "lena_like": make_test_image(121, 187, seed=41),
        "small": make_test_image(48, 48, seed=42),
    }
    for name, rgb in cases.items():
        src = os.path.join(FIXDIR, f"golden_{name}.ppm")
        ppm.write(src, rgb, comment=None)
        data = jax_codec.encode(rgb[..., 0], rgb[..., 1], rgb[..., 2],
                                precision="exact")
        with open(os.path.join(FIXDIR, f"golden_{name}.jpg"), "wb") as f:
            f.write(data)
        r, g, b, props = jax_codec.decode(data, precision="exact")
        np.savez_compressed(
            os.path.join(FIXDIR, f"golden_{name}_planes.npz"),
            r=r, g=g, b=b)
        # independent validation at generation time: PIL must open it and
        # broadly agree (PIL uses fancy upsampling + islow IDCT, so exact
        # equality is not expected)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ours = np.stack([r, g, b], -1)
        mse = np.mean((pil.astype(float) - ours.astype(float)) ** 2)
        psnr = 10 * np.log10(255**2 / mse)
        print(f"{name}: {len(data)} bytes, PIL-vs-ours PSNR {psnr:.1f} dB")
        assert psnr > 30.0

    # gray-mode fixture (3 components, zeroed chroma, 'Encoded by JPEZY')
    rgb = cases["small"]
    data = jax_codec.encode(rgb[..., 0], rgb[..., 1], rgb[..., 2],
                            precision="exact", gray=True)
    with open(os.path.join(FIXDIR, "golden_gray.jpg"), "wb") as f:
        f.write(data)
    r, g, b, _ = jax_codec.decode(data, precision="exact")
    np.savez_compressed(os.path.join(FIXDIR, "golden_gray_planes.npz"),
                        r=r, g=g, b=b)
    print(f"gray: {len(data)} bytes")
    print("fixtures written to", FIXDIR)


if __name__ == "__main__":
    main()
