"""Opt-in REAL-TPU tests (VERDICT r1 #7).  The main suite pins the CPU
backend (conftest.py), so these run the checks in a subprocess that keeps
the default (tunneled TPU) backend.  Enable with JPEZY_TPU_TESTS=1; skipped
otherwise (the chip claim is exclusive and slow to establish, so they must
never run implicitly alongside the hermetic suite).

Covers:
  - pack_words_pallas == the fori_loop packer bit-for-bit on device
  - a TPU-encoded stream PIL-decodes above a hard PSNR floor
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_ENABLED = os.environ.get("JPEZY_TPU_TESTS") == "1"

_CHILD = r"""
import sys, os
repo = os.environ["JPEZY_REPO"]
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))
import numpy as np
import jax, jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

from imagegen import make_test_image
from jpezy_tpu.ops import entropy as E
from jpezy_tpu.ops.pack_pallas import pack_words_pallas, warm_pack_kernel

warm_pack_kernel()

# --- pallas packer == fori_loop packer, bit for bit, on real emissions
img = make_test_image(256, 256, seed=7)
from jpezy_tpu.codec import jax_codec as JC
from jpezy_tpu.core.geometry import EncodeGeometry
geo = EncodeGeometry(width=256, height=256)
yq, cbq, crq = JC.quantize_planes(
    jnp.asarray(img[..., 0]), jnp.asarray(img[..., 1]),
    jnp.asarray(img[..., 2]), ph=geo.padded_height, pw=geo.padded_width,
    gray=False)
hi, lo, n = E.block_emissions(yq, E.dc_predictors(yq[:, 0]), False)
w_pal, b_pal = E.pack_block_words(hi, lo, n, use_pallas=True)
w_ref, b_ref = E.pack_block_words(hi, lo, n, use_pallas=False)
assert np.array_equal(np.asarray(b_pal), np.asarray(b_ref)), "bit counts"
assert np.array_equal(np.asarray(w_pal), np.asarray(w_ref)), \
    "pallas packer != fori_loop packer"
print("pallas-vs-fallback: OK")

# --- TPU-encoded stream must PIL-decode above a hard PSNR floor
data = JC.encode(img[..., 0], img[..., 1], img[..., 2])
from PIL import Image
import io
pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
mse = np.mean((pil.astype(float) - img.astype(float)) ** 2)
psnr = 10 * np.log10(255**2 / mse)
# measured envelope for this image is 26.81 dB (fast-path f32);
# floor set just under it so a real quality regression fails
assert psnr >= 26.7, f"PSNR {psnr:.2f} dB < 26.7 dB"
print(f"tpu-encode PSNR: {psnr:.2f} dB OK")
"""


@pytest.mark.skipif(not _ENABLED, reason="JPEZY_TPU_TESTS=1 not set")
def test_tpu_pallas_packer_and_psnr(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "tpu_child.py"
    script.write_text(_CHILD)
    env = dict(os.environ, JPEZY_REPO=repo)
    # drop the hermetic-suite overrides so the child gets the TPU backend
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    res = subprocess.run([sys.executable, str(script)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         timeout=900)
    out = res.stdout.decode(errors="replace")
    assert res.returncode == 0, out[-4000:]
    assert "pallas-vs-fallback: OK" in out
    assert "OK" in out.splitlines()[-1]
