"""Native C++ preprocessing vs the PIL reference path.

The native library re-implements PIL's antialiased bicubic resampler
(uint8 8bpc pipeline) in float; results must agree within fixed-point
rounding (±1/255 per channel before normalization)."""

from __future__ import annotations

import numpy as np
import pytest

from rajni_tpu.data import native
from rajni_tpu.data.pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    preprocess,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native preprocessing failed to build"
)

# ±1.5/255 before normalization, scaled by the smallest std.
TOL = 1.5 / 255.0 / float(IMAGENET_STD.min())


def _pil_image(arr):
    from PIL import Image

    return Image.fromarray(arr, "RGB")


@pytest.mark.parametrize(
    "h,w",
    [
        (500, 375),   # portrait downscale (typical ImageNet)
        (375, 500),   # landscape downscale
        (224, 224),   # upscale to 256
        (1024, 100),  # extreme aspect ratio
        (257, 256),   # near-identity resize
    ],
)
def test_matches_pil_reference(rng, h, w):
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    want = preprocess(_pil_image(rgb), 224, 256)
    got = native.preprocess_native(rgb, 224, 256, IMAGENET_MEAN, IMAGENET_STD)
    assert got.shape == want.shape == (224, 224, 3)
    diff = np.abs(got - want)
    assert diff.max() <= TOL, f"max diff {diff.max():.5f} > {TOL:.5f}"
    # PIL uses int16 fixed-point filter coefficients vs our float weights, so
    # ±1/255 flips are common on noise images — but never more than ±1, and
    # a majority of pixels still agree bit-exactly.
    assert (diff == 0).mean() > 0.5


def test_constant_image_exact():
    rgb = np.full((300, 400, 3), 127, np.uint8)
    got = native.preprocess_native(rgb, 224, 256, IMAGENET_MEAN, IMAGENET_STD)
    want = (127 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, np.broadcast_to(want, got.shape), rtol=1e-6)


def test_smooth_gradient(rng):
    """Smooth content (the realistic case): near-exact agreement."""
    y = np.linspace(0, 255, 480)[:, None, None]
    x = np.linspace(0, 255, 640)[None, :, None]
    rgb = np.clip(y * 0.5 + x * 0.5, 0, 255).astype(np.uint8)
    rgb = np.repeat(rgb, 3, axis=2)
    want = preprocess(_pil_image(rgb), 224, 256)
    got = native.preprocess_native(rgb, 224, 256, IMAGENET_MEAN, IMAGENET_STD)
    assert np.abs(got - want).max() <= TOL


def test_imagefolder_native_fallback_consistency(tmp_path, rng):
    """ImageFolder with and without the native path yields the same labels
    and near-identical tensors."""
    from rajni_tpu.data.pipeline import ImageFolder

    from PIL import Image

    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            arr = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")

    ds_native = ImageFolder(str(tmp_path), img_size=32, resize=48)
    ds_pil = ImageFolder(str(tmp_path), img_size=32, resize=48,
                         use_native=False)
    assert len(ds_native) == len(ds_pil) == 4
    for i in range(4):
        a, la = ds_native.load(i)
        b, lb = ds_pil.load(i)
        assert la == lb
        assert np.abs(a - b).max() <= TOL
