"""On-device preprocessing parity (rajni_tpu.data.device).

Three tiers, validated against the host pipeline (itself reference-exact,
tests/test_data.py): on-device normalize must be bit-exact; the full
on-device resample must match PIL within the fixed-point tolerance the
native C++ path is also held to (±1/255 per resample pass).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from rajni_tpu.data.device import normalize_images, preprocess_on_device
from rajni_tpu.data.pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    decode_to_canvas,
    preprocess,
    preprocess_u8,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _rand_im(rng, w, h):
    return Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB"
    )


def test_normalize_images_bit_exact(rng):
    u8 = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    got = np.asarray(normalize_images(jnp.asarray(u8), jnp.float32))
    want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)


def test_uint8_tier_composes_to_host_pipeline(rng):
    """normalize_images(preprocess_u8(im)) == preprocess(im): the uint8-H2D
    tier changes WHERE the normalize runs, never the result."""
    for w, h in [(70, 50), (41, 67), (48, 48)]:
        im = _rand_im(rng, w, h)
        u8 = preprocess_u8(im, img_size=32, resize=36)
        assert u8.dtype == np.uint8 and u8.shape == (32, 32, 3)
        got = np.asarray(normalize_images(jnp.asarray(u8)[None], jnp.float32))[0]
        want = preprocess(im, img_size=32, resize=36)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)


def test_on_device_full_matches_host_pipeline(rng):
    """The in-graph resize/crop/normalize (per-image bicubic weight matrices
    from dynamic sizes) tracks PIL within the same ±1/255-per-pass bound the
    native C++ resampler is held to — across tall/wide/square/odd geometry
    in ONE compiled batch."""
    sizes_wh = [(70, 50), (41, 67), (48, 48), (37, 91)]
    crop, resize, canvas = 32, 36, 96

    canvases, sizes, want = [], [], []
    for w, h in sizes_wh:
        im = _rand_im(rng, w, h)
        buf, hw = decode_to_canvas(im, canvas)
        canvases.append(buf)
        sizes.append(hw)
        want.append(preprocess(im, img_size=crop, resize=resize))

    got = np.asarray(
        preprocess_on_device(
            jnp.asarray(np.stack(canvases)), jnp.asarray(np.stack(sizes)),
            crop=crop, resize=resize, dtype=jnp.float32,
        )
    )
    # compare in [0, 1] pixel space: un-normalize both sides
    got_px = got * IMAGENET_STD + IMAGENET_MEAN
    want_px = np.stack(want) * IMAGENET_STD + IMAGENET_MEAN
    err = np.abs(got_px - want_px)
    assert err.max() <= 2.5 / 255 + 1e-6, err.max()
    # and the bulk of pixels agree to the last uint8 step
    assert np.mean(err <= 1.0 / 255 + 1e-6) > 0.99


def test_on_device_upscale_path(rng):
    """Images whose shorter side is below the resize target hit PIL's
    filterscale=1 (no antialias) branch — cover it explicitly."""
    im = _rand_im(rng, 20, 28)
    buf, hw = decode_to_canvas(im, 64)
    got = np.asarray(
        preprocess_on_device(
            jnp.asarray(buf[None]), jnp.asarray(hw[None]),
            crop=24, resize=32, dtype=jnp.float32,
        )
    )[0]
    want = preprocess(im, img_size=24, resize=32)
    err = np.abs((got - want) * IMAGENET_STD)
    assert err.max() <= 2.5 / 255 + 1e-6, err.max()


def test_decode_to_canvas_oversized(rng):
    """Images larger than the canvas are pre-shrunk to fit."""
    im = _rand_im(rng, 200, 120)
    buf, hw = decode_to_canvas(im, 96)
    assert buf.shape == (96, 96, 3)
    h, w = int(hw[0]), int(hw[1])
    assert max(h, w) <= 96 and w == 96  # long side hits the canvas
    assert buf[:h, :w].any() and not buf[h:, :].any()
