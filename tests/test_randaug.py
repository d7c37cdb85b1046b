"""In-graph RandAugment + RandomErasing (rajni_tpu/data/randaug.py).

The reference is inference-only, so this is TPU-native training surface
beyond parity (like the crop/flip pipeline it extends). These tests pin the
claims in the module docstring against PIL itself:

  * LUT ops (invert / posterize / solarize / solarize-add / autocontrast /
    equalize) == ``PIL.ImageOps`` bit-for-bit;
  * enhance ops (color / contrast / brightness / sharpness) ==
    ``PIL.ImageEnhance`` bit-for-bit (the _blend trunc-store transcription);
  * geometric ops (rotate / shear / translate) == PIL's inverse-affine
    bicubic within a few LSB on interiors (same kernel, different summation
    order), fill color exact outside;
  * the policy: config-string parsing, determinism, key variation;
  * RandomErasing: gating, fill modes, box law;
  * end-to-end: the train CLI accepts the flags and stays resume-exact.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from PIL import Image, ImageEnhance, ImageOps

from rajni_tpu.data import randaug as ra
from rajni_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD


def _img(seed: int = 0, h: int = 40, w: int = 56) -> np.ndarray:
    """A random uint8 test image with full-range pixels."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # plant exact extremes so autocontrast/solarize hit their edge cases
    arr[0, 0] = 0
    arr[-1, -1] = 255
    return arr


def _pil(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(arr, "RGB")


def _f32(arr: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(arr, jnp.float32)


# ---------------------------------------------------------------------------
# LUT ops — bit-for-bit vs PIL.ImageOps
# ---------------------------------------------------------------------------


def test_invert_matches_pil():
    arr = _img(1)
    got = np.asarray(ra.invert(_f32(arr)), np.uint8)
    np.testing.assert_array_equal(got, np.asarray(ImageOps.invert(_pil(arr))))


@pytest.mark.parametrize("bits", [1, 2, 3, 4])
def test_posterize_matches_pil(bits):
    arr = _img(2)
    got = np.asarray(ra.posterize(_f32(arr), jnp.int32(bits)), np.uint8)
    np.testing.assert_array_equal(
        got, np.asarray(ImageOps.posterize(_pil(arr), bits))
    )


def test_posterize_zero_bits_is_black():
    """bits=0 (the non-increasing map's magnitude-0 corner) keeps zero
    significant bits — all black, matching ``i & ~(2^8 - 1)``."""
    got = np.asarray(ra.posterize(_f32(_img(3)), jnp.int32(0)), np.uint8)
    assert (got == 0).all()


@pytest.mark.parametrize("threshold", [0, 77, 128, 200, 256])
def test_solarize_matches_pil(threshold):
    arr = _img(4)
    got = np.asarray(ra.solarize(_f32(arr), jnp.int32(threshold)), np.uint8)
    lut = [i if i < threshold else 255 - i for i in range(256)]
    np.testing.assert_array_equal(
        got, np.asarray(_pil(arr).point(lut * 3))
    )


@pytest.mark.parametrize("add", [0, 30, 110])
def test_solarize_add_matches_timm(add):
    """timm's solarize_add LUT: i < 128 → min(255, i + add), else i."""
    arr = _img(5)
    got = np.asarray(ra.solarize_add(_f32(arr), jnp.int32(add)), np.uint8)
    lut = [min(255, i + add) if i < 128 else i for i in range(256)]
    np.testing.assert_array_equal(got, np.asarray(_pil(arr).point(lut * 3)))


def test_autocontrast_matches_pil():
    for seed in range(4):
        arr = _img(seed)
        got = np.asarray(ra.autocontrast(_f32(arr)), np.uint8)
        np.testing.assert_array_equal(
            got, np.asarray(ImageOps.autocontrast(_pil(arr)))
        )


def test_autocontrast_flat_channel_is_identity():
    arr = np.full((16, 16, 3), 137, np.uint8)
    got = np.asarray(ra.autocontrast(_f32(arr)), np.uint8)
    np.testing.assert_array_equal(got, arr)


def test_equalize_matches_pil():
    for seed in range(4):
        arr = _img(seed)
        got = np.asarray(ra.equalize(_f32(arr)), np.uint8)
        np.testing.assert_array_equal(
            got, np.asarray(ImageOps.equalize(_pil(arr)))
        )


def test_equalize_degenerate_images():
    """Flat image (step=0 after dropping the last nonzero bin) passes
    through; a two-value image still matches PIL."""
    flat = np.full((16, 16, 3), 9, np.uint8)
    np.testing.assert_array_equal(
        np.asarray(ra.equalize(_f32(flat)), np.uint8),
        np.asarray(ImageOps.equalize(_pil(flat))),
    )
    two = np.full((16, 16, 3), 9, np.uint8)
    two[:8] = 200
    np.testing.assert_array_equal(
        np.asarray(ra.equalize(_f32(two)), np.uint8),
        np.asarray(ImageOps.equalize(_pil(two))),
    )


# ---------------------------------------------------------------------------
# enhance ops — vs PIL.ImageEnhance
# ---------------------------------------------------------------------------

FACTORS = [0.1, 0.55, 1.0, 1.45, 1.9]


@pytest.mark.parametrize("factor", FACTORS)
def test_brightness_matches_pil(factor):
    arr = _img(6)
    got = np.asarray(ra.brightness(_f32(arr), jnp.float32(factor)), np.uint8)
    want = np.asarray(ImageEnhance.Brightness(_pil(arr)).enhance(factor))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("factor", FACTORS)
def test_color_matches_pil(factor):
    arr = _img(7)
    got = np.asarray(ra.color(_f32(arr), jnp.float32(factor)), np.uint8)
    want = np.asarray(ImageEnhance.Color(_pil(arr)).enhance(factor))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("factor", FACTORS)
def test_contrast_matches_pil(factor):
    arr = _img(8)
    got = np.asarray(ra.contrast(_f32(arr), jnp.float32(factor)), np.uint8)
    want = np.asarray(ImageEnhance.Contrast(_pil(arr)).enhance(factor))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("factor", FACTORS)
def test_sharpness_matches_pil(factor):
    arr = _img(9)
    got = np.asarray(ra.sharpness(_f32(arr), jnp.float32(factor)), np.uint8)
    want = np.asarray(ImageEnhance.Sharpness(_pil(arr)).enhance(factor))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# geometric ops — vs PIL inverse-affine bicubic
# ---------------------------------------------------------------------------


def _pil_affine(arr, mat, fill):
    return np.asarray(
        _pil(arr).transform(
            (arr.shape[1], arr.shape[0]),
            Image.AFFINE,
            mat,
            resample=Image.BICUBIC,
            fillcolor=fill,
        )
    )


def _assert_close_u8(got, want, tol=2, frac=0.001):
    """Interior parity: equal within `tol` LSB everywhere, and within 1 LSB
    on all but `frac` of pixels (different fp summation order than PIL's
    fixed-point path)."""
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= tol, d.max()
    assert (d > 1).mean() <= frac, (d > 1).mean()


@pytest.mark.parametrize("factor", [-0.25, 0.0, 0.17, 0.3])
def test_shear_x_matches_pil(factor):
    arr = _img(10)
    got = np.asarray(
        ra.shear_x(_f32(arr), jnp.float32(factor), ra.DEFAULT_FILL), np.uint8
    )
    want = _pil_affine(arr, (1, factor, 0, 0, 1, 0), ra.DEFAULT_FILL)
    _assert_close_u8(got, want)


@pytest.mark.parametrize("factor", [-0.3, 0.22])
def test_shear_y_matches_pil(factor):
    arr = _img(11)
    got = np.asarray(
        ra.shear_y(_f32(arr), jnp.float32(factor), ra.DEFAULT_FILL), np.uint8
    )
    want = _pil_affine(arr, (1, 0, 0, factor, 1, 0), ra.DEFAULT_FILL)
    _assert_close_u8(got, want)


@pytest.mark.parametrize("pct", [-0.31, 0.12])
def test_translate_matches_pil(pct):
    arr = _img(12)
    got_x = np.asarray(
        ra.translate_x_rel(_f32(arr), jnp.float32(pct), ra.DEFAULT_FILL),
        np.uint8,
    )
    want_x = _pil_affine(
        arr, (1, 0, pct * arr.shape[1], 0, 1, 0), ra.DEFAULT_FILL
    )
    _assert_close_u8(got_x, want_x)
    got_y = np.asarray(
        ra.translate_y_rel(_f32(arr), jnp.float32(pct), ra.DEFAULT_FILL),
        np.uint8,
    )
    want_y = _pil_affine(
        arr, (1, 0, 0, 0, 1, pct * arr.shape[0]), ra.DEFAULT_FILL
    )
    _assert_close_u8(got_y, want_y)


def test_translate_integer_pixels_is_exact_copy():
    """An exact-integer translate must be a pure pixel shift (the cubic
    weights collapse to (0,1,0,0)) with the fill color in the vacated band."""
    arr = _img(13, h=32, w=32)
    got = np.asarray(
        ra.translate_x_rel(
            _f32(arr), jnp.float32(8 / 32.0), ra.DEFAULT_FILL
        ),
        np.uint8,
    )
    np.testing.assert_array_equal(got[:, : 32 - 8], arr[:, 8:])
    assert (got[:, 32 - 8 :] == np.asarray(ra.DEFAULT_FILL, np.uint8)).all()


@pytest.mark.parametrize("degrees", [-30.0, 12.5, 30.0])
def test_rotate_matches_pil(degrees):
    arr = _img(14, h=48, w=48)
    got = np.asarray(
        ra.rotate(_f32(arr), jnp.float32(degrees), ra.DEFAULT_FILL), np.uint8
    )
    want = np.asarray(
        _pil(arr).rotate(
            degrees, resample=Image.BICUBIC, fillcolor=ra.DEFAULT_FILL
        )
    )
    _assert_close_u8(got, want)


# ---------------------------------------------------------------------------
# policy
# ---------------------------------------------------------------------------


def test_parse_rand_augment():
    k = ra.parse_rand_augment("rand-m9-mstd0.5-inc1")
    assert k == dict(
        num_layers=2, magnitude=9.0, mstd=0.5, mmax=10.0, prob=0.5,
        increasing=True,
    )
    k = ra.parse_rand_augment("rand-n3-m7-p0.4-mmax12")
    assert k["num_layers"] == 3 and k["magnitude"] == 7.0
    assert k["prob"] == 0.4 and k["mmax"] == 12.0 and not k["increasing"]
    with pytest.raises(ValueError, match="start with 'rand'"):
        ra.parse_rand_augment("augmix-m3")
    with pytest.raises(ValueError, match="unsupported"):
        ra.parse_rand_augment("rand-m9-w0")


def test_rand_augment_apply_deterministic_and_varied():
    img = _f32(_img(15, h=32, w=32))
    key = jax.random.key(3)
    kwargs = ra.parse_rand_augment("rand-m9-mstd0.5-inc1")
    a = np.asarray(ra.rand_augment_apply(img, key, **kwargs))
    b = np.asarray(ra.rand_augment_apply(img, key, **kwargs))
    np.testing.assert_array_equal(a, b)
    # in the uint8 domain
    assert a.min() >= 0.0 and a.max() <= 255.0
    # different keys produce different augmentations (16 keys, 15 ops —
    # at least one must differ from the first)
    outs = [
        np.asarray(
            ra.rand_augment_apply(img, jax.random.key(100 + i), **kwargs)
        )
        for i in range(8)
    ]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_rand_augment_apply_vmap_jit():
    """The policy compiles under vmap+jit (the train-path usage: lax.switch
    over all 15 branches per layer)."""
    imgs = jnp.stack([_f32(_img(s, h=24, w=24)) for s in range(3)])
    keys = jax.random.split(jax.random.key(0), 3)
    kwargs = ra.parse_rand_augment("rand-m9-mstd0.5-inc1")
    fn = jax.jit(
        jax.vmap(lambda x, k: ra.rand_augment_apply(x, k, **kwargs))
    )
    out = np.asarray(fn(imgs, keys))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_rand_augment_prob_zero_is_identity():
    img = _f32(_img(16, h=24, w=24))
    out = ra.rand_augment_apply(
        img, jax.random.key(0), num_layers=2, magnitude=9.0, mstd=0.0,
        prob=0.0, increasing=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


# ---------------------------------------------------------------------------
# RandomErasing
# ---------------------------------------------------------------------------


def _norm_img(seed: int = 0, h: int = 32, w: int = 32) -> jnp.ndarray:
    arr = _img(seed, h, w).astype(np.float32)
    return jnp.asarray(
        (arr / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD),
        jnp.float32,
    )


def test_random_erasing_prob_zero_identity():
    x = _norm_img(20)
    out = ra.random_erasing(x, jax.random.key(0), prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_random_erasing_const_mode_zeros_box():
    x = _norm_img(21)
    out = np.asarray(
        ra.random_erasing(x, jax.random.key(1), prob=1.0, mode="const")
    )
    base = np.asarray(x)
    changed = (out != base).any(-1)
    assert changed.any()
    # erased pixels are exactly zero; untouched pixels are exactly original
    assert (out[changed] == 0.0).all()
    np.testing.assert_array_equal(out[~changed], base[~changed])
    # the erased region is one solid rectangle within the box-law area range
    rows = np.where(changed.any(1))[0]
    cols = np.where(changed.any(0))[0]
    assert changed[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1].all()
    area_frac = changed.mean()
    assert 0.0 < area_frac <= 1.0 / 3.0 + 0.05


def test_random_erasing_rand_mode_single_value():
    x = _norm_img(22)
    out = np.asarray(
        ra.random_erasing(x, jax.random.key(2), prob=1.0, mode="rand")
    )
    changed = (out != np.asarray(x)).any(-1)
    assert changed.any()
    vals = out[changed]
    assert np.unique(vals).size == 1  # one N(0,1) scalar per erase


def test_random_erasing_pixel_mode_noise():
    x = _norm_img(23)
    out = np.asarray(
        ra.random_erasing(x, jax.random.key(3), prob=1.0, mode="pixel")
    )
    changed = (out != np.asarray(x)).any(-1)
    assert changed.any()
    vals = out[changed]
    # per-pixel standard normal fill: many distinct values
    assert np.unique(vals).size > changed.sum() // 2


def test_random_erasing_count():
    x = _norm_img(24, h=48, w=48)
    out = np.asarray(
        ra.random_erasing(
            x, jax.random.key(4), prob=1.0, mode="const", count=3
        )
    )
    changed = (out != np.asarray(x)).any(-1)
    # at most 3 rectangles, each ≤ (1/3)/3 of the area (+rounding)
    assert 0.0 < changed.mean() <= 1.0 / 3.0 + 0.05
    assert (out[changed] == 0.0).all()


def test_random_erasing_bad_mode():
    with pytest.raises(ValueError, match="mode"):
        ra.random_erasing(_norm_img(25), jax.random.key(0), mode="wat")


# ---------------------------------------------------------------------------
# pipeline integration
# ---------------------------------------------------------------------------


def test_augment_on_device_with_policy():
    """augment_on_device threads RandAugment + erasing: deterministic under
    the same key, shaped/normalized like the plain path, and actually
    different from the plain path."""
    from rajni_tpu.data.augment import augment_on_device

    rng = np.random.default_rng(0)
    canvases = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    sizes = np.tile(np.array([64, 64], np.int32), (4, 1))
    key = jax.random.key(7)
    kw = dict(crop=32, dtype=jnp.float32)
    plain = np.asarray(
        augment_on_device(canvases, sizes, key, **kw)
    )
    aug1 = np.asarray(
        augment_on_device(
            canvases, sizes, key, rand_augment="rand-m9-mstd0.5-inc1",
            erase=(0.25, "pixel", 1), **kw
        )
    )
    aug2 = np.asarray(
        augment_on_device(
            canvases, sizes, key, rand_augment="rand-m9-mstd0.5-inc1",
            erase=(0.25, "pixel", 1), **kw
        )
    )
    np.testing.assert_array_equal(aug1, aug2)
    assert aug1.shape == plain.shape == (4, 32, 32, 3)
    assert not np.array_equal(aug1, plain)
    # the same box stream is consumed first, so with prob-gated ops some
    # images may pass through — but not all four with both stages enabled
    assert np.isfinite(aug1).all()


def test_train_cli_rejects_policy_without_augment(tmp_path):
    from rajni_tpu.train import main

    with pytest.raises(ValueError, match="require --augment"):
        main(["--synthetic", "--model", "vit_tiny_patch16_64",
              "--steps", "1", "--rand_augment", "rand-m9",
              "--output", str(tmp_path / "o.msgpack")])
    with pytest.raises(ValueError, match="require --augment"):
        main(["--synthetic", "--model", "vit_tiny_patch16_64",
              "--steps", "1", "--reprob", "0.25",
              "--output", str(tmp_path / "o.msgpack")])


def test_train_cli_rand_augment_resume_exact(tmp_path):
    """The full DeiT-recipe pipeline (RRC + flip + RandAugment + erasing)
    stays resume-exact: 2 steps + resume-to-3 == uninterrupted 3 steps."""
    import json as _json

    from PIL import Image as _Image

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "train"
    rng = np.random.default_rng(5)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
            _Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "2",
            "--augment", "--canvas", "96",
            "--rand_augment", "rand-m9-mstd0.5-inc1",
            "--reprob", "0.25", "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "3", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "2", "--output", str(out_b),
                 "--save_state_every", "2", "--state_path", str(st)])
    main(base + ["--steps", "3", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
