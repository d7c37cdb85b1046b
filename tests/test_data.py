"""Data pipeline: ImageFolder discovery contract, preprocessing geometry &
normalization, loader batching (reference run.py:62-82 equivalents)."""

import numpy as np
import pytest
from PIL import Image

from rajni_tpu.data.pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    DataLoader,
    ImageFolder,
    SyntheticLoader,
    preprocess,
)


@pytest.fixture
def folder(tmp_path):
    rng = np.random.default_rng(0)
    # class dirs deliberately created unsorted; discovery must sort
    for cls, n in [("n02", 3), ("n01", 2), ("n03", 1)]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 255, (300, 400, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(tmp_path)


def test_imagefolder_sorted_classes(folder):
    ds = ImageFolder(folder)
    assert ds.classes == ["n01", "n02", "n03"]
    assert ds.class_to_idx == {"n01": 0, "n02": 1, "n03": 2}
    assert len(ds) == 6
    labels = [lbl for _, lbl in ds.samples]
    assert labels == [0, 0, 1, 1, 1, 2]


def test_load_shape_and_range(folder):
    ds = ImageFolder(folder)
    img, label = ds.load(0)
    assert img.shape == (224, 224, 3)
    assert img.dtype == np.float32
    # normalized: inverse transform must land in [0, 1]
    raw = img * IMAGENET_STD + IMAGENET_MEAN
    assert raw.min() >= -1e-5 and raw.max() <= 1.0 + 1e-5


def test_preprocess_resizes_shorter_side():
    # 400x300 (WxH): shorter side H=300 → 256, W → round(400*256/300)=341
    im = Image.new("RGB", (400, 300), (128, 64, 32))
    out = preprocess(im)
    assert out.shape == (224, 224, 3)
    # solid color survives resize/crop: all pixels equal the normalized color
    want = (np.array([128, 64, 32], np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[0, 0], want, atol=1e-2)
    np.testing.assert_allclose(out[-1, -1], want, atol=1e-2)


def test_preprocess_384():
    im = Image.new("RGB", (500, 400))
    out = preprocess(im, img_size=384, resize=438)
    assert out.shape == (384, 384, 3)


def test_dataloader_batching(folder):
    ds = ImageFolder(folder)
    loader = DataLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0][0].shape == (4, 224, 224, 3)
    assert batches[1][0].shape == (2, 224, 224, 3)  # drop_last=False
    assert batches[0][1].tolist() == [0, 0, 1, 1]
    # re-iterable (warmup contract, reference eval.py:19-26)
    again = list(loader)
    assert len(again) == 2
    np.testing.assert_array_equal(again[0][1], batches[0][1])


def test_synthetic_loader():
    loader = SyntheticLoader(num_batches=3, batch_size=4, img_size=32)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    assert batches[0][0].shape == (4, 32, 32, 3)
    assert batches[0][1].shape == (4,)


def test_resize_long_side_truncates_like_torchvision(rng):
    """torchvision's Resize computes the scaled long side with int()
    truncation (`_compute_resized_output_size`), not rounding: a 375x499
    image must land on 256x340 (int(256*499/375)=340, round would give 341).

    Geometry-sensitive: the expected tensor is built by explicitly resizing
    to (256, 340) and cropping, so a regression to round() (340 -> 341)
    changes the resampled pixels and fails the exact comparison."""
    from PIL import Image

    from rajni_tpu.data.pipeline import (
        IMAGENET_MEAN, IMAGENET_STD, preprocess)

    assert int(256 * 499 / 375) == 340 and round(256 * 499 / 375) == 341
    arr = rng.integers(0, 256, (499, 375, 3), dtype=np.uint8)
    im = Image.fromarray(arr)  # w=375, h=499

    got = preprocess(im, img_size=224, resize=256)

    want = im.resize((256, 340), Image.BICUBIC)  # int()-truncated long side
    left = int(round((256 - 224) / 2.0))
    top = int(round((340 - 224) / 2.0))
    want = want.crop((left, top, left + 224, top + 224))
    want = (np.asarray(want, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_array_equal(got, want)


def test_dataloader_parallel_matches_serial(folder):
    """Per-image pool tasks must preserve dataset order exactly: the
    parallel loader's batches are byte-identical to the serial path."""
    ds = ImageFolder(folder)
    serial = list(DataLoader(ds, batch_size=4, num_workers=1))
    para = list(DataLoader(ds, batch_size=4, num_workers=4))
    assert len(serial) == len(para)
    for (si, sl), (pi, pl) in zip(serial, para):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sl, pl)
