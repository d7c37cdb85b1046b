"""In-graph training augmentation (rajni_tpu/data/augment.py).

The reference is inference-only, so augmentation is TPU-native surface
beyond parity: RandomResizedCrop + horizontal flip with torchvision box
semantics, computed as per-image bicubic weight matmuls over decode-only
uint8 canvases. These tests pin: box-sampling bounds (incl. the clamped
fallback), PIL parity of the full-image resize path, exactness of the
flip-as-weight-permutation, canvas-padding isolation, key determinism,
label smoothing, and end-to-end train-CLI resume exactness under
--augment.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rajni_tpu.data.augment import (
    DEFAULT_RATIO,
    DEFAULT_SCALE,
    _rrc_box,
    augment_on_device,
)
from rajni_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

FULL = dict(scale=(1.0, 1.0), ratio=(1.0, 1.0))  # deterministic square box


def _canvas(img: np.ndarray, side: int, fill: int = 0):
    h, w = img.shape[:2]
    buf = np.full((side, side, 3), fill, np.uint8)
    buf[:h, :w] = img
    return buf, np.array([h, w], np.int32)


def _denorm255(x: np.ndarray) -> np.ndarray:
    return (x * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)) * 255.0


@pytest.mark.parametrize("h,w", [(90, 120), (64, 64), (30, 400), (400, 30)])
def test_rrc_box_bounds(h, w):
    """Sampled boxes always lie inside the image — including the extreme
    aspect ratios that exhaust all 10 attempts and take torchvision's
    clamped center-crop fallback."""
    keys = jax.random.split(jax.random.key(0), 256)
    top, left, ch, cw = jax.vmap(
        lambda k: _rrc_box(
            k, jnp.int32(h), jnp.int32(w), DEFAULT_SCALE, DEFAULT_RATIO
        )
    )(keys)
    top, left, ch, cw = (np.asarray(v) for v in (top, left, ch, cw))
    assert (ch >= 1).all() and (cw >= 1).all()
    assert (top >= 0).all() and (left >= 0).all()
    assert (top + ch <= h).all(), (top + ch).max()
    assert (left + cw <= w).all(), (left + cw).max()


def test_rrc_box_fallback_is_clamped_center_crop():
    """scale=(1,1) on an extreme strip makes every attempt invalid
    (ch = sqrt(area/aspect) ≥ 95 > 30), forcing torchvision's fallback:
    whole-strip crop with the aspect clamped into `ratio`, centered."""
    top, left, ch, cw = (
        int(v)
        for v in _rrc_box(
            jax.random.key(0), jnp.int32(30), jnp.int32(400),
            (1.0, 1.0), DEFAULT_RATIO,
        )
    )
    assert (ch, cw) == (30, 40)  # h kept, w = round(30 * 4/3)
    assert top == 0 and left == (400 - 40) // 2
    # portrait orientation mirrors it
    top, left, ch, cw = (
        int(v)
        for v in _rrc_box(
            jax.random.key(0), jnp.int32(400), jnp.int32(30),
            (1.0, 1.0), DEFAULT_RATIO,
        )
    )
    assert (ch, cw) == (40, 30)  # w kept, h = round(30 / (3/4))
    assert left == 0 and top == (400 - 40) // 2


def test_full_image_resize_matches_pil():
    """scale=(1,1), ratio=(1,1) on a square image selects the whole image
    deterministically; the resample must then match PIL bicubic (the same
    per-pass 8-bit arithmetic the eval device pipeline pins)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    cnv, size = _canvas(img, 128)

    got = np.asarray(
        augment_on_device(
            jnp.asarray(cnv[None]),
            jnp.asarray(size[None]),
            jax.random.key(3),
            crop=64,
            hflip=False,
            dtype=jnp.float32,
            **FULL,
        )
    )[0]
    want = np.asarray(
        Image.fromarray(img, "RGB").resize((64, 64), Image.BICUBIC),
        np.float32,
    )
    err = np.abs(_denorm255(got) - want)
    assert err.max() <= 2.5 + 1e-4, err.max()
    assert (err <= 1.0 + 1e-4).mean() > 0.99


def test_flip_is_exact_column_reversal():
    """The flip is implemented as a permutation of the horizontal weight
    rows — flipped output must equal the unflipped output reversed along
    width EXACTLY (same multiplies, same order), not just approximately."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
    cnv, size = _canvas(img, 96)

    def flip_draw(batch_key):
        k = jax.random.split(batch_key, 1)[0]
        _, k_flip = jax.random.split(k)
        return bool(jax.random.bernoulli(k_flip))

    keys = [jax.random.key(i) for i in range(32)]
    k_true = next(k for k in keys if flip_draw(k))
    k_false = next(k for k in keys if not flip_draw(k))

    def run(k):
        return np.asarray(
            augment_on_device(
                jnp.asarray(cnv[None]),
                jnp.asarray(size[None]),
                k,
                crop=32,
                hflip=True,
                dtype=jnp.float32,
                **FULL,  # box is key-independent: full image
            )
        )[0]

    np.testing.assert_array_equal(run(k_true), run(k_false)[:, ::-1, :])


def test_canvas_padding_is_invisible():
    """Bytes outside each image's true (h, w) extent must not leak into any
    crop: the resample weights clamp to the sampled box, which lies inside
    the image."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    cnv0, size = _canvas(img, 128, fill=0)
    cnv1, _ = _canvas(img, 128, fill=255)

    key = jax.random.key(7)
    out0, out1 = (
        np.asarray(
            augment_on_device(
                jnp.asarray(c[None]), jnp.asarray(size[None]), key,
                crop=48, dtype=jnp.float32,
            )
        )
        for c in (cnv0, cnv1)
    )
    np.testing.assert_array_equal(out0, out1)


def test_key_determinism_and_variation():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (4, 70, 90, 3), dtype=np.uint8)
    cnv = np.stack([_canvas(i, 128)[0] for i in imgs])
    sizes = np.stack([_canvas(i, 128)[1] for i in imgs])

    root = jax.random.key(11)

    def run(k):
        return np.asarray(
            augment_on_device(
                jnp.asarray(cnv), jnp.asarray(sizes), k,
                crop=32, dtype=jnp.float32,
            )
        )

    a = run(jax.random.fold_in(root, 1))
    b = run(jax.random.fold_in(root, 1))
    c = run(jax.random.fold_in(root, 2))
    np.testing.assert_array_equal(a, b)  # same (seed, step) → same stream
    assert np.abs(a - c).max() > 0  # different step → different crops
    # images in a batch get independent crops
    assert np.abs(a[0] - a[1]).max() > 0


def test_label_smoothing_matches_manual():
    from rajni_tpu.train import cross_entropy

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((6, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, 6).astype(np.int32))
    s = 0.1

    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    onehot = np.eye(5)[np.asarray(labels)]
    target = (1 - s) * onehot + s / 5.0
    want = float((-(target * logp).sum(-1)).mean())

    got = float(cross_entropy(logits, labels, label_smoothing=s))
    assert abs(got - want) < 1e-6
    # s=0 is the plain CE
    base = float(cross_entropy(logits, labels))
    assert abs(base - float(cross_entropy(logits, labels, 0.0))) < 1e-7
    assert abs(got - base) > 1e-4  # smoothing actually changes the loss


def test_train_cli_augment_rejects_synthetic(tmp_path):
    from rajni_tpu.train import main

    with pytest.raises(ValueError, match="augment"):
        main(["--synthetic", "--model", "vit_tiny_patch16_64",
              "--steps", "1", "--augment",
              "--output", str(tmp_path / "o.msgpack")])
    with pytest.raises(ValueError, match="label_smoothing"):
        main(["--synthetic", "--model", "vit_tiny_patch16_64",
              "--steps", "1", "--label_smoothing", "1.5",
              "--output", str(tmp_path / "o.msgpack")])


def test_train_cli_augment_resume_exact(tmp_path):
    """--augment composes with crash-safe resume: the augmentation stream is
    keyed on (--seed, step), so 2 steps + resume-to-4 must reproduce the
    uninterrupted 4-step run bit-for-bit."""
    import json as _json

    from PIL import Image

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "train"
    rng = np.random.default_rng(5)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "2",
            "--augment", "--canvas", "96", "--label_smoothing", "0.1",
            "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "4", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "2", "--output", str(out_b),
                 "--save_state_every", "2", "--state_path", str(st)])
    main(base + ["--steps", "4", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_cli_augment_data_parallel(tmp_path, capsys):
    """--augment composes with --data_parallel: the uint8 canvases are
    sharded over the data axis BEFORE the in-graph crop/resize (one global
    SPMD program — no single-device staging of the big canvas buffers),
    and the augmented stream is the same math as the unsharded run, so the
    loss trajectory matches the plain augment run to fp tolerance."""
    import json as _json
    import re

    from PIL import Image

    from rajni_tpu.train import main

    data = tmp_path / "train"
    rng = np.random.default_rng(7)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "8", "--steps", "2",
            "--augment", "--canvas", "96", "--log_every", "1",
            "--lr", "1e-3"]

    def losses(text):
        return [float(m) for m in re.findall(r"loss (\d+\.\d+)", text)]

    main(base + ["--output", str(tmp_path / "plain.msgpack")])
    plain = losses(capsys.readouterr().out)

    main(base + ["--output", str(tmp_path / "dp.msgpack"),
                 "--data_parallel"])
    printed = capsys.readouterr().out
    assert "DP training" in printed
    dp = losses(printed)

    assert len(plain) == len(dp) == 2
    for a, b in zip(plain, dp):
        assert abs(a - b) < 5e-3 * max(1.0, abs(a)), (plain, dp)


def test_train_cli_repeated_aug_resume_exact(tmp_path, capsys):
    """--repeated_aug (DeiT RASampler, VERDICT r3 #8): each step draws
    ceil(B/N) unique images repeated N× consecutively, copies diverging
    only through the per-row augment keys. The stream consumes
    ceil(B/N) samples per step and --resume replays it bit-exactly
    (incl. across the shuffled pass boundary)."""
    import json as _json

    from PIL import Image

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "train"
    rng = np.random.default_rng(9)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "6",
            "--augment", "--canvas", "96", "--repeated_aug", "3",
            "--shuffle", "--seed", "1", "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "4", "--output", str(out_a)])
    printed = capsys.readouterr().out
    # 6 images / 2 unique per step = 3 batches per pass; step 4 crosses
    # the pass boundary, and the banner reports the unique-per-step count
    assert "3x repeated augmentation (2 unique/step)" in printed

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "2", "--output", str(out_b),
                 "--save_state_every", "2", "--state_path", str(st)])
    main(base + ["--steps", "4", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_cli_repeated_aug_validation(tmp_path):
    from rajni_tpu.train import main

    with pytest.raises(ValueError, match="repeated_aug requires"):
        main(["--model", "vit_tiny_patch16_64", "--data_path",
              str(tmp_path), "--steps", "1", "--repeated_aug", "3",
              "--output", str(tmp_path / "o.msgpack")])
    with pytest.raises(ValueError, match="repeated_aug must"):
        main(["--synthetic", "--model", "vit_tiny_patch16_64",
              "--steps", "1", "--repeated_aug", "1",
              "--output", str(tmp_path / "o.msgpack")])
