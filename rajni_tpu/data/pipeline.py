"""ImageNet-val data pipeline: ImageFolder discovery + reference-exact
preprocessing + batched loading with background prefetch.

Replaces the reference's torchvision stack (`/root/reference/rajni/run.py:62-82`):

  * ``datasets.ImageFolder`` → :class:`ImageFolder`: class subdirectories in
    sorted order define label indices; files sorted within each class —
    torchvision's contract, reproduced so label indices agree.
  * ``transforms.Compose([Resize(256, interpolation=3), CenterCrop(224),
    ToTensor(), Normalize(ImageNet)])`` (run.py:62-70) → :func:`preprocess`:
    PIL bicubic resize of the *shorter side* to 256, center crop 224, scale to
    [0,1], normalize with mean [0.485, 0.456, 0.406] / std [0.229, 0.224,
    0.225]. Output is NHWC float32 (TPU-canonical layout) rather than NCHW.
  * ``DataLoader(batch_size, shuffle=False, num_workers, drop_last=False)``
    (run.py:75-82) → :class:`DataLoader`: thread-pool decode (processes buy
    nothing for PIL decode under the GIL-released JPEG path) with a bounded
    prefetch queue so decode overlaps TPU compute.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Iterator, Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
)


def find_classes(root: str) -> tuple[list[str], dict[str, int]]:
    """Sorted class-subdirectory discovery (torchvision ImageFolder contract)."""
    classes = sorted(
        e.name for e in os.scandir(root) if e.is_dir()
    )
    if not classes:
        raise FileNotFoundError(f"no class directories found in {root!r}")
    return classes, {c: i for i, c in enumerate(classes)}


class ImageFolder:
    """``root/class_x/*.jpg``-style dataset (reference run.py:73).

    Preprocessing runs through the native C++ library when it builds on this
    machine (:mod:`rajni_tpu.data.native` — GIL-free, so the decode thread
    pool scales), falling back to the pure-PIL :func:`preprocess` otherwise.

    ``output`` selects how much work stays on the host
    (:mod:`rajni_tpu.data.device` consumes the other two tiers):
      * ``"float32"`` (default): fully host-preprocessed normalized NHWC —
        the reference protocol.
      * ``"uint8"``: host geometry (resize + crop), **uint8** crop out; the
        device normalizes (4× smaller H2D).
      * ``"canvas"``: decode-only — each image top-left on a fixed
        ``canvas×canvas`` uint8 canvas plus its true ``(h, w)``; resize,
        crop, and normalize all run on the TPU
        (:func:`rajni_tpu.data.device.preprocess_on_device`). Images larger
        than the canvas are PIL-downscaled to fit first (geometry preserved
        within the resample's tolerance).
    """

    def __init__(
        self,
        root: str,
        img_size: int = 224,
        resize: int | None = None,
        use_native: bool = True,
        output: str = "float32",
        canvas: int = 512,
    ):
        if output not in ("float32", "uint8", "canvas"):
            raise ValueError(f"unknown output mode {output!r}")
        self.root = root
        self.img_size = img_size
        self.resize = _default_resize(img_size, resize)
        self.use_native = use_native
        self.output = output
        self.canvas = canvas
        self.classes, self.class_to_idx = find_classes(root)
        self.samples: list[tuple[str, int]] = []
        for cls in self.classes:
            d = os.path.join(root, cls)
            files = sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.lower().endswith(IMG_EXTENSIONS)
            )
            self.samples += [(f, self.class_to_idx[cls]) for f in files]

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, index: int):
        path, label = self.samples[index]
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB")
            if self.output == "uint8":
                return preprocess_u8(im, self.img_size, self.resize), label
            if self.output == "canvas":
                return decode_to_canvas(im, self.canvas), label
            if self.use_native:
                from . import native

                if native.available():
                    return (
                        native.preprocess_native(
                            np.asarray(im), self.img_size, self.resize,
                            IMAGENET_MEAN, IMAGENET_STD,
                        ),
                        label,
                    )
            arr = preprocess(im, self.img_size, self.resize)
        return arr, label


def _default_resize(img_size: int, resize: int | None) -> int:
    """Shorter-side target: 256 for 224 crops (reference run.py:64), scaled
    proportionally for other resolutions (384 -> 438) so the crop never
    exceeds the resized image."""
    return int(img_size * 256 / 224) if resize is None else resize


def resize_crop_geometry(
    w: int, h: int, img_size: int, resize: int
) -> tuple[int, int, int, int]:
    """The parity-critical torchvision geometry → ``(nw, nh, left, top)``.

    ONE implementation for all three pipeline tiers (PIL, uint8, native
    C++ — the comments had already drifted between the old copies):

      * the scaled long side uses int() TRUNCATION
        (torchvision ``_compute_resized_output_size``:
        ``int(size * long / short)``) — round() would resample ~half of
        non-square ImageNet-val images to a different geometry;
      * CenterCrop offsets use Python ``round()`` = round-half-EVEN
        (banker's rounding), torchvision's exact quirk: (257-224)/2=16.5
        crops at 16, not 17.
    """
    if w <= h:
        nw, nh = resize, max(1, int(h * resize / w))
    else:
        nh, nw = resize, max(1, int(w * resize / h))
    left = int(round((nw - img_size) / 2.0))
    top = int(round((nh - img_size) / 2.0))
    return nw, nh, left, top


def preprocess(im, img_size: int = 224, resize: int | None = None) -> np.ndarray:
    """Resize-shorter-side(bicubic) → center-crop → [0,1] → normalize.

    Bit-matches the reference transform stack (run.py:62-70): torchvision's
    ``Resize(256, interpolation=3)`` resizes the *shorter* edge to 256 with
    PIL bicubic; ``CenterCrop`` offsets use round-half-even (banker's)
    exactly like torchvision (:func:`resize_crop_geometry`). (The native
    C++ tier reproduces this geometry but resamples in double precision —
    within ±1/255 of PIL's fixed-point path, not bit-equal; see
    :mod:`rajni_tpu.data.native`.)

    Returns NHWC float32 ``[img_size, img_size, 3]``.
    """
    from PIL import Image

    resize = _default_resize(img_size, resize)
    nw, nh, left, top = resize_crop_geometry(*im.size, img_size, resize)
    im = im.resize((nw, nh), Image.BICUBIC)
    im = im.crop((left, top, left + img_size, top + img_size))

    arr = np.asarray(im, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_u8(im, img_size: int = 224, resize: int | None = None) -> np.ndarray:
    """Host geometry only: :func:`preprocess` without the normalize — returns
    the uint8 ``[img_size, img_size, 3]`` center crop for uint8 H2D transfer
    with on-device normalization (:func:`rajni_tpu.data.device.normalize_images`).
    Bit-exact composition: ``normalize_images(preprocess_u8(im)) ==
    preprocess(im)``."""
    from PIL import Image

    resize = _default_resize(img_size, resize)
    nw, nh, left, top = resize_crop_geometry(*im.size, img_size, resize)
    im = im.resize((nw, nh), Image.BICUBIC)
    im = im.crop((left, top, left + img_size, top + img_size))
    return np.asarray(im, np.uint8)


def decode_to_canvas(im, canvas: int = 512) -> tuple[np.ndarray, np.ndarray]:
    """Decode-only host step for the full on-device path: the image placed
    top-left on a ``[canvas, canvas, 3]`` uint8 buffer plus its true
    ``(h, w)`` int32.

    Images that FIT the canvas go through exactly one (on-device) resample
    — the PIL-exact path the parity tests pin. Images LARGER than the
    canvas are PIL-bicubic-downscaled to fit first, making the pipeline a
    double resample with an intermediate uint8 rounding: close (both
    passes are the same antialiased bicubic) but no longer within the
    ±1/255-per-pass bound of the host protocol. For strict reference-exact
    accuracy on datasets with large images, raise ``canvas`` to cover them
    or use ``--preprocess device`` (host geometry, bit-exact) instead."""
    from PIL import Image

    w, h = im.size
    if max(h, w) > canvas:
        f = canvas / max(h, w)
        w, h = max(1, int(w * f)), max(1, int(h * f))
        im = im.resize((w, h), Image.BICUBIC)
    buf = np.zeros((canvas, canvas, 3), np.uint8)
    buf[:h, :w] = np.asarray(im, np.uint8)
    return buf, np.array([h, w], np.int32)


class DataLoader:
    """Batched, re-iterable loader with threaded decode (reference run.py:75-82).

    Yields ``(images [B, H, W, 3] float32, labels [B] int64)`` numpy batches in
    dataset order (``shuffle=False`` — eval protocol), last batch partial
    (``drop_last=False``).
    """

    def __init__(
        self,
        dataset: ImageFolder,
        batch_size: int = 256,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)

    def _assemble(self, out):
        labels = np.array([o[1] for o in out], np.int64)
        if isinstance(out[0][0], tuple):  # canvas mode: (canvas, (h, w))
            images = (
                np.stack([o[0][0] for o in out]),
                np.stack([o[0][1] for o in out]),
            )
        else:
            images = np.stack([o[0] for o in out])
        return images, labels

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        batches = [
            range(s, min(s + self.batch_size, n))
            for s in range(0, n, self.batch_size)
        ]
        if self.num_workers <= 1:
            for b in batches:
                yield self._assemble([self.dataset.load(i) for i in b])
            return
        # Bounded look-ahead, PER-IMAGE parallelism: submit every image of
        # the next `prefetch+1` batches as its own pool task. Per-batch
        # granularity (one thread decoding a whole batch serially) caps
        # throughput at single-thread decode speed regardless of
        # num_workers; per-image tasks keep all workers busy — decode and
        # the native resampler both release the GIL. Futures preserve
        # submission order, so batches assemble in dataset order.
        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = iter(batches)

            def submit(b):
                return [pool.submit(self.dataset.load, i) for i in b]

            for _ in range(self.prefetch + 1):
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
            while pending:
                futs = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
                yield self._assemble([f.result() for f in futs])


class SyntheticLoader:
    """Deterministic in-memory loader for benchmarks and tests.

    Stands in for ImageNet-val when no dataset is mounted (this framework's
    throughput is weight- and data-independent: shapes are static).
    """

    def __init__(
        self,
        num_batches: int = 8,
        batch_size: int = 256,
        img_size: int = 224,
        num_classes: int = 1000,
        seed: int = 0,
    ):
        rng = np.random.default_rng(seed)
        # One buffer reused across batches: bench realism without hostRAM blowup.
        self._images = rng.standard_normal(
            (batch_size, img_size, img_size, 3)
        ).astype(np.float32)
        self._labels = rng.integers(0, num_classes, batch_size).astype(np.int64)
        self.num_batches = num_batches
        self.batch_size = batch_size

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self):
        for _ in range(self.num_batches):
            yield self._images, self._labels
