"""Evaluation harness with accounting-exact parity to the reference.

Reimplements ``evaluate_model`` (`/root/reference/rajni/eval.py:6-75`) for
JAX/TPU. The reference's CUDA-specific machinery maps as follows:

  * ``torch.cuda.synchronize()`` fencing (eval.py:29, 52, 58)
      → :func:`rajni_tpu.utils.timing.fence` on device results
        (``block_until_ready`` plus a data-dependent scalar pull — see that
        module for why ``block_until_ready`` alone is not a reliable fence on
        every TPU runtime).
  * ``.to(device)`` H2D copies *excluded* from the timed region
    (eval.py:48-49 precede the timer at eval.py:53)
      → ``jax.device_put(...)`` + block, before the timer starts.
  * timed region = forward only (eval.py:53-59).

Accounting contract (must match exactly — BASELINE.md):
  * warmup: ``warmup`` batches, restarting the iterator on ``StopIteration``
    (eval.py:19-26);
  * ``acc = 100 * correct / max(total, 1)`` (eval.py:73);
  * ``throughput = total_images / max(total_time, 1e-6)`` img/s (eval.py:74);
  * tqdm progress bar with live ``acc`` / ``imgs_per_s`` postfix
    (eval.py:37-42, 67-71).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

import jax
import numpy as np

from .utils.timing import fence

try:  # tqdm is a soft dependency (reference eval.py:3 hard-requires it)
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    tqdm = None


def _host_batch(images):
    """Materialize a host batch: a single array, or (for the on-device
    preprocessing canvas mode, :mod:`rajni_tpu.data.device`) a tuple of
    arrays — ``(canvas_u8, sizes)`` — treated as one pytree throughout."""
    if isinstance(images, tuple):
        return tuple(np.asarray(e) for e in images)
    return np.asarray(images)


def _batch_dim(images) -> int:
    return (images[0] if isinstance(images, tuple) else images).shape[0]


_place_warned = False


def _place(x, placement):
    """device_put with a graceful fallback for batches a sharding cannot
    split: the model fn pads and places those itself
    (parallel.mesh._pad_batch). With :func:`_batch_divisor`-aware padding in
    the warmup/prefetch paths this fallback should never trigger — it would
    move the H2D transfer inside the timed region, so it warns (once)."""
    x = _host_batch(x)
    try:
        return jax.device_put(x, placement)
    except ValueError:
        global _place_warned
        if not _place_warned:
            _place_warned = True
            print("WARNING: batch could not be placed with the model's "
                  "input sharding — the H2D transfer now happens INSIDE "
                  "the timed region; throughput is not comparable to the "
                  "reference protocol")
        return x


def _batch_divisor(placement) -> int:
    """Number of shards ``placement`` splits the batch (leading) dim into.

    1 for a plain device; for a ``NamedSharding`` the product of the mesh
    axes mapped to dim 0. Batches are padded to a multiple of this before
    ``device_put`` so the DP scatter always succeeds in the untimed region
    (ADVICE r1: the ``_place`` fallback silently retimed the H2D)."""
    mesh = getattr(placement, "mesh", None)
    spec = getattr(placement, "spec", None)
    if mesh is None or spec is None or len(spec) == 0 or spec[0] is None:
        return 1
    axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    div = 1
    for a in axes:
        div *= mesh.shape[a]
    return div


def _round_up(n: int, div: int) -> int:
    """The compiled batch size: ``n`` rounded up to a ``div`` multiple —
    ONE rule shared by the warmup and timed loops, which must compile the
    same XLA program (a mismatch re-introduces the ~30 s compile inside
    the timed region that the padding exists to prevent)."""
    return -(-n // div) * div


def _pad_to(images: np.ndarray, b: int) -> np.ndarray:
    """Zero-pad a partial batch up to ``b`` rows.

    Every distinct batch shape is a separate XLA compilation; without
    padding, the dataset's final partial batch (``drop_last=False``,
    reference run.py:82) would trigger a fresh ~30 s compile *inside* the
    timed region. The padded rows' logits are discarded and only real
    labels are counted, so accuracy/throughput accounting is unchanged.
    """
    if isinstance(images, tuple):
        return tuple(_pad_to(e, b) for e in images)
    pad = b - images.shape[0]
    if pad <= 0:
        return images
    return np.concatenate(
        [images, np.zeros((pad,) + images.shape[1:], images.dtype)], axis=0
    )


def _prefetch_to_device(iterator, device, depth: int = 2):
    """Stage host batches onto the device ``depth`` ahead of consumption.

    ``jax.device_put`` is asynchronous, so issuing the next batches' H2D
    copies before the current forward finishes overlaps transfer with
    compute (the double-buffered prefetch of SURVEY.md §7 step 3). The
    reference's accounting is unaffected: H2D stays outside the timed
    region either way (eval.py:48-53).

    Yields ``(images_device, labels_host)`` with partial batches padded to
    the first batch's size (see :func:`_pad_to`); ``labels`` stay unpadded.
    """
    import collections

    buf = collections.deque()
    div = _batch_divisor(device)
    full_b = None
    for images, labels in iterator:
        images = _host_batch(images)
        if full_b is None:
            # round the compiled batch up to a data-axis multiple so the
            # DP scatter never falls back to host placement (_place).
            full_b = _round_up(_batch_dim(images), div)
        buf.append(
            (_place(_pad_to(images, full_b), device), np.asarray(labels))
        )
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def evaluate_model(
    model: Callable,
    dataloader: Iterable,
    device: jax.Device | None = None,
    max_batches: int | None = None,
    warmup: int = 5,
    progress: bool = True,
    prefetch: int = 2,
) -> tuple[float, float]:
    """Evaluate ``model`` over ``dataloader``; return ``(top1_acc, img/s)``.

    Args:
      model: callable mapping a device array of images ``[B, H, W, 3]`` to
        logits ``[B, num_classes]`` (typically a jitted partial of
        :func:`rajni_tpu.models.vit.vit_forward` closed over params).
      dataloader: iterable of ``(images, labels)`` host batches (numpy). Must
        be re-iterable (the warmup loop may restart it, and the timed loop
        iterates it fresh — reference eval.py:19-26, 44).
      device: JAX device for H2D placement; defaults to ``jax.devices()[0]``.
      max_batches: stop after this many timed batches (reference eval.py:45).
      warmup: untimed warmup batches (reference eval.py:19-26).
      progress: show the tqdm bar (reference always does; off for tests).
      prefetch: stage this many batches' H2D copies ahead of the forward
        (0 = no lookahead). Overlaps transfer with compute; accounting
        unchanged.
    """
    if device is None:
        device = jax.devices()[0]
    # A data-parallel model fn advertises its batch sharding so the H2D
    # scatter to all chips happens here, in the UNTIMED region — the same
    # place the reference's `.to(device)` sits (eval.py:48-53). device_put
    # onto an already-correctly-sharded array inside the model is a no-op.
    placement = getattr(model, "input_sharding", None) or device

    # ---- Warmup (reference eval.py:18-26) ----
    if warmup > 0:
        print(f"Warming up {warmup} batches")
        it = iter(dataloader)
        div = _batch_divisor(placement)
        warm_b = None  # pad warmup batches exactly like the timed loop so
        # a tiny dataset's partial batch never compiles a second program
        for _ in range(warmup):
            try:
                x, _ = next(it)
            except StopIteration:
                it = iter(dataloader)
                try:
                    x, _ = next(it)
                except StopIteration:
                    raise ValueError(
                        "dataloader yielded no batches (empty dataset?)"
                    ) from None
            x = _host_batch(x)
            if warm_b is None:
                warm_b = _round_up(_batch_dim(x), div)
            fence(model(_place(_pad_to(x, warm_b), placement)))

    correct = 0
    total = 0
    total_images = 0
    total_time = 0.0

    iterator = _prefetch_to_device(
        iter(dataloader), placement, depth=max(prefetch, 0)
    )
    pbar = None
    if progress and tqdm is not None:
        try:
            n = len(dataloader)  # type: ignore[arg-type]
        except TypeError:
            n = None
        pbar = tqdm(
            iterator,
            desc="Evaluating",
            total=max_batches if max_batches is not None else n,
            leave=False,
        )
        iterator = pbar

    for i, (images_dev, labels) in enumerate(iterator):
        if max_batches is not None and i >= max_batches:
            break

        # Untimed H2D (reference eval.py:48-49): the device_put was issued
        # by the prefetcher; the fence keeps it out of the timed region.
        fence(images_dev)

        # Timed region: forward only, device-fenced (reference eval.py:51-59).
        start = time.time()
        logits = model(images_dev)
        fence(logits)
        total_time += time.time() - start

        # labels are unpadded: slice off any padded rows' logits and count
        # only real images (reference eval.py:61-64 accounting).
        b = int(labels.shape[0])
        preds = np.asarray(jax.device_get(logits))[:b].argmax(axis=1)
        correct += int((preds == labels).sum())
        total += b
        total_images += b

        if pbar is not None and total > 0:
            pbar.set_postfix(
                acc=f"{100.0 * correct / total:.2f}%",
                imgs_per_s=f"{total_images / max(total_time, 1e-6):.1f}",
            )

    if pbar is not None:
        pbar.close()

    acc = 100.0 * correct / max(total, 1)
    throughput = total_images / max(total_time, 1e-6)
    return acc, throughput
