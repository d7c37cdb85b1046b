"""In-graph training augmentation: RandomResizedCrop + flip on the TPU.

The reference is inference-only (`/root/reference/rajni/eval.py:6`
``@torch.no_grad``; SURVEY.md §1 "no training layer"), so its data pipeline
has no train-mode transforms. This framework's train CLI
(:mod:`rajni_tpu.train`) fine-tunes through the pruning schedule, and the
standard ViT fine-tuning recipe needs the torchvision train transforms —
``RandomResizedCrop(224, scale, ratio, bicubic)`` + ``RandomHorizontalFlip``.

The TPU-native formulation reuses the variable-geometry machinery of
:func:`rajni_tpu.data.device.preprocess_on_device`: each image arrives
decode-only on a fixed uint8 canvas with its true ``(h, w)``
(``pipeline.decode_to_canvas``), the random crop box is sampled **in-graph**
from a JAX PRNG key, and the crop→resize becomes two per-image
interpolation-weight matmuls on the MXU (PIL-exact bicubic, 8-bit rounding
between the passes — the same arithmetic a host PIL/torchvision train
pipeline performs). The horizontal flip is free: it reverses the rows of the
horizontal weight matrix, i.e. permutes output columns exactly.

Why in-graph rather than host-side:

  * **Determinism / exact resume.** The per-step key is
    ``fold_in(key(seed), step)``, so ``--resume`` replays the *identical*
    augmented stream with no RNG state to checkpoint — the resumed loss
    trajectory is bit-compatible with the uninterrupted run (the same
    property the train CLI already pins for ``--shuffle``).
  * **Host offload.** The host does decode only; geometry runs on the
    accelerator at ~2·crop·S·S MACs/image (< 1% of a ViT-B step), and the
    uint8 canvas H2D is byte-for-byte what ``--preprocess device-full``
    ships for eval.

Box-sampling semantics follow ``torchvision.transforms.RandomResizedCrop.
get_params`` exactly (10 rejection-sampling attempts, first valid, clamped
center-crop fallback) — only the RNG stream differs (JAX threefry vs torch
MT19937), which is immaterial for augmentation. The resample matches
torchvision's ``crop → PIL bicubic resize`` composition: interpolation
weights clamp to the *crop box* (the crop materializes a new image in
torchvision, so the resample never reads past it), unlike eval resize whose
weights clamp to the full image.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .device import _bicubic, _round8
from .pipeline import IMAGENET_MEAN, IMAGENET_STD

#: torchvision RandomResizedCrop defaults
DEFAULT_SCALE = (0.08, 1.0)
DEFAULT_RATIO = (3.0 / 4.0, 4.0 / 3.0)


def _rrc_box(
    key: jax.Array,
    h: jax.Array,
    w: jax.Array,
    scale: tuple[float, float],
    ratio: tuple[float, float],
):
    """Sample a RandomResizedCrop box — ``(top, left, crop_h, crop_w)`` int32.

    In-graph transcription of ``torchvision.transforms.RandomResizedCrop.
    get_params``: 10 candidate (area, aspect) draws are sampled at once, the
    first valid one wins (``argmax`` over the validity mask returns the first
    ``True``), and when none fits the fallback is torchvision's center crop
    with the aspect ratio clamped into ``ratio``. ``round`` matches Python's
    banker's rounding via ``jnp.round``.
    """
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    area = hf * wf
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)

    target = area * jax.random.uniform(
        k_area, (10,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (10,),
        minval=math.log(ratio[0]),
        maxval=math.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.round(jnp.sqrt(target * aspect))
    ch = jnp.round(jnp.sqrt(target / aspect))
    valid = (cw > 0.0) & (cw <= wf) & (ch > 0.0) & (ch <= hf)
    first = jnp.argmax(valid)  # index of the first valid attempt
    any_valid = jnp.any(valid)

    # fallback: whole-image center crop, aspect clamped into `ratio`
    in_ratio = wf / hf
    cw_fb = jnp.where(
        in_ratio < ratio[0],
        wf,
        jnp.where(in_ratio > ratio[1], jnp.round(hf * ratio[1]), wf),
    )
    ch_fb = jnp.where(
        in_ratio < ratio[0],
        jnp.round(wf / ratio[0]),
        jnp.where(in_ratio > ratio[1], hf, hf),
    )

    ch_sel = jnp.where(any_valid, ch[first], ch_fb)
    cw_sel = jnp.where(any_valid, cw[first], cw_fb)
    # randint(0, h - ch + 1) == floor(u * (h - ch + 1)) for u in [0, 1)
    top_rand = jnp.floor(jax.random.uniform(k_top) * (hf - ch_sel + 1.0))
    left_rand = jnp.floor(jax.random.uniform(k_left) * (wf - cw_sel + 1.0))
    top = jnp.where(any_valid, top_rand, jnp.floor((hf - ch_fb) / 2.0))
    left = jnp.where(any_valid, left_rand, jnp.floor((wf - cw_fb) / 2.0))
    return (
        top.astype(jnp.int32),
        left.astype(jnp.int32),
        ch_sel.astype(jnp.int32),
        cw_sel.astype(jnp.int32),
    )


def _region_rows(
    src_off: jax.Array, src_size: jax.Array, out_size: int, canvas: int
) -> jax.Array:
    """``[out_size, canvas]`` bicubic weights resizing source span
    ``[src_off, src_off + src_size)`` to ``out_size`` pixels.

    Same PIL ``precompute_coeffs`` math as ``device._resample_rows`` (kernel
    a = −0.5, antialias support scaled by the shrink ratio, truncation
    bounds, per-row normalization), but the sampling window clamps to the
    *crop box* instead of the full axis — torchvision's crop-then-resize
    composition resamples the materialized crop, so pixels outside the box
    (including canvas padding) must contribute nothing.
    """
    src_f = src_size.astype(jnp.float32)
    off_f = src_off.astype(jnp.float32)
    scale = src_f / float(out_size)
    filterscale = jnp.maximum(scale, 1.0)
    support = 2.0 * filterscale

    out_idx = jax.lax.broadcasted_iota(jnp.float32, (out_size, canvas), 0)
    src_idx = jax.lax.broadcasted_iota(jnp.float32, (out_size, canvas), 1)
    center = off_f + (out_idx + 0.5) * scale
    lo = jnp.maximum(jnp.trunc(center - support + 0.5), off_f)
    hi = jnp.minimum(jnp.trunc(center + support + 0.5), off_f + src_f)
    wgt = _bicubic((src_idx + 0.5 - center) / filterscale)
    wgt = jnp.where((src_idx >= lo) & (src_idx < hi), wgt, 0.0)
    total = jnp.sum(wgt, axis=1, keepdims=True)
    return wgt / jnp.where(total == 0.0, 1.0, total)


@functools.partial(
    jax.jit,
    static_argnames=(
        "crop", "scale", "ratio", "hflip", "dtype", "rand_augment", "erase"
    ),
)
def augment_on_device(
    canvas_u8: jax.Array,
    sizes: jax.Array,
    key: jax.Array,
    crop: int = 224,
    scale: tuple[float, float] = DEFAULT_SCALE,
    ratio: tuple[float, float] = DEFAULT_RATIO,
    hflip: bool = True,
    dtype=jnp.bfloat16,
    rand_augment: str | None = None,
    erase: tuple[float, str, int] | None = None,
) -> jax.Array:
    """Train-mode augmentation: ``uint8 canvas → normalized random crop``.

    Args:
      canvas_u8: ``[B, S, S, 3]`` uint8 — decode-only images top-left on a
        fixed canvas (``pipeline.decode_to_canvas`` /
        ``ImageFolder(output="canvas")``).
      sizes: ``[B, 2]`` int32 true ``(h, w)`` per image, each ≤ S.
      key: PRNG key for this batch. Derive it as
        ``jax.random.fold_in(jax.random.key(seed), step)`` so a resumed run
        replays the identical stream.
      crop: output side (the model's ``img_size``).
      scale / ratio: RandomResizedCrop area and aspect bounds
        (torchvision defaults).
      hflip: apply a 0.5-probability horizontal flip after the crop.
      rand_augment: optional timm RandAugment config string (e.g.
        ``"rand-m9-mstd0.5-inc1"``), applied to the uint8 crop after the
        flip — timm's transform order (:mod:`rajni_tpu.data.randaug`).
      erase: optional RandomErasing ``(prob, mode, count)`` (timm
        reprob/remode/recount), applied after normalization.

    Returns ``[B, crop, crop, 3]`` in ``dtype``, ImageNet-normalized —
    drop-in for the train step's ``images`` argument.
    """
    canvas = canvas_u8.shape[1]
    ra_kwargs = None
    if rand_augment:
        from .randaug import parse_rand_augment

        ra_kwargs = parse_rand_augment(rand_augment)

    def one(img_u8, hw, k):
        k_box, k_flip, k_ra, k_er = jax.random.split(k, 4)
        top, left, ch, cw = _rrc_box(k_box, hw[0], hw[1], scale, ratio)
        wh = _region_rows(left, cw, crop, canvas)  # [crop, S] columns
        wv = _region_rows(top, ch, crop, canvas)   # [crop, S] rows
        if hflip:
            flip = jax.random.bernoulli(k_flip)
            # flipping the resized output = permuting output columns =
            # reversing the horizontal weight rows (exact, not resampled)
            wh = jnp.where(flip, wh[::-1, :], wh)
        x = img_u8.astype(jnp.float32)  # [S, S, 3]
        # horizontal pass: [S, S, 3] → [S, crop, 3]; PIL rounds to 8 bits
        # between the passes (device._round8)
        tmp = jnp.einsum(
            "hwc,ow->hoc", x, wh, preferred_element_type=jnp.float32
        )
        tmp = _round8(tmp)
        out = jnp.einsum(
            "hoc,kh->koc", tmp, wv, preferred_element_type=jnp.float32
        )
        out = _round8(out)
        if ra_kwargs is not None:
            from .randaug import rand_augment_apply

            out = rand_augment_apply(out, k_ra, **ra_kwargs)
        out = (out * (1.0 / 255.0) - jnp.asarray(IMAGENET_MEAN)) * (
            1.0 / jnp.asarray(IMAGENET_STD)
        )
        if erase is not None and erase[0] > 0.0:
            from .randaug import random_erasing

            out = random_erasing(
                out, k_er, prob=erase[0], mode=erase[1], count=erase[2]
            )
        return out.astype(dtype)

    keys = jax.random.split(key, canvas_u8.shape[0])
    return jax.vmap(one)(canvas_u8, sizes, keys)
