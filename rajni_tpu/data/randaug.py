"""In-graph RandAugment + RandomErasing: the rest of the DeiT train recipe.

The reference is inference-only (`/root/reference/rajni/eval.py:6`
``@torch.no_grad``; SURVEY.md §1 "no training layer"), so this module — like
:mod:`rajni_tpu.data.augment` — is TPU-native training surface beyond parity.
It completes the standard DeiT/timm fine-tuning recipe on top of the
RandomResizedCrop+flip the train CLI already runs in-graph: the **RandAugment
policy** (timm config strings like ``rand-m9-mstd0.5-inc1``) applied to the
uint8 crop, and **RandomErasing** (timm ``reprob/remode/recount``) applied to
the normalized tensor — the same pipeline order as ``timm.data
.create_transform`` (RRC → flip → RandAugment → normalize → erase), with
mixup/CutMix applied afterwards inside the train step.

Why in-graph: the same two properties the other augment stages pin.

  * **Exact resume.** Every draw derives from ``fold_in(key(seed), step)``,
    so ``--resume`` replays the identical augmented stream with no RNG state
    in the checkpoint.
  * **Host offload.** All ops are elementwise/LUT/3×3-conv/affine-gather work
    on a 224² crop — trivially small next to the model step, and the host
    keeps doing decode only.

Semantics follow ``timm/data/auto_augment.py`` exactly at the *policy* level
(the 15-op RandAugment table, per-op probability 0.5, per-application
magnitude ~ N(m, mstd) clamped to [0, mmax], uniform op choice with
replacement, the increasing ``inc1`` level maps) and PIL at the *pixel*
level: the LUT ops (invert / posterize / solarize / solarize-add /
autocontrast / equalize) reproduce ``PIL.ImageOps`` bit-for-bit (pinned in
tests/test_randaug.py); the enhance ops (color / contrast / brightness /
sharpness) reproduce ``PIL.ImageEnhance`` bit-for-bit too (the trunc-store
``_blend`` transcription); the geometric ops (rotate / shear /
translate) use PIL's half-pixel-center inverse-affine sampling with the
bicubic kernel and match PIL interiors to a few LSB (PIL evaluates the same
kernel in a different summation order). Only the RNG *stream* differs (JAX
threefry vs Python MT19937) — immaterial for augmentation, exactly as
documented for the crop sampler.

RandomErasing follows ``timm/data/random_erasing.py``: per-image gate at
``prob``, per-erase target area ``U(0.02, 1/3)·area/count``, log-uniform
aspect in [0.3, 1/0.3], 10 rejection attempts (no erase if none fits —
timm's silent give-up), and the three fill modes — ``pixel`` (per-pixel
standard normal in normalized space), ``rand`` (one normal scalar per
erase), ``const`` (zeros).
"""

from __future__ import annotations

import functools
import math
import re

import jax
import jax.numpy as jnp

from .device import _bicubic
from .pipeline import IMAGENET_MEAN

#: timm's level scale: magnitudes live in [0, 10].
_MAX_LEVEL = 10.0

#: DeiT's geometric fill color — timm ``aa_params['img_mean']`` =
#: ``tuple(min(255, round(255·m)))`` over the ImageNet mean.
DEFAULT_FILL = tuple(
    min(255, round(255.0 * float(m))) for m in IMAGENET_MEAN
)  # (124, 116, 104)


# ---------------------------------------------------------------------------
# pixel ops — all take/return [H, W, 3] float32 holding integers in [0, 255]
# (the representation the crop pipeline already uses between _round8 passes)
# ---------------------------------------------------------------------------


def _clip8(x: jax.Array) -> jax.Array:
    """Round-half-up and clamp to the uint8 range (PIL's store semantics)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def invert(x: jax.Array) -> jax.Array:
    """``ImageOps.invert``: 255 − v."""
    return 255.0 - x


def posterize(x: jax.Array, bits: jax.Array) -> jax.Array:
    """``ImageOps.posterize``: keep the ``bits`` most-significant bits.

    ``bits`` is a traced int32 in [0, 4] (the RandAugment range). Computed in
    float as ``floor(v / 2^(8−bits)) · 2^(8−bits)`` — exact for v ≤ 255.
    """
    s = jnp.exp2((8 - bits).astype(jnp.float32))
    return jnp.floor(x / s) * s


def solarize(x: jax.Array, threshold: jax.Array) -> jax.Array:
    """``ImageOps.solarize``: invert pixels ≥ threshold."""
    return jnp.where(x >= threshold.astype(jnp.float32), 255.0 - x, x)


def solarize_add(
    x: jax.Array, add: jax.Array, threshold: float = 128.0
) -> jax.Array:
    """timm ``solarize_add``: pixels < 128 gain ``add`` (saturating)."""
    return jnp.where(
        x < threshold, jnp.minimum(x + add.astype(jnp.float32), 255.0), x
    )


def autocontrast(x: jax.Array) -> jax.Array:
    """``ImageOps.autocontrast`` (cutoff=0): per-channel min/max stretch.

    PIL builds ``lut[i] = clip(int(i·scale + offset))`` with C ``int()``
    truncation-toward-zero; negatives are clamped to 0 anyway, so
    ``clip(trunc(·))`` is exact.
    """
    lo = jnp.min(x, axis=(0, 1), keepdims=True)
    hi = jnp.max(x, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.where(hi > lo, hi - lo, 1.0)
    out = jnp.clip(jnp.trunc((x - lo) * scale), 0.0, 255.0)
    return jnp.where(hi > lo, out, x)


def equalize(x: jax.Array) -> jax.Array:
    """``ImageOps.equalize``: per-channel histogram equalization.

    Transcribes PIL's LUT construction: drop the last *nonzero* bin from the
    pixel count, ``step = remaining // 255``; identity when the channel has
    ≤ 1 distinct value or ``step == 0``; else
    ``lut[i] = (step//2 + Σ_{j<i} h[j]) // step`` (exclusive cumsum), clamped
    to 255 on application (PIL stores the LUT through a uint8 cast; the
    overshoot is at most a few counts on the top bin).
    """

    def one_channel(ch: jax.Array) -> jax.Array:
        idx = ch.astype(jnp.int32).reshape(-1)
        h = jnp.zeros((256,), jnp.int32).at[idx].add(1)
        nz = h > 0
        last = 255 - jnp.argmax(nz[::-1])  # index of last nonzero bin
        step = (idx.shape[0] - h[last]) // 255
        csum = jnp.cumsum(h) - h  # exclusive prefix sum
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        ident = jnp.arange(256, dtype=jnp.int32)
        lut = jnp.where((jnp.sum(nz) <= 1) | (step == 0), ident, lut)
        return lut[ch.astype(jnp.int32)].astype(jnp.float32)

    return jnp.stack(
        [one_channel(x[..., c]) for c in range(3)], axis=-1
    )


def _gray(x: jax.Array) -> jax.Array:
    """PIL ``convert('L')``: the fixed-point ITU-R 601-2 luma transform,
    ``(19595·R + 38470·G + 7471·B + 0x8000) >> 16`` — exact."""
    xi = x.astype(jnp.int32)
    l = (
        19595 * xi[..., 0] + 38470 * xi[..., 1] + 7471 * xi[..., 2] + 32768
    ) >> 16
    return l.astype(jnp.float32)


def _blend(degenerate: jax.Array, x: jax.Array, factor: jax.Array):
    """``Image.blend(degenerate, img, factor)`` = deg + factor·(img − deg).

    PIL's ImagingBlend stores through a C ``(int)`` cast — truncation toward
    zero — then clips; ``clip(trunc(·))`` reproduces it bit-for-bit (pinned
    exact vs ``ImageEnhance`` in tests/test_randaug.py).
    """
    return jnp.clip(jnp.trunc(degenerate + factor * (x - degenerate)), 0.0, 255.0)


def color(x: jax.Array, factor: jax.Array) -> jax.Array:
    """``ImageEnhance.Color``: blend with the grayscale image."""
    return _blend(_gray(x)[..., None], x, factor)


def contrast(x: jax.Array, factor: jax.Array) -> jax.Array:
    """``ImageEnhance.Contrast``: blend with the uniform mean-luma image
    (mean over ``convert('L')``, rounded half-up — PIL's ``int(mean + 0.5)``).
    """
    mean = jnp.floor(jnp.mean(_gray(x)) + 0.5)
    return _blend(mean, x, factor)


def brightness(x: jax.Array, factor: jax.Array) -> jax.Array:
    """``ImageEnhance.Brightness``: blend with black."""
    return _blend(jnp.zeros_like(x), x, factor)


def sharpness(x: jax.Array, factor: jax.Array) -> jax.Array:
    """``ImageEnhance.Sharpness``: blend with ``filter(ImageFilter.SMOOTH)``.

    SMOOTH is the 3×3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13; PIL leaves the
    one-pixel border unfiltered (the C filter writes interiors only), so the
    border blends original-with-original and passes through unchanged.
    """
    img = x
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(img)
    weights = ((1.0, 1.0, 1.0), (1.0, 5.0, 1.0), (1.0, 1.0, 1.0))
    H, W = img.shape[0], img.shape[1]
    for dy in range(3):
        for dx in range(3):
            acc = acc + weights[dy][dx] * pad[dy : dy + H, dx : dx + W]
    smooth = _clip8(acc / 13.0)
    interior = (
        (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) >= 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) < H - 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) >= 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) < W - 1)
    )
    smooth = jnp.where(interior[..., None], smooth, img)
    return _blend(smooth, img, factor)


# ---------------------------------------------------------------------------
# geometric ops — PIL inverse-affine sampling with the bicubic kernel
# ---------------------------------------------------------------------------


def _transform_cubic_weights(d: jax.Array):
    """Pillow Geometry.c's transform-BICUBIC weights at phase ``d`` ∈ [0, 1).

    NOT the a = −0.5 resize kernel: ``ImagingGenericTransform``'s BICUBIC
    evaluates the historical polynomial
    ``v = v2 + d(−v1+v3) + d²(2v1−2v2+v3−v4) + d³(−v1+v2−v3+v4)`` over taps
    (v1..v4) at floor−1 … floor+2 — i.e. per-tap weights
    ``(−d+2d²−d³, 1−2d²+d³, d+d²−d³, −d²+d³)`` (a partition of unity).
    Transcribed so the geometric ops match PIL bit-for-bit, quirk included.
    """
    d2 = d * d
    d3 = d2 * d
    return (
        -d + 2.0 * d2 - d3,
        1.0 - 2.0 * d2 + d3,
        d + d2 - d3,
        -d2 + d3,
    )


def _affine_bicubic(x: jax.Array, mat, fill) -> jax.Array:
    """PIL ``Image.transform(size, AFFINE, mat, BICUBIC, fillcolor)``.

    Output pixel (col, row) samples the input at
    ``(a·(col+½) + b·(row+½) + c − ½, d·(col+½) + e·(row+½) + f − ½)``
    (PIL's half-pixel-center convention in Geometry.c); taps are the 4×4
    neighborhood weighted by :func:`_transform_cubic_weights` (Pillow's
    transform-specific cubic, not the resize kernel), edge-clamped; samples
    whose center falls outside ``[−1, size)`` take the fill color.
    """
    H, W = x.shape[0], x.shape[1]
    a, b, c, d, e, f = mat
    row = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    col = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    xin = a * col + b * row + c - 0.5
    yin = d * col + e * row + f - 0.5

    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    wxs = _transform_cubic_weights(xin - x0)
    wys = _transform_cubic_weights(yin - y0)
    out = jnp.zeros((H, W, 3), jnp.float32)
    for ty in range(-1, 3):
        wy = wys[ty + 1]
        yc = jnp.clip(y0.astype(jnp.int32) + ty, 0, H - 1)
        for tx in range(-1, 3):
            wx = wxs[tx + 1]
            xc = jnp.clip(x0.astype(jnp.int32) + tx, 0, W - 1)
            out = out + (wy * wx)[..., None] * x[yc, xc]
    # ImagingGenericTransform fills when the PRE-shift sample center
    # (xin + ½ here) falls outside [0, size) — probed empirically against
    # Pillow (shift 0.5 fills the last column, −0.5 keeps the first); the
    # filter's 4×4 taps then edge-clamp.
    valid = (
        (xin >= -0.5) & (xin < W - 0.5) & (yin >= -0.5) & (yin < H - 0.5)
    )
    fill_rgb = jnp.asarray(fill, jnp.float32)
    return jnp.where(valid[..., None], _clip8(out), fill_rgb)


def shear_x(x: jax.Array, factor: jax.Array, fill=DEFAULT_FILL):
    """timm ``shear_x``: AFFINE (1, factor, 0, 0, 1, 0)."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    return _affine_bicubic(x, (one, factor, zero, zero, one, zero), fill)


def shear_y(x: jax.Array, factor: jax.Array, fill=DEFAULT_FILL):
    """timm ``shear_y``: AFFINE (1, 0, 0, factor, 1, 0)."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    return _affine_bicubic(x, (one, zero, zero, factor, one, zero), fill)


def translate_x_rel(x: jax.Array, pct: jax.Array, fill=DEFAULT_FILL):
    """timm ``translate_x_rel``: shift by ``pct·width`` pixels."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    pixels = pct * x.shape[1]
    return _affine_bicubic(x, (one, zero, pixels, zero, one, zero), fill)


def translate_y_rel(x: jax.Array, pct: jax.Array, fill=DEFAULT_FILL):
    """timm ``translate_y_rel``: shift by ``pct·height`` pixels."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    pixels = pct * x.shape[0]
    return _affine_bicubic(x, (one, zero, zero, zero, one, pixels), fill)


def rotate(x: jax.Array, degrees: jax.Array, fill=DEFAULT_FILL):
    """``Image.rotate(degrees, BICUBIC, fillcolor)`` about the center.

    Transcribes PIL's matrix build: with θ = −radians(degrees), the AFFINE
    matrix is [cos θ, sin θ, c, −sin θ, cos θ, f] where (c, f) re-center the
    rotation on (w/2, h/2).
    """
    H, W = x.shape[0], x.shape[1]
    theta = -degrees * (math.pi / 180.0)
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    c = cos * (-cx) + sin * (-cy) + cx
    f = -sin * (-cx) + cos * (-cy) + cy
    return _affine_bicubic(x, (cos, sin, c, -sin, cos, f), fill)


# ---------------------------------------------------------------------------
# the RandAugment policy (timm's 15-op table)
# ---------------------------------------------------------------------------


def _neg(v: jax.Array, key: jax.Array) -> jax.Array:
    """timm ``_randomly_negate``: flip sign with probability 0.5."""
    return jnp.where(jax.random.bernoulli(key), -v, v)


def _enhance_factor(level, key, increasing: bool):
    if increasing:
        return 1.0 + _neg(level / _MAX_LEVEL * 0.9, key)
    return level / _MAX_LEVEL * 1.8 + 0.1


def _op_table(fill, increasing: bool):
    """The 15 RandAugment branches, each ``fn(x, level, key) → x``.

    Order matches timm ``_RAND_TRANSFORMS`` / ``_RAND_INCREASING_TRANSFORMS``
    (AutoContrast, Equalize, Invert, Rotate, Posterize, Solarize,
    SolarizeAdd, Color, Contrast, Brightness, Sharpness, ShearX, ShearY,
    TranslateXRel, TranslateYRel) so magnitudes and choice probabilities line
    up with the reference policy.
    """

    def lvl_int(level, scale):
        return jnp.trunc(level / _MAX_LEVEL * scale).astype(jnp.int32)

    ops = [
        lambda x, level, k: autocontrast(x),
        lambda x, level, k: equalize(x),
        lambda x, level, k: invert(x),
        lambda x, level, k: rotate(
            x, _neg(level / _MAX_LEVEL * 30.0, k), fill
        ),
        lambda x, level, k: posterize(
            x,
            (4 - lvl_int(level, 4.0)) if increasing else lvl_int(level, 4.0),
        ),
        lambda x, level, k: solarize(
            x,
            (256 - lvl_int(level, 256.0))
            if increasing
            else lvl_int(level, 256.0),
        ),
        lambda x, level, k: solarize_add(x, lvl_int(level, 110.0)),
        lambda x, level, k: color(x, _enhance_factor(level, k, increasing)),
        lambda x, level, k: contrast(
            x, _enhance_factor(level, k, increasing)
        ),
        lambda x, level, k: brightness(
            x, _enhance_factor(level, k, increasing)
        ),
        lambda x, level, k: sharpness(
            x, _enhance_factor(level, k, increasing)
        ),
        lambda x, level, k: shear_x(
            x, _neg(level / _MAX_LEVEL * 0.3, k), fill
        ),
        lambda x, level, k: shear_y(
            x, _neg(level / _MAX_LEVEL * 0.3, k), fill
        ),
        lambda x, level, k: translate_x_rel(
            x, _neg(level / _MAX_LEVEL * 0.45, k), fill
        ),
        lambda x, level, k: translate_y_rel(
            x, _neg(level / _MAX_LEVEL * 0.45, k), fill
        ),
    ]
    return ops


def parse_rand_augment(config: str) -> dict:
    """Parse a timm RandAugment config string into policy kwargs.

    ``rand-m9-mstd0.5-inc1`` → num_layers 2, magnitude 9, mstd 0.5,
    increasing. Supported keys (timm ``rand_augment_transform``): ``m``
    (magnitude), ``n`` (layers, default 2), ``p`` (per-op prob, default 0.5),
    ``mstd`` (magnitude noise σ; ≥ 100 means uniform [0, m]), ``mmax``
    (magnitude ceiling, default 10), ``inc`` (increasing level maps).
    ``w`` (weighted choice) is not supported.
    """
    parts = config.split("-")
    if not parts or parts[0] != "rand":
        raise ValueError(
            f"RandAugment config must start with 'rand': {config!r}"
        )
    kwargs = dict(
        num_layers=2,
        magnitude=9.0,
        mstd=0.0,
        mmax=_MAX_LEVEL,
        prob=0.5,
        increasing=False,
    )
    for part in parts[1:]:
        m = re.match(r"([a-z]+)([\d.]+)", part)
        if not m:
            raise ValueError(f"bad RandAugment token {part!r} in {config!r}")
        key, val = m.group(1), m.group(2)
        if key == "m":
            kwargs["magnitude"] = float(val)
        elif key == "n":
            kwargs["num_layers"] = int(val)
        elif key == "p":
            kwargs["prob"] = float(val)
        elif key == "mstd":
            kwargs["mstd"] = float(val)
        elif key == "mmax":
            kwargs["mmax"] = float(val)
        elif key == "inc":
            kwargs["increasing"] = bool(int(val))
        else:
            raise ValueError(
                f"unsupported RandAugment token {part!r} in {config!r}"
            )
    return kwargs


def rand_augment_apply(
    img: jax.Array,
    key: jax.Array,
    *,
    num_layers: int = 2,
    magnitude: float = 9.0,
    mstd: float = 0.5,
    mmax: float = _MAX_LEVEL,
    prob: float = 0.5,
    increasing: bool = True,
    fill=DEFAULT_FILL,
) -> jax.Array:
    """Apply the RandAugment policy to one image, in-graph.

    Args:
      img: ``[H, W, 3]`` float32 holding integers in [0, 255] (the uint8
        domain the crop pipeline carries between rounding passes).
      key: per-(image, step) PRNG key.
      others: policy parameters — see :func:`parse_rand_augment`.

    Per layer (timm ``RandAugment.__call__`` + ``AugmentOp.__call__``): draw
    one of the 15 ops uniformly (with replacement across layers), gate it at
    ``prob``, perturb the magnitude with N(0, mstd) (or U[0, m] when
    mstd ≥ 100) clamped to [0, mmax], and apply. Under ``vmap`` the
    ``lax.switch`` evaluates every branch and selects — 15 cheap ops on a
    224² crop, still ≪ the model step.
    """
    ops = _op_table(fill, increasing)

    x = img
    for layer in range(num_layers):
        k = jax.random.fold_in(key, layer)
        k_choice, k_gate, k_mag, k_op = jax.random.split(k, 4)
        op_idx = jax.random.randint(k_choice, (), 0, len(ops))
        gate = jax.random.bernoulli(k_gate, prob)
        if mstd >= 100.0:
            level = jax.random.uniform(k_mag) * magnitude
        elif mstd > 0.0:
            level = magnitude + mstd * jax.random.normal(k_mag)
        else:
            level = jnp.float32(magnitude)
        level = jnp.clip(level, 0.0, mmax)
        y = jax.lax.switch(op_idx, ops, x, level, k_op)
        x = jnp.where(gate, y, x)
    return x


# ---------------------------------------------------------------------------
# RandomErasing (timm) — on the normalized tensor
# ---------------------------------------------------------------------------


def random_erasing(
    x: jax.Array,
    key: jax.Array,
    *,
    prob: float = 0.25,
    mode: str = "pixel",
    count: int = 1,
    min_area: float = 0.02,
    max_area: float = 1.0 / 3.0,
    min_aspect: float = 0.3,
    max_aspect: float | None = None,
) -> jax.Array:
    """timm ``RandomErasing`` on one normalized image, in-graph.

    Args:
      x: ``[H, W, C]`` float image in *normalized* space (post mean/std).
      key: per-(image, step) PRNG key.
      prob: per-image probability any erasing happens (timm ``reprob``).
      mode: ``pixel`` (per-pixel N(0,1)), ``rand`` (one N(0,1) scalar per
        erase), ``const`` (zeros) — timm ``remode``.
      count: erase rectangles per image (timm ``recount``; timm draws
        ``randint(min, max)`` but its default and DeiT's use a fixed count).
      min_area/max_area/min_aspect/max_aspect: box law (timm defaults;
        ``max_aspect = 1/min_aspect`` when None).

    Each erase samples 10 candidate boxes (area ``U(min, max)·A/count``,
    log-uniform aspect) and takes the first that fits — none fitting means
    no erase, timm's silent give-up.
    """
    if mode not in ("pixel", "rand", "const"):
        raise ValueError(f"unknown RandomErasing mode {mode!r}")
    H, W = x.shape[0], x.shape[1]
    max_aspect = max_aspect or 1.0 / min_aspect
    log_lo, log_hi = math.log(min_aspect), math.log(max_aspect)
    area = float(H * W)

    k_gate, k_body = jax.random.split(key)
    gate = jax.random.bernoulli(k_gate, prob)

    out = x
    for e in range(count):
        ke = jax.random.fold_in(k_body, e)
        k_area, k_ar, k_top, k_left, k_fill = jax.random.split(ke, 5)
        target = (
            jax.random.uniform(k_area, (10,), minval=min_area, maxval=max_area)
            * area
            / count
        )
        ar = jnp.exp(
            jax.random.uniform(k_ar, (10,), minval=log_lo, maxval=log_hi)
        )
        h = jnp.round(jnp.sqrt(target * ar)).astype(jnp.int32)
        w = jnp.round(jnp.sqrt(target / ar)).astype(jnp.int32)
        valid = (h > 0) & (h < H) & (w > 0) & (w < W)
        first = jnp.argmax(valid)
        any_valid = jnp.any(valid)
        h_sel = jnp.where(any_valid, h[first], 0)
        w_sel = jnp.where(any_valid, w[first], 0)
        # randint(0, H - h): timm torch.randint upper bound is exclusive
        top = jnp.floor(
            jax.random.uniform(k_top) * (H - h_sel).astype(jnp.float32)
        ).astype(jnp.int32)
        left = jnp.floor(
            jax.random.uniform(k_left) * (W - w_sel).astype(jnp.float32)
        ).astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        mask = (
            (rows >= top)
            & (rows < top + h_sel)
            & (cols >= left)
            & (cols < left + w_sel)
            & gate
            & any_valid
        )
        if mode == "pixel":
            fillv = jax.random.normal(k_fill, x.shape, jnp.float32)
        elif mode == "rand":
            fillv = jnp.broadcast_to(
                jax.random.normal(k_fill, (), jnp.float32), x.shape
            )
        else:
            fillv = jnp.zeros_like(x, jnp.float32)
        out = jnp.where(mask[..., None], fillv.astype(out.dtype), out)
    return out
