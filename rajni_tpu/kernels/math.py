"""Shared helpers for Pallas TPU kernels: scalar math, backend detection,
and the int8 dynamic-quantization primitive.

Mosaic does not lower ``erf``/``erfc``, so the exact-GELU nonlinearity
(timm's ``nn.GELU`` default, used by the reference MLP — model.py:59) is
built from an elementary-function erf approximation here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() != "tpu"


def quantize_rows(y32):
    """Symmetric per-row int8 activation quantization:
    ``(int8 [R, C], scale f32 [R, 1])`` with ``y ≈ int8 * scale``
    (see :mod:`rajni_tpu.quant` for the weight-side counterpart).

    Quantizes with a per-row reciprocal MULTIPLY, not a per-element divide:
    one division per row instead of one per element (measured: −0.37 ms per
    fused-MLP invocation at batch-256 ViT-B on v5e). Rounding of
    ``y * (127/absmax)`` can differ from ``y / (absmax/127)`` by 1 ulp on
    exact-tie inputs — both are valid symmetric int8 quantizers; the
    returned scale is exactly ``absmax/127`` either way.
    """
    absmax = jnp.maximum(
        jnp.max(jnp.abs(y32), axis=-1, keepdims=True), 1e-8
    )
    q = jnp.clip(
        jnp.round(y32 * (127.0 / absmax)), -127, 127
    ).astype(jnp.int8)
    return q, absmax * (1.0 / 127.0)


def quantize_static(y32, inv: float | None = None):
    """Symmetric int8 quantization with a CALIBRATED static scale
    (:func:`rajni_tpu.quant.calibrate_act_scales`): ``int8 [R, C]`` with
    ``y ≈ int8 * a`` for the compile-time constant ``a = 1 / inv``.

    ``inv=None`` means the ``1/a`` multiply was already folded into an
    upstream affine (the LayerNorm scale/bias of the LN→matmul sites) so
    only the round/clip/cast remains — the per-row absmax reduction, the
    reciprocal, and the broadcast multiply of :func:`quantize_rows` all
    disappear. The matching dequant constant is folded into the weight
    scale vector by the kernel wrapper, so no ``[R, 1]`` scale ever
    materializes. Rows that exceed the calibrated absmax saturate at ±127
    (standard PTQ clipping)."""
    if inv is not None:
        y32 = y32 * inv
    return jnp.clip(jnp.round(y32), -127, 127).astype(jnp.int8)


def fold_static_attn(lns, lnb, sqkv, sproj, bqkv, aq, ap):
    """Fold the calibrated static attention scales into VECTOR operands
    (:func:`rajni_tpu.quant.calibrate_act_scales`; shared by every int8
    attention kernel wrapper so the fold semantics cannot drift):

      * ``1/a_qkv`` into the LN affine (``lns``/``lnb``) — the post-LN
        activation arrives pre-scaled for a bare round/clip quantize;
      * ``a_qkv`` into the QKV weight-scale row ``sqkv`` (dequant);
      * ``1/a_proj`` into the V-COLUMNS of both ``sqkv`` AND the qkv BIAS
        — attention is linear in V and the importance z-score is
        V-scale-invariant (up to the post-sqrt eps term and the bf16
        rounding of the pre-scaled V, so near-tied token ranks may differ
        from the dynamic path), and the SDPA output arrives pre-scaled for
        the projection quantize. The bias is added *post-dequant* in the
        kernels, so it must carry the same V fold or the V-bias term ends
        up off by a factor ``a_proj`` (caught by the nonzero-bias parity
        tests);
      * ``a_proj`` into the proj weight-scale row ``sproj``.

    ``sqkv``/``bqkv`` are ``[1, 3·C_local]`` rows (TP shards pass their
    local packing); the V third is the last ``out_w // 3`` columns.
    Returns ``(lns, lnb, sqkv, sproj, bqkv)`` as f32.
    """
    aq, ap = float(aq), float(ap)
    v0 = 2 * (sqkv.shape[-1] // 3)
    lns = lns.astype(jnp.float32) * (1.0 / aq)
    lnb = lnb.astype(jnp.float32) * (1.0 / aq)
    sqkv = (sqkv * aq).at[:, v0:].mul(1.0 / ap)
    bqkv = bqkv.astype(jnp.float32).at[:, v0:].mul(1.0 / ap)
    if sproj is not None:  # None: the proj dequant lives in the consumer
        sproj = sproj * ap
    return lns, lnb, sqkv, sproj, bqkv


def fold_static_mlp(lns, lnb, s1, s2, hidden, a1, a2):
    """MLP counterpart of :func:`fold_static_attn`: ``1/a_fc1`` into the
    LN affine, the dequant factors into ``s1``/``s2``, and ``1/a_fc2`` as
    a ``[1, hidden]`` VMEM row (a vector operand — an SMEM-scalar multiply
    measured ~0.3k img/s per site, r3). Returns
    ``(lns, lnb, s1, s2, sinv_row)``. Biases need no fold here: fc1's bias
    is INSIDE the gelu argument at true scale, and fc2's output is
    dequantized before its bias is added."""
    a1, a2 = float(a1), float(a2)
    lns = lns.astype(jnp.float32) * (1.0 / a1)
    lnb = lnb.astype(jnp.float32) * (1.0 / a1)
    return (
        lns,
        lnb,
        s1 * a1,
        s2 * a2,
        jnp.full((1, hidden), 1.0 / a2, jnp.float32),
    )


def quantize_cols(y32):
    """Symmetric per-column int8 activation quantization:
    ``(int8 [R, C], scale f32 [1, C])`` with ``y ≈ int8 * scale``.

    The column-axis counterpart of :func:`quantize_rows`, used where the
    contraction runs over the ROW axis (e.g. the ``p @ v`` value matmul of
    int8 SDPA: v's scales must be constant along the contracted token axis
    for the dequant factor to leave the sum)."""
    absmax = jnp.maximum(
        jnp.max(jnp.abs(y32), axis=0, keepdims=True), 1e-8
    )
    q = jnp.clip(
        jnp.round(y32 * (127.0 / absmax)), -127, 127
    ).astype(jnp.int8)
    return q, absmax * (1.0 / 127.0)


def erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational approximation of erf.

    Max absolute error 1.5e-7 — below fp32 test tolerances and ~4 orders of
    magnitude below bf16 resolution. VPU-only: one exp plus a degree-5
    polynomial.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-form) GELU: ``0.5 * x * (1 + erf(x / sqrt(2)))``."""
    return 0.5 * x * (1.0 + erf(x * (2.0**-0.5)))


# Minimax fit of the normal-CDF logit log(Φ/(1−Φ)) by an odd degree-9
# polynomial over |x| ≤ 6 (weighted by dΦ/dlogit), fitted offline with
# scipy.  max |x·Φ̂(x) − gelu(x)| = 6.2e-6 over all x (Φ saturates to
# within 1e-9 of {0,1} beyond the clamp, so the clamp at ±6 adds < 1e-7).
_GELU_P = (
    1.595741357441813,
    0.07277895825923464,
    -1.7197148127561505e-4,
    -7.415772250437636e-5,
    2.8973745195906267e-6,
)


def gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """GELU via ``x · sigmoid(P(x))`` with an odd deg-9 logit polynomial.

    Max absolute error 6.2e-6 vs the exact erf form — invisible behind the
    bf16 cast (rel. 4e-3) or int8 quantization that immediately follows it
    in every kernel, and below the fp32 kernel-test tolerances. Unlike the
    A&S erf (exp + divide + deg-5 polynomial + sign fixup), this is 5 FMAs
    plus one hardware sigmoid: measured −0.4 ms per fused-MLP invocation at
    batch-256 ViT-B on v5e (the erf's divide and exp are the VPU cost).
    """
    t = jnp.clip(x, -6.0, 6.0)
    t2 = t * t
    p = _GELU_P
    logit = t * (
        p[0] + t2 * (p[1] + t2 * (p[2] + t2 * (p[3] + t2 * p[4])))
    )
    return x * jax.nn.sigmoid(logit)
