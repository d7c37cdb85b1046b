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
    (see :mod:`rajni_tpu.quant` for the weight-side counterpart)."""
    absmax = jnp.max(jnp.abs(y32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


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
