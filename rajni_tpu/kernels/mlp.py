"""Pallas TPU fused LayerNorm → MLP → residual-add kernel.

The MLP branch of a ViT block (reference model.py:59:
``x = x + dp2(ls2(blk.mlp(blk.norm2(x))))``) is the single most expensive
component of the forward (measured 5.4 ms of the ~8 ms stock block at
batch 256 / ViT-B on v5e): XLA writes the ``[B, N, 4C]`` fc1 activation to
HBM (310 MB) and reads it back for fc2. This kernel keeps it in VMEM.

Design:

  * LayerNorm and the MLP are **per-token** ops — no token mixing — so the
    input is flattened to ``[B·N, C]`` and tiled over aligned row blocks.
    The kernel is therefore completely independent of the (pruned) sequence
    length: the same program works for every block of every schedule.
  * Per row-tile: fp32 LayerNorm on the VPU → ``[R, C] @ [C, 4C]`` on the
    MXU → exact (erf) GELU → ``[R, 4C] @ [4C, C]`` → optional layer-scale →
    residual add with the *pre-norm* input (still in VMEM).
  * Weights use constant index maps — Mosaic fetches them once and keeps
    them VMEM-resident across the whole grid.

VMEM at R=256, ViT-B (C=768, 4C=3072), bf16: weights 9.4 MB + hidden
1.6 MB + x/out tiles ~1.6 MB (double-buffered) ≈ 13 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math import gelu_exact

_ROWS = 256  # row-tile: 256×768 bf16 = 0.4 MB, MXU-aligned


def _ln_mlp_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ls_ref, out_ref, *, eps: float,
):
    x = x_ref[:]
    # ---- LayerNorm (fp32 statistics, torch semantics) ----
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(
        jnp.float32
    )
    y = y.astype(x.dtype)

    # ---- MLP: fc1 → exact GELU → fc2, hidden stays in VMEM ----
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    # Exact (erf) GELU via kernels.math (Mosaic lowers neither erf nor erfc).
    h = gelu_exact(h)
    out = jnp.dot(
        h.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32
    )
    out = out + b2_ref[:].astype(jnp.float32)
    # layer-scale (identity vector when the block has none)
    out = out * ls_ref[:].astype(jnp.float32)

    # ---- Residual add with the pre-norm input ----
    out_ref[:] = (x32 + out).astype(out_ref.dtype)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_ln_mlp_residual(
    x: jax.Array,
    ln_params,
    mlp_params,
    ls: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """``x + ls * mlp(layer_norm(x))`` with the hidden activation VMEM-resident.

    Fuses reference model.py:59 (norm2 → mlp → layer-scale → residual add).

    Args:
      x: ``[B, N, C]`` residual stream.
      ln_params: ``{"scale": [C], "bias": [C]}``.
      mlp_params: ``{"fc1": {kernel [C,Hd], bias}, "fc2": {kernel [Hd,C], bias}}``.
      ls: optional ``[C]`` layer-scale vector (reference model.py:48).
      eps: LayerNorm epsilon.
    """
    B, N, C = x.shape
    w1 = mlp_params["fc1"]["kernel"]
    b1 = mlp_params["fc1"]["bias"]
    w2 = mlp_params["fc2"]["kernel"]
    b2 = mlp_params["fc2"]["bias"]
    hidden = w1.shape[1]
    if ls is None:
        ls = jnp.ones((C,), x.dtype)

    rows = B * N
    flat = x.reshape(rows, C)
    grid = (pl.cdiv(rows, _ROWS),)

    vec = lambda: pl.BlockSpec(  # noqa: E731 — replicated [C]-vector spec
        (1, C), lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda r: (r, 0), memory_space=pltpu.VMEM),
            vec(),  # ln scale
            vec(),  # ln bias
            pl.BlockSpec((C, hidden), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda r: (0, 0), memory_space=pltpu.VMEM),
            vec(),  # fc2 bias
            vec(),  # layer-scale
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, C), lambda r: (r, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * C * hidden,
            bytes_accessed=2 * rows * C * x.dtype.itemsize
            + (2 * C * hidden) * w1.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_use_interpret(),
    )(
        flat,
        ln_params["scale"].reshape(1, C),
        ln_params["bias"].reshape(1, C),
        w1,
        b1.reshape(1, hidden),
        w2,
        b2.reshape(1, C),
        ls.reshape(1, C),
    )
    return out.reshape(B, N, C)
