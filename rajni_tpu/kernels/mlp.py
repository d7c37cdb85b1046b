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
  * **Hidden-dim chunking for big models**: ViT-B's weights (9.4 MB bf16)
    stay fully VMEM-resident with constant index maps; for larger configs
    (ViT-L: fc1+fc2 = 16.8 MB > the ~16 MB VMEM budget) the hidden dimension
    is split into chunks streamed through a second grid dimension, with the
    fc2 partial products accumulated in an fp32 scratch:
    ``acc += gelu(y @ W1[:, k]) @ W2[k, :]`` — GELU is elementwise in the
    hidden axis, so chunking is exact.

VMEM at R=256, ViT-B (C=768, 4C=3072), bf16: weights 9.4 MB + hidden
1.6 MB + x/out tiles ~1.6 MB (double-buffered) ≈ 13 MB. ViT-L runs with
HC=1024 chunks: 2×4.2 MB streaming weights + 1 MB accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math import gelu_fast
from .math import quantize_rows as _quantize_rows
from .math import fold_static_mlp as _fold_static_mlp
from .math import quantize_static as _quantize_static
from .math import use_interpret as _use_interpret

_ROWS = 256  # row-tile: 256×768 bf16 = 0.4 MB, MXU-aligned
_WEIGHT_BUDGET = 10 * 1024 * 1024  # VMEM bytes for resident weight blocks


def _hidden_chunk(C: int, hidden: int, itemsize: int) -> int:
    """Largest hidden chunk whose streamed weight blocks fit the budget."""
    if 2 * C * hidden * itemsize <= _WEIGHT_BUDGET:
        return hidden  # fully resident, no streaming
    hc = hidden
    # Streamed (index-varying) blocks are double-buffered by the pipeline:
    # budget covers 2 × (w1_chunk + w2_chunk).
    while hc > 128 and 4 * C * hc * itemsize > _WEIGHT_BUDGET:
        hc //= 2
    while hidden % hc:  # keep it an exact divisor
        hc //= 2
    return max(hc, 128)


def _ln_mlp_kernel_fast(
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ls_ref, out_ref, *, eps: float, add_residual: bool,
):
    """Single-chunk variant (weights fully resident): straight-line, no
    scratch round trips. Used whenever fc1+fc2 fit the VMEM weight budget."""
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(
        jnp.float32
    )
    h = jnp.dot(
        y.astype(x_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    )
    h = gelu_fast(h + b1_ref[:].astype(jnp.float32))
    out = jnp.dot(
        h.astype(x_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32
    )
    out = (out + b2_ref[:].astype(jnp.float32)) * ls_ref[:].astype(
        jnp.float32
    )
    if add_residual:
        out = x32 + out
    out_ref[:] = out.astype(out_ref.dtype)


def _ln_mlp_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ls_ref, out_ref, y_ref, acc_ref, *, eps: float, add_residual: bool,
):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        # ---- LayerNorm (fp32 statistics, torch semantics), once per tile ----
        x32 = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(
            jnp.float32
        )
        y_ref[:] = y.astype(y_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # ---- MLP chunk: fc1 → exact GELU → fc2 partial, hidden stays in VMEM ----
    h = jnp.dot(y_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    # erf-accuracy GELU via kernels.math (6.2e-6; Mosaic lowers no erf).
    h = gelu_fast(h)
    acc_ref[:] += jnp.dot(
        h.astype(x_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        out = out * ls_ref[:].astype(jnp.float32)  # layer-scale (or ones)
        if add_residual:  # residual add with the pre-norm input
            out = x_ref[:].astype(jnp.float32) + out
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "add_residual"))
def fused_ln_mlp_residual(
    x: jax.Array,
    ln_params,
    mlp_params,
    ls: jax.Array | None = None,
    eps: float = 1e-6,
    add_residual: bool = True,
) -> jax.Array:
    """``x + ls * mlp(layer_norm(x))`` with the hidden activation VMEM-resident.

    Fuses reference model.py:59 (norm2 → mlp → layer-scale → residual add).

    Args:
      x: ``[B, N, C]`` residual stream.
      ln_params: ``{"scale": [C], "bias": [C]}``.
      mlp_params: ``{"fc1": {kernel [C,Hd], bias}, "fc2": {kernel [Hd,C], bias}}``.
      ls: optional ``[C]`` layer-scale vector (reference model.py:48).
      eps: LayerNorm epsilon.
      add_residual: skip the in-kernel ``x +`` when False — used by the
        tensor-parallel composition, where each shard's fc2 output is a
        PARTIAL sum that must be psum'd across the model axis before the
        (single) residual add.
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
    hc = _hidden_chunk(C, hidden, jnp.dtype(w1.dtype).itemsize)
    grid = (pl.cdiv(rows, _ROWS), hidden // hc)

    vec = lambda: pl.BlockSpec(  # noqa: E731 — replicated [C]-vector spec
        (1, C), lambda r, k: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = _ln_mlp_kernel_fast if hc == hidden else _ln_mlp_kernel
    out = pl.pallas_call(
        functools.partial(kernel, eps=eps, add_residual=add_residual),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda r, k: (r, 0),
                         memory_space=pltpu.VMEM),
            vec(),  # ln scale
            vec(),  # ln bias
            pl.BlockSpec((C, hc), lambda r, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda r, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, C), lambda r, k: (k, 0),
                         memory_space=pltpu.VMEM),
            vec(),  # fc2 bias
            vec(),  # layer-scale
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, C), lambda r, k: (r, 0), memory_space=pltpu.VMEM
        ),
        # the fast (single-chunk) kernel never touches the scratch — pass
        # none so its ~1.2 MB doesn't count against the 16 MB VMEM budget
        scratch_shapes=[] if hc == hidden else [
            pltpu.VMEM((_ROWS, C), x.dtype),       # normed input, reused per k
            pltpu.VMEM((_ROWS, C), jnp.float32),   # fc2 accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * C * hidden,
            bytes_accessed=2 * rows * C * x.dtype.itemsize
            + (2 * C * hidden) * w1.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
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


# --------------------------------------------------------------------------
# Int8 dynamic-quantization variant (see rajni_tpu.quant)
# --------------------------------------------------------------------------


def _ln_mlp_int8_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref, ls_ref, sinv_ref, out_ref, *, eps: float,
    add_residual: bool = True, static_act: bool = False,
):
    # static_act: calibrated static-scale mode — the wrapper folded 1/a_fc1
    # into the LN affine and a_fc1/a_fc2 into s1/s2; the VMEM row
    # ``sinv_ref [1, hidden]`` carries 1/a_fc2 (a vector operand — an
    # SMEM-scalar multiply measured ~0.3k img/s per site, r3) so one
    # compiled program serves every block.
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(
        jnp.float32
    )

    # fc1 on the int8 MXU: int8[R,C] @ int8[C,Hd] -> int32, dequantized by
    # (per-row activation scale) x (per-column weight scale).
    if static_act:
        y_q, a_scale = _quantize_static(y), 1.0
    else:
        y_q, a_scale = _quantize_rows(y)
    h = jax.lax.dot_general(
        y_q, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = (h if static_act else h * a_scale) * s1_ref[:] + b1_ref[:].astype(
        jnp.float32
    )
    h = gelu_fast(h)

    if static_act:
        h_q, h_scale = _quantize_static(h * sinv_ref[:]), 1.0
    else:
        h_q, h_scale = _quantize_rows(h)
    out = jax.lax.dot_general(
        h_q, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    if not static_act:
        out = out * h_scale
    out = out * s2_ref[:] + b2_ref[:].astype(jnp.float32)
    out = out * ls_ref[:].astype(jnp.float32)
    if add_residual:
        out = x32 + out
    out_ref[:] = out.astype(out_ref.dtype)


def _ln_mlp_int8_chunk_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref, ls_ref, sinv_ref, out_ref, y_ref, acc_ref,
    *, eps: float, add_residual: bool = True, static_act: bool = False,
):
    """Hidden-chunked int8 variant: streams ``[C, hc]``/``[hc, C]`` weight
    chunks through a second grid dimension for models whose int8 fc pair
    exceeds the resident-weight budget (ViT-g class and up; ViT-H still
    fits unchunked). GELU and the static fc2 quantize are elementwise in
    the hidden axis, so chunking is exact for them; DYNAMIC mode quantizes
    each h-chunk with its own per-row absmax (a finer grid than the
    unchunked kernel's whole-row scale — same tolerance-not-bit-parity
    note as the TP grouped scales, docs/QUANTIZATION.md)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y_ref[:] = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[
            :
        ].astype(jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # re-quantize y from the f32 scratch per chunk (identical result every
    # chunk; the absmax pass is VPU noise next to the streamed matmuls)
    if static_act:
        y_q, a_scale = _quantize_static(y_ref[:]), 1.0
    else:
        y_q, a_scale = _quantize_rows(y_ref[:])
    h = jax.lax.dot_general(
        y_q, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = (h if static_act else h * a_scale) * s1_ref[:] + b1_ref[:].astype(
        jnp.float32
    )
    h = gelu_fast(h)
    if static_act:
        h_q, h_scale = _quantize_static(h * sinv_ref[:]), 1.0
    else:
        h_q, h_scale = _quantize_rows(h)
    part = jax.lax.dot_general(
        h_q, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_ref[:] += part if static_act else part * h_scale

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:] * s2_ref[:] + b2_ref[:].astype(jnp.float32)
        out = out * ls_ref[:].astype(jnp.float32)
        if add_residual:
            out = x_ref[:].astype(jnp.float32) + out
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "add_residual", "act_scales")
)
def fused_ln_mlp_residual_int8(
    x: jax.Array,
    ln_params,
    mlp_params,
    ls: jax.Array | None = None,
    eps: float = 1e-6,
    add_residual: bool = True,
    act_scales: tuple[float, float] | None = None,
) -> jax.Array:
    """Int8 variant of :func:`fused_ln_mlp_residual`.

    ``mlp_params`` carry :func:`rajni_tpu.quant.quantize_weight` records
    (``kernel = {"int8": [C,Hd], "scale": [1,Hd]}``); activations are
    dynamically quantized per token row inside the kernel. Int8 weights
    halve the resident weight footprint, so even ViT-H fits unchunked;
    larger configs (ViT-g class) stream hidden chunks like the bf16
    kernel (``_ln_mlp_int8_chunk_kernel`` — dynamic mode then quantizes
    each h-chunk with its own per-row scale, tolerance- not bit-parity
    vs the unchunked kernel).
    ``add_residual=False`` returns the ls-scaled MLP output without the
    ``x +`` — the tensor-parallel path psums partials first.
    ``act_scales`` — calibrated static ``(a_fc1, a_fc2)``
    (:func:`rajni_tpu.quant.calibrate_act_scales`) — folds the quantize
    factors into the LN affine / weight scales, removing both per-row
    absmax passes.
    """
    B, N, C = x.shape
    w1 = mlp_params["fc1"]["kernel"]
    w2 = mlp_params["fc2"]["kernel"]
    hidden = w1["int8"].shape[1]
    if ls is None:
        ls = jnp.ones((C,), x.dtype)
    lns = ln_params["scale"].reshape(1, C)
    lnb = ln_params["bias"].reshape(1, C)
    s1 = w1["scale"].reshape(1, hidden)
    s2 = w2["scale"].reshape(1, C)
    sinv = jnp.ones((1, hidden), jnp.float32)
    if act_scales is not None:
        lns, lnb, s1, s2, sinv = _fold_static_mlp(
            lns, lnb, s1, s2, hidden, *act_scales
        )

    rows = B * N
    flat = x.reshape(rows, C)
    hc = _hidden_chunk(C, hidden, 1)  # int8 weights: 1 byte/elem
    operands = (
        flat,
        lns,
        lnb,
        w1["int8"],
        s1,
        mlp_params["fc1"]["bias"].reshape(1, hidden),
        w2["int8"],
        s2,
        mlp_params["fc2"]["bias"].reshape(1, C),
        ls.reshape(1, C),
        sinv,
    )
    cost = pl.CostEstimate(
        flops=2 * 2 * rows * C * hidden,
        bytes_accessed=2 * rows * C * x.dtype.itemsize + 2 * C * hidden,
        transcendentals=rows * hidden,
    )

    if hc != hidden:
        # streamed-chunk route for models whose int8 fc pair exceeds the
        # resident budget (ViT-g class; ViT-H C=1280 still fits resident)
        vec2 = lambda n: pl.BlockSpec(  # noqa: E731
            (1, n), lambda r, k: (0, 0), memory_space=pltpu.VMEM
        )
        hvec = lambda: pl.BlockSpec(  # noqa: E731 — [1, hc] hidden chunk
            (1, hc), lambda r, k: (0, k), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_ln_mlp_int8_chunk_kernel, eps=eps,
                              add_residual=add_residual,
                              static_act=act_scales is not None),
            out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
            grid=(pl.cdiv(rows, _ROWS), hidden // hc),
            in_specs=[
                pl.BlockSpec((_ROWS, C), lambda r, k: (r, 0),
                             memory_space=pltpu.VMEM),
                vec2(C), vec2(C),                    # ln scale/bias
                pl.BlockSpec((C, hc), lambda r, k: (0, k),
                             memory_space=pltpu.VMEM),
                hvec(), hvec(),                      # s1, b1 chunks
                pl.BlockSpec((hc, C), lambda r, k: (k, 0),
                             memory_space=pltpu.VMEM),
                vec2(C), vec2(C),                    # s2, b2
                vec2(C),                             # layer-scale
                hvec(),                              # static 1/a_fc2 chunk
            ],
            out_specs=pl.BlockSpec(
                (_ROWS, C), lambda r, k: (r, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_ROWS, C), jnp.float32),  # normed input
                pltpu.VMEM((_ROWS, C), jnp.float32),  # fc2 accumulator
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=_use_interpret(),
        )(*operands)
        return out.reshape(B, N, C)

    vec = lambda n: pl.BlockSpec(  # noqa: E731
        (1, n), lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    mat = lambda s: pl.BlockSpec(  # noqa: E731
        s, lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_ln_mlp_int8_kernel, eps=eps,
                          add_residual=add_residual,
                          static_act=act_scales is not None),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        grid=(pl.cdiv(rows, _ROWS),),
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),                      # ln scale/bias
            mat((C, hidden)), vec(hidden), vec(hidden),   # w1q, s1, b1
            mat((hidden, C)), vec(C), vec(C),             # w2q, s2, b2
            vec(C),                              # layer-scale
            vec(hidden),                         # static 1/a_fc2 row
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, C), lambda r: (r, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_use_interpret(),
    )(*operands)
    return out.reshape(B, N, C)
