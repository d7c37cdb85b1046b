"""Residual-emitting fused forward kernels for the TRAINING path.

The inference kernels in :mod:`rajni_tpu.kernels.block` /
:mod:`rajni_tpu.kernels.mlp` deliberately keep every intermediate in VMEM —
nothing reaches HBM, so there is nothing for a backward pass to consume.
These variants run the same fused math but additionally *emit the backward's
residuals*:

  * :func:`train_attn_block` — the stock attention half
    (``x1 = x + ls1·proj(mhsa(qkv(ln1(x))))``) also writes the post-bias
    packed ``qkv`` ``[B, N, 3C]``. The backward recovers everything else it
    needs from ``(x, qkv, x1)`` with only elementwise + O(N²·C) SDPA
    recompute — the 6NC² QKV and 2NC² proj matmuls are never recomputed.
  * :func:`train_ln_mlp` — the MLP half (``y = x1 + ls2·fc2(gelu(fc1(
    ln2(x1))))``) also writes the pre-GELU hidden ``h`` ``[B, N, 4C]``. The
    backward recomputes only ``gelu(h)`` (VPU) — fc1/fc2 (16NC², the FLOPs
    bulk of the block) are never recomputed.

Together with the block inputs these residuals let
:mod:`rajni_tpu.models.train_path` define a ``jax.custom_vjp`` whose
backward is pure XLA *backward* work (the big dW/dx GEMMs XLA already runs
at ~50% MFU) while the forward runs at fused-kernel MFU (~70%) — unlike a
``jax.checkpoint`` remat, no full forward recompute appears in the backward.

Extra HBM traffic vs the inference kernels (ViT-B/224, bf16): qkv 0.9 MB +
h 1.2 MB per image per block ≈ 25 MB/image across 12 blocks — ~12% of HBM
bandwidth at 4k img/s, the price of skipping a 35 GFLOP/image recompute.

The reference is torch autograd over the unfused module graph
(`/root/reference/rajni/wrapper/model.py:41-63` under the trainer the
checkpoints came from); this is the TPU-native equivalent of its fused
training libraries (flash-attention-style saved-stats backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _VMEM_BUDGET, _layer_norm_f32, _mha_any, _sdpa_mode
from .math import gelu_fast
from .math import use_interpret as _use_interpret



# --------------------------------------------------------------------------
# Stock attention half, emitting qkv
# --------------------------------------------------------------------------


def _train_attn_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ls_ref, out_ref, qkv_ref, *scr, num_heads: int, scale: float,
    eps: float, seq: int,
):
    rows = x_ref.shape[1]
    x32 = x_ref[0].astype(jnp.float32)
    y = _layer_norm_f32(x32, lns_ref, lnb_ref, eps).astype(x_ref.dtype)
    qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    # The backward consumes the same rounded values the SDPA sees.
    qkv_ref[0] = qkv
    attns = [
        _mha_any(qkv[g:g + seq, :], num_heads, scale, x_ref.dtype,
                 scr[0] if scr else None)
        for g in range(0, rows, seq)
    ]
    attn = attns[0] if len(attns) == 1 else jnp.concatenate(attns, axis=0)
    out = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[:].astype(jnp.float32)
    out = out * ls_ref[:].astype(jnp.float32)
    out_ref[0] = (x32 + out).astype(out_ref.dtype)


def _train_attn_fits(N: int, C: int, itemsize: int) -> bool:
    """VMEM estimate at G=1: double-buffered IO (x in, x1 out, qkv out) +
    resident weights + the fp32 qkv/SDPA live set."""
    io = 2 * (2 * N * C + N * 3 * C) * itemsize
    weights = 4 * C * C * itemsize
    live = N * 3 * C * 4 + N * N * 4 + 2 * N * C * 4
    return io + weights + live <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "eps"))
def train_attn_block(
    x: jax.Array,
    ln_params,
    attn_params,
    ls: jax.Array | None,
    num_heads: int,
    scale: float,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Stock attention half returning ``(x1, qkv)``.

    Same math as :func:`rajni_tpu.kernels.block.fused_attn_block`; the
    packed post-bias QKV additionally lands in HBM for the backward.
    """
    B, N, C = x.shape
    wqkv = attn_params["qkv"]["kernel"]
    wproj = attn_params["proj"]["kernel"]
    if ls is None:
        ls = jnp.ones((C,), x.dtype)

    scratch = (
        [pltpu.VMEM((3, num_heads, N, C // num_heads), x.dtype)]
        if _sdpa_mode() == "hmajor" else []
    )
    vec = lambda n: pl.BlockSpec(  # noqa: E731
        (1, n), lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    mat = lambda s: pl.BlockSpec(  # noqa: E731
        s, lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    x1, qkv = pl.pallas_call(
        functools.partial(
            _train_attn_kernel, num_heads=num_heads, scale=scale, eps=eps,
            seq=N,
        ),
        scratch_shapes=scratch,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, N, 3 * C), x.dtype),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),               # ln scale/bias
            mat((C, 3 * C)), vec(3 * C),  # qkv
            mat((C, C)), vec(C),          # proj
            vec(C),                       # layer-scale
        ],
        out_specs=(
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * (3 * C + C)
            + 4 * B * num_heads * N * N * (C // num_heads),
            bytes_accessed=(2 + 3) * B * N * C * x.dtype.itemsize
            + 4 * C * C * wqkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_use_interpret(),
    )(
        x,
        ln_params["scale"].reshape(1, C),
        ln_params["bias"].reshape(1, C),
        wqkv,
        attn_params["qkv"]["bias"].reshape(1, 3 * C),
        wproj,
        attn_params["proj"]["bias"].reshape(1, C),
        ls.reshape(1, C),
    )
    return x1, qkv


# --------------------------------------------------------------------------
# MLP half, emitting the pre-GELU hidden
# --------------------------------------------------------------------------


def _train_ln_mlp_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ls_ref, out_ref, h_ref, *, eps: float, add_residual: bool = True,
):
    x32 = x_ref[0].astype(jnp.float32)  # [RC, C] token chunk (LN is per-row)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(
        jnp.float32
    )
    h = jnp.dot(
        y.astype(x_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    )
    h = h + b1_ref[:].astype(jnp.float32)
    # Backward recomputes gelu'(h) from the same rounded values.
    h_rounded = h.astype(h_ref.dtype)
    h_ref[0] = h_rounded
    hg = gelu_fast(h_rounded.astype(jnp.float32))
    out = jnp.dot(
        hg.astype(x_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32
    )
    out = (out + b2_ref[:].astype(jnp.float32)) * ls_ref[:].astype(
        jnp.float32
    )
    out_ref[0] = ((x32 + out) if add_residual else out).astype(out_ref.dtype)


_MLP_TOKEN_CHUNK = 128  # token-axis tile of the train MLP kernel


def train_mlp_fits(C: int, hidden: int, itemsize: int) -> bool:
    """Weights fully VMEM-resident + double-buffered token-chunk IO incl.
    the h output. The hidden-streamed variant is not implemented for
    training — past this budget (ViT-L bf16 and up) the MLP half runs the
    same math in XLA with ``h`` still saved
    (:func:`rajni_tpu.models.train_path._mlp_half`)."""
    rc = _MLP_TOKEN_CHUNK
    weights = 2 * C * hidden * itemsize
    io = 2 * (2 * rc * C + rc * hidden) * itemsize
    live = rc * (C + hidden) * 4
    return weights + io + live <= _VMEM_BUDGET


# --------------------------------------------------------------------------
# Fused SDPA backward (flash-attention-style saved-qkv backward)
# --------------------------------------------------------------------------


def _sdpa_bwd_kernel(
    qkv_ref, dout_ref, ao_ref, dqkv_ref, *, num_heads: int, scale: float
):
    """Per-image SDPA forward-recompute + backward, everything in VMEM.

    Differentiates exactly the fused forward kernels' SDPA math
    (:func:`rajni_tpu.kernels.block._mha`): fp32 logits/softmax, bf16
    probability matrix into the AV matmul. Emits the recomputed attention
    output (the proj weight-grad needs it) and the packed ``d_qkv`` —
    both already in the ``[K, 3C]`` layout the surrounding XLA GEMMs
    consume, so none of the ``[B, K, 3, H, D]`` relayout copies of the
    XLA einsum backward appear (profiled at ~13 ms/step on the batch-128
    ViT-B kernel train step — scripts/profile_train.py)."""
    qkv = qkv_ref[0]
    dout = dout_ref[0]
    three_c = qkv.shape[1]
    C = three_c // 3
    D = C // num_heads
    outs, dqs, dks, dvs = [], [], [], []
    for h in range(num_heads):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, C + h * D:C + (h + 1) * D]
        v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
        do = dout[:, h * D:(h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p32 = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        pb = p32.astype(qkv.dtype)
        outs.append(jax.lax.dot_general(
            pb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        # dv = pbᵀ @ do ; dp = do @ vᵀ ; softmax vjp in fp32
        dvs.append(jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        dsb = (ds * scale).astype(qkv.dtype)
        dqs.append(jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    ao_ref[0] = jnp.concatenate(outs, axis=-1).astype(ao_ref.dtype)
    dqkv_ref[0] = jnp.concatenate(
        dqs + dks + dvs, axis=-1
    ).astype(dqkv_ref.dtype)


def train_sdpa_bwd_fits(K: int, C: int, itemsize: int) -> bool:
    """VMEM estimate: double-buffered IO (qkv + dout in, ao + dqkv out) +
    the fp32 per-head [K, K] live set + the across-head fp32 result lists.
    N=197 classes fit easily (~8 MB); N=577 does not (~28 MB) — callers
    fall back to the XLA einsum backward."""
    io = 2 * (2 * K * 3 * C + 2 * K * C) * itemsize
    lists = 4 * K * C * 4
    live = 5 * K * K * 4
    return io + lists + live <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("num_heads", "scale"))
def train_sdpa_bwd(
    qkv: jax.Array,
    dout: jax.Array,
    num_heads: int,
    scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Fused SDPA fwd-recompute + backward: ``(qkv [B,K,3C], d_out
    [B,K,C]) -> (attn_out [B,K,C], d_qkv [B,K,3C])``.

    ``d_out`` is the cotangent at the SDPA output (after the proj
    backward GEMM); ``attn_out`` is the recomputed forward output the
    caller's proj weight-grad consumes. Callers must pre-check
    :func:`train_sdpa_bwd_fits`."""
    B, K, three_c = qkv.shape
    C = three_c // 3
    return pl.pallas_call(
        functools.partial(
            _sdpa_bwd_kernel, num_heads=num_heads, scale=scale
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, K, three_c), qkv.dtype),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, three_c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, three_c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            # 7 [K,K]x[K,D]-class matmuls per head: qk, av recompute,
            # dv, dp, dq, dk (+ the ds elementwise pass)
            flops=2 * 6 * B * num_heads * K * K * (C // num_heads),
            bytes_accessed=2 * (B * K * 3 * C + B * K * C)
            * qkv.dtype.itemsize,
            transcendentals=B * num_heads * K * K,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_use_interpret(),
    )(qkv, dout)


@functools.partial(jax.jit, static_argnames=("eps", "add_residual"))
def train_ln_mlp(
    x: jax.Array,
    ln_params,
    mlp_params,
    ls: jax.Array | None = None,
    eps: float = 1e-6,
    add_residual: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """``x + ls·mlp(ln2(x))`` returning ``(y, h)`` with ``h`` the pre-GELU
    fc1 output ``[B, N, hidden]`` (stored in the activation dtype — the
    backward's ``gelu'`` is evaluated on exactly these rounded values).
    ``add_residual=False`` returns the branch only (a tensor-parallel
    shard's PARTIAL sum when called with local fc1/fc2 shards and a
    zeroed fc2 bias — the residual, real bias and layer-scale apply once
    after the psum, :mod:`rajni_tpu.parallel.tp_train`).

    Grid is ``(B, token-chunks)`` on the native ``[B, N, C]`` layout —
    unlike the inference kernel's row-flattening, no ``[B,N,C] → [B·N,C]``
    re-tiling copy appears at the custom-call boundary (profiled at
    ~30 ms/step of pure reshape on the batch-128 train step before this
    layout). LayerNorm and the MLP are per-token, so token-chunking is
    exact; the last partial chunk is masked by the pipeline."""
    B, N, C = x.shape
    w1 = mlp_params["fc1"]["kernel"]
    w2 = mlp_params["fc2"]["kernel"]
    hidden = w1.shape[1]
    if ls is None:
        ls = jnp.ones((C,), x.dtype)

    # Adaptive chunk: minimal padded rows for the chunk count the cap
    # forces, rounded to the bf16 sublane tile. A fixed rc=128 pads the
    # pruned widths brutally (150 tokens -> 2x128 = 256 computed rows);
    # balancing gives 2x80 = 160 (rows: 197->2x112, 187->2x96, 150->2x80,
    # 127->1x128 — measured on the train bench as part of the kernel-path
    # win).
    n_chunks = pl.cdiv(N, _MLP_TOKEN_CHUNK)
    per_chunk = -(-N // n_chunks)
    rc = min(-(-per_chunk // 16) * 16, _MLP_TOKEN_CHUNK)
    vec = lambda: pl.BlockSpec(  # noqa: E731
        (1, C), lambda b, r: (0, 0), memory_space=pltpu.VMEM
    )
    y, h = pl.pallas_call(
        functools.partial(_train_ln_mlp_kernel, eps=eps,
                          add_residual=add_residual),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, N, hidden), x.dtype),
        ),
        grid=(B, pl.cdiv(N, rc)),
        in_specs=[
            pl.BlockSpec((1, rc, C), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            vec(),  # ln scale
            vec(),  # ln bias
            pl.BlockSpec((C, hidden), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(),  # fc2 bias
            vec(),  # layer-scale
        ],
        out_specs=(
            pl.BlockSpec((1, rc, C), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rc, hidden), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * C * hidden,
            bytes_accessed=(2 * B * N * C + B * N * hidden)
            * x.dtype.itemsize + 2 * C * hidden * w1.dtype.itemsize,
            transcendentals=B * N * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_use_interpret(),
    )(
        x,
        ln_params["scale"].reshape(1, C),
        ln_params["bias"].reshape(1, C),
        w1,
        mlp_params["fc1"]["bias"].reshape(1, hidden),
        w2,
        mlp_params["fc2"]["bias"].reshape(1, C),
        ls.reshape(1, C),
    )
    return y, h
