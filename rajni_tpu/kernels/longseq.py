"""Long-sequence (ViT-B/384, N=577) fully-fused pruned attention block.

The N=197 mega-kernel (:func:`rajni_tpu.kernels.block.fused_pruned_attn_block`)
holds the whole packed QKV, the [N, N] selection masks, and the fp32 logits
in VMEM at once — ~2.5× over budget at N=577. This module is the
token-chunked re-derivation (VERDICT r1 next-round #4): every O(N²) or
O(N·3C) fp32 value is produced in ≤128-row chunks, while the two big bf16
operands (the packed QKV and the gathered QKV) live in persistent VMEM
scratch. The [B, N, 3C] QKV — 340 MB per block at batch 128 — never reaches
HBM.

Phase structure per image (grid ``(B, nq)``, ``nq = ceil(K / 128)`` query
chunks, second axis ``arbitrary``):

  q == 0 (once per image):
    1. LN1 + QKV projection in 128-row chunks → ``qkv_buf`` (bf16 scratch).
    2. RAJNI importance from the bf16 scratch slices (fp32 softmax/stats —
       bit-identical to scoring the bf16-materialized QKV, since the MXU
       accumulates bf16 operands in fp32 exactly like a cast would).
       Reference semantics: importance.py:14-34 at N=577.
    3. Sort-free top-K selection with the rank/prefix rows accumulated over
       128-token chunks (the [N, N] one-shot masks of
       ``block._select_from_scores`` become five [128, N] passes).
    4. One-hot gather of QKV and of the pre-norm residual in 128-row chunks
       → ``qkv_g``/``x_g`` scratch + the threaded next-scores output.
  every q:
    5. SDPA on query rows ``[128, :]`` against all K keys (fp32 logits are
       [128, K], not [K, K]), output projection, compacted residual add.

Semantics are pinned to the two-kernel path by
``tests/test_kernels.py::test_longseq_block_matches_two_kernel_path``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _VMEM_BUDGET, _layer_norm_f32
from .math import use_interpret as _use_interpret

_RC = 128  # row chunk for LN/QKV, selection, gather, and SDPA queries


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _row_chunks(n: int):
    """Static (start, size) tiles of 128 covering ``n`` rows exactly."""
    return [(s, min(_RC, n - s)) for s in range(0, n, _RC)]


def _importance_row_chunked(qkv_buf, N: int, num_heads: int,
                            eps: float = 1e-6):
    """[1, N] fp32 RAJNI importance from the bf16 ``[N8, 3C]`` QKV scratch.

    Identical math to ``block._importance_f32`` (CLS attention × sigmoid
    z-score of centered head-mean value norms, unbiased std, eps on std) but
    reading bf16 slices directly — no [N, 3C] fp32 materialization.
    """
    three_c = qkv_buf.shape[-1]
    C = three_c // 3
    D = C // num_heads
    H = num_heads
    inv_sqrt_d = 1.0 / math.sqrt(D)

    # CLS attention over all heads: one [H, C] @ [C, N] MXU matmul.
    head_of_c = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // D
    head_row = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    cls_q = qkv_buf[0:1, 0:C].astype(jnp.float32)
    q_rows = jnp.where(
        head_of_c == head_row, jnp.broadcast_to(cls_q, (H, C)), 0.0
    ).astype(qkv_buf.dtype)
    logits = jax.lax.dot_general(
        q_rows, qkv_buf[0:N, C:2 * C], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_d  # [H, N]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
    a_cls = jnp.mean(p, axis=0, keepdims=True)  # [1, N]

    # head-mean value norms: [N, C] @ [C, D] with a stacked-identity operand.
    # The head-mean runs in fp32 with f32(1/H) folded into the summation
    # matrix (same term order as block._importance_f32 — bf16(1/H) would
    # perturb every norm by ~0.4% and could flip selection ties).
    dim_of_c = jax.lax.broadcasted_iota(jnp.int32, (C, D), 0) % D
    dim_col = jax.lax.broadcasted_iota(jnp.int32, (C, D), 1)
    vsum = jnp.where(dim_of_c == dim_col, 1.0, 0.0).astype(qkv_buf.dtype)
    V = jax.lax.dot_general(
        qkv_buf[0:N, 2 * C:].astype(jnp.float32),
        # fold f32(1/H) per-TERM inside the dot — the order
        # block._importance_f32 uses; applying 1/H once after the exact
        # sum is NOT bit-equal when H isn't a power of two (ViT-B H=12)
        vsum.astype(jnp.float32) * jnp.float32(1.0 / H),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, D] fp32
    V = V - jnp.mean(V, axis=0, keepdims=True)
    vn = jnp.sqrt(jnp.sum(V * V, axis=1, keepdims=True))  # [N, 1]
    mu = jnp.mean(vn)
    var = jnp.sum(jnp.square(vn - mu)) / (N - 1)
    std = jnp.sqrt(var) + eps
    z = jax.nn.sigmoid((vn - mu) / std)  # [N, 1]

    # a_cls is a row, z a column: fold z into the row with one chunked pass.
    out = a_cls
    zs = []
    for m0, mc in _row_chunks(N):
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (mc, N), 1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (mc, N), 0) + m0
        eye = (iota_l == iota_s).astype(jnp.float32)
        zs.append(jnp.sum(
            eye * jnp.broadcast_to(z[m0:m0 + mc], (mc, N)),
            axis=0, keepdims=True,
        ))
    z_row = sum(zs)
    return out * z_row  # [1, N]


def _select_rows_chunked(s_row, N: int, K: int):
    """Chunked sort-free selection: ``[1, N]`` scores → per-token kept mask
    and output-slot prefix rows (same rank semantics / tie-breaks as
    ``block._select_from_scores``, peak value [128, N] instead of [N, N])."""
    sc = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) == 0, jnp.inf, s_row
    )
    rank = jnp.zeros((1, N), jnp.float32)
    for m0, mc in _row_chunks(N):
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (mc, N), 1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (mc, N), 0) + m0
        eye = (iota_l == iota_s).astype(jnp.float32)
        # jnp.where, NOT eye * sc: the CLS sentinel is +inf and
        # 0 * inf = NaN would poison every other token's score — only a
        # non-guaranteed XLA simplifier rewrite saved the multiply form
        # (block._select_from_scores uses where for the same reason)
        col = jnp.sum(
            jnp.where(iota_l == iota_s, jnp.broadcast_to(sc, (mc, N)), 0.0),
            axis=1, keepdims=True,
        )  # [mc, 1] scores of tokens m0..m0+mc
        ahead = (col > sc).astype(jnp.float32)
        ties = ((col == sc) & (iota_s < iota_l)).astype(jnp.float32)
        rank = rank + jnp.sum(
            jnp.maximum(ahead, ties), axis=0, keepdims=True
        )
    kept = (rank < K).astype(jnp.float32)  # [1, N]

    prefix = jnp.zeros((1, N), jnp.float32)
    for m0, mc in _row_chunks(N):
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (mc, N), 1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (mc, N), 0) + m0
        eye = (iota_l == iota_s).astype(jnp.float32)
        kept_col = jnp.sum(
            eye * jnp.broadcast_to(kept, (mc, N)), axis=1, keepdims=True
        )
        prefix = prefix + jnp.sum(
            jnp.broadcast_to(kept_col, (mc, N))
            * (iota_s <= iota_l).astype(jnp.float32),
            axis=0, keepdims=True,
        )
    return kept, prefix


def _longseq_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ls_ref, pscores_ref, out_ref, ns_ref, qkv_buf, qkvg_buf, xg_buf,
    *, num_heads: int, scale: float, eps: float, with_scores: bool,
    N: int, K: int,
):
    q = pl.program_id(1)
    dtype = x_ref.dtype
    three_c = qkv_buf.shape[-1]
    C = three_c // 3
    D = C // num_heads

    @pl.when(q == 0)
    def _():
        # ---- 1. LN1 + QKV in row chunks → qkv_buf ----
        for r0, rc in _row_chunks(N):
            x32 = x_ref[0, r0:r0 + rc, :].astype(jnp.float32)
            y = _layer_norm_f32(x32, lns_ref, lnb_ref, eps).astype(dtype)
            qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32)
            qkv_buf[r0:r0 + rc, :] = (
                qkv + bqkv_ref[:].astype(jnp.float32)
            ).astype(dtype)

        # ---- 2. importance / threaded-score row ----
        if with_scores:
            s_row = _importance_row_chunked(qkv_buf, N, num_heads)
        else:
            s_row = pscores_ref[0, 0:1, :]  # [1, N] fp32 row input

        # ---- 3. chunked sort-free selection ----
        kept, prefix = _select_rows_chunked(s_row, N, K)

        # ---- 4. chunked one-hot gather of qkv, x, and next-scores ----
        for k0, kc in _row_chunks(K):
            iota_k = (
                jax.lax.broadcasted_iota(jnp.int32, (kc, 1), 0) + k0
            ).astype(jnp.float32)
            sel = (
                jnp.broadcast_to(prefix - 1.0, (kc, N)) == iota_k
            ).astype(jnp.float32) * jnp.broadcast_to(kept, (kc, N))
            sel_t = sel.astype(dtype)
            qkvg_buf[k0:k0 + kc, :] = jax.lax.dot_general(
                sel_t, qkv_buf[0:N, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            xg_buf[k0:k0 + kc, :] = jax.lax.dot_general(
                sel_t, x_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            ns_ref[0, k0:k0 + kc, :] = jnp.sum(
                sel * jnp.broadcast_to(s_row, (kc, N)),
                axis=1, keepdims=True,
            )

    # ---- 5. SDPA on this query chunk against all K keys ----
    q0 = q * _RC
    outs = []
    for h in range(num_heads):
        qh = qkvg_buf[pl.ds(q0, _RC), h * D:(h + 1) * D]
        kh = qkvg_buf[0:K, C + h * D:C + (h + 1) * D]
        vh = qkvg_buf[0:K, 2 * C + h * D:2 * C + (h + 1) * D]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [RC, K]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
        outs.append(
            jax.lax.dot_general(
                p.astype(dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(outs, axis=-1).astype(dtype)
    out = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[:].astype(jnp.float32)
    out = out * ls_ref[:].astype(jnp.float32)
    out_ref[0] = (
        xg_buf[pl.ds(q0, _RC), :].astype(jnp.float32) + out
    ).astype(out_ref.dtype)


def longseq_block_fits(N: int, K: int, C: int, itemsize: int) -> bool:
    """VMEM estimate: persistent scratch + resident weights + the largest
    chunked transients. True for ViT-B at N=577 (≈14 MB), false when even
    chunking cannot help (e.g. ViT-L/384)."""
    n8 = _round_up(N, 8)
    k_pad = _round_up(K, _RC)
    scratch = (n8 * 3 * C + k_pad * 3 * C + k_pad * C) * itemsize
    weights = 4 * C * C * itemsize
    io = 2 * (N * C + _RC * C + 2 * N) * itemsize
    transient = _RC * 3 * C * 4 + 2 * _RC * N * 4 + _RC * K * 4
    return scratch + weights + io + transient <= _VMEM_BUDGET


@functools.partial(
    jax.jit, static_argnames=("num_heads", "keep", "scale", "eps",
                              "with_scores")
)
def fused_pruned_attn_block_long(
    x: jax.Array,
    ln_params,
    attn_params,
    ls: jax.Array | None,
    prev_scores: jax.Array | None,
    num_heads: int,
    keep: int,
    scale: float,
    eps: float = 1e-6,
    with_scores: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Token-chunked whole-pruned-block attention half for long sequences.

    Drop-in equal to :func:`rajni_tpu.kernels.block.fused_pruned_attn_block`
    (same signature, same semantics) for any N whose chunked footprint fits
    (:func:`longseq_block_fits`); callers pick it when the one-shot
    mega-kernel does not fit. Returns ``(x_out [B, K, C], next_scores
    [B, K])`` with ``K = keep + 1``.
    """
    B, N, C = x.shape
    K = keep + 1
    wqkv = attn_params["qkv"]["kernel"]
    wproj = attn_params["proj"]["kernel"]
    if ls is None:
        ls = jnp.ones((C,), x.dtype)
    if prev_scores is None:
        prev_scores = jnp.zeros((B, N), jnp.float32)
    # threaded scores enter as an 8-sublane replicated ROW block (the [N, 1]
    # column form would need an [N, N] eye-reduce to transpose in-kernel)
    pscores = jnp.broadcast_to(prev_scores[:, None, :], (B, 8, N))

    n8 = _round_up(N, 8)
    k_pad = _round_up(K, _RC)
    nq = k_pad // _RC

    out, ns = pl.pallas_call(
        functools.partial(
            _longseq_kernel, num_heads=num_heads, scale=scale, eps=eps,
            with_scores=with_scores, N=N, K=K,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, C), x.dtype),
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
        ),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _RC, C), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n8, 3 * C), x.dtype),     # packed QKV
            pltpu.VMEM((k_pad, 3 * C), x.dtype),  # gathered QKV
            pltpu.VMEM((k_pad, C), x.dtype),      # gathered residual
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
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
        pscores,
    )
    return out, ns[..., 0]
