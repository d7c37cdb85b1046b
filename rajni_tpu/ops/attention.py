"""Multi-head self-attention ops: stock and token-pruning variants.

These are the XLA-reference implementations (pure ``jax.numpy`` /
``jax.lax``); the Pallas fused kernels in :mod:`rajni_tpu.kernels` are
drop-in replacements validated against these functions.

The pruning variant mirrors the reference ``RAJNIAttention.forward``
(`/root/reference/rajni/wrapper/attention.py:17-60`) exactly:

  * QKV is projected on the **full** incoming token set, so importance scores
    always reflect every token entering the block (attention.py:22-26 precede
    the gather at attention.py:41-43).
  * Scores are recomputed iff ``update or prev_scores is None``
    (attention.py:25-28) — resolved at trace time here because the schedule is
    static.
  * Attention itself is standard softmax SDPA over the reduced token set with
    the module's ``scale`` (attention.py:47-54), followed by the output
    projection (attention.py:55-56). Dropout paths (`proj_drop`, `attn_drop`)
    are inference-inert in the reference (eval mode, p=0) and are omitted.
  * Returns ``(out, keep_idx, next_scores)`` where ``next_scores`` is the
    surviving slice of the scores (attention.py:58-60) for reuse by a
    downstream ``update=false`` block.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from .importance import compute_importance
from .pruning import (
    gather_tokens,
    gather_tokens_matmul,
    select_tokens,
    select_tokens_dense,
)

AttnParams = Mapping[str, Any]


def _qkv_projection(x: jax.Array, params: AttnParams) -> jax.Array:
    """Packed QKV linear: ``[B, N, C] -> [B, N, 3C]``.

    Also accepts the head-aligned tensor-parallel layout
    ``kernel [C, 3, C] / bias [3, C]`` (:func:`rajni_tpu.parallel.mesh.
    repack_qkv_heads`) and then returns ``[B, N, 3, C]`` — same element
    order, one axis pre-split, so the last axis can be sharded on head
    boundaries without the packed-(q|k|v) boundary crossing a shard. Every
    consumer reshapes to ``[B, N, 3, H, D]`` anyway, so both forms are
    interchangeable downstream.
    """
    qkv = params["qkv"]
    k = qkv["kernel"]
    if k.ndim == 3:
        return jnp.einsum("bnc,cte->bnte", x, k) + qkv["bias"]
    return x @ k + qkv["bias"]


def _sdpa(
    qkv: jax.Array,
    num_heads: int,
    scale: float,
    *,
    softmax_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Unfused softmax SDPA on packed QKV ``[B, Np, 3C] -> [B, Np, C]``.

    Matches reference attention.py:47-54 (and the stock timm path for
    un-pruned blocks). TPU notes, measured on v5e:
      * heads stay in ``[B, N, H, D]`` layout — the head transposes are
        expressed inside the einsum dimension numbers, not as data movement;
      * matmul outputs follow the input dtype (the MXU accumulates in fp32
        internally either way; forcing fp32 *outputs* halves MXU throughput
        and doubles the [B,H,N,N] intermediate — observed 2078 → 2183 img/s
        on batch-256 ViT-B/16);
      * the softmax itself runs in ``softmax_dtype`` (fp32) for bf16 safety.
    """
    B, Np = qkv.shape[:2]
    three_c = math.prod(qkv.shape[2:])
    C = three_c // 3
    D = C // num_heads
    qkv = qkv.reshape(B, Np, 3, num_heads, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, Np, H, D]

    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn.astype(softmax_dtype), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(B, Np, C)


def _dispatch_sdpa(
    qkv: jax.Array, num_heads: int, scale: float, impl: str
) -> jax.Array:
    """Select the SDPA implementation: ``"xla"`` (lax reference) or
    ``"pallas"`` (:func:`rajni_tpu.kernels.attention.fused_sdpa`)."""
    if impl == "xla":
        return _sdpa(qkv, num_heads, scale)
    if impl == "pallas":
        from ..kernels.attention import fused_sdpa

        return fused_sdpa(qkv, num_heads, scale)
    raise ValueError(f"unknown attention impl {impl!r}; use 'xla' or 'pallas'")


def attention(
    x: jax.Array,
    params: AttnParams,
    num_heads: int,
    scale: float,
    impl: str = "xla",
) -> jax.Array:
    """Stock (un-pruned) multi-head self-attention on ``[B, N, C]``."""
    qkv = _qkv_projection(x, params)
    out = _dispatch_sdpa(qkv, num_heads, scale, impl)
    proj = params["proj"]
    return out @ proj["kernel"] + proj["bias"]


def pruned_attention(
    x: jax.Array,
    params: AttnParams,
    num_heads: int,
    scale: float,
    keep: int,
    update: bool,
    prev_scores: jax.Array | None,
    impl: str = "xla",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Score → select → prune → attend (reference attention.py:17-60).

    Args:
      x: ``[B, N, C]`` post-norm1 activations (full token set).
      params: ``{"qkv": {...}, "proj": {...}}``.
      num_heads, scale: head count and softmax scale.
      keep: static number of patch tokens to keep (see
        :func:`rajni_tpu.ops.pruning.keep_count`).
      update: schedule flag; recompute scores iff ``update or prev_scores is
        None`` (attention.py:25-28). Static.
      prev_scores: ``[B, N]`` scores surviving from the previous pruned block,
        or ``None``.

    Returns:
      ``(out, keep_idx, next_scores)`` with shapes ``[B, K, C]``, ``[B, K]``,
      ``[B, K]`` where ``K = keep + 1`` (CLS included).
    """
    qkv = _qkv_projection(x, params)  # full N (attention.py:22)

    if update or prev_scores is None:
        scores = compute_importance(qkv, num_heads)
    else:
        scores = prev_scores

    if impl == "pallas":
        # Sort-free selection + one-hot MXU gather: ~5x faster than XLA's
        # top_k/sort + dynamic-slice gather at these shapes, bit-identical
        # (see ops.pruning.select_tokens_dense / gather_tokens_matmul).
        keep_idx, sel = select_tokens_dense(scores, keep, qkv.dtype)
        qkv = gather_tokens_matmul(qkv, sel)
    else:
        keep_idx = select_tokens(scores, keep)
        qkv = gather_tokens(qkv, keep_idx)

    out = _dispatch_sdpa(qkv, num_heads, scale, impl)
    proj = params["proj"]
    out = out @ proj["kernel"] + proj["bias"]

    next_scores = jnp.take_along_axis(scores, keep_idx, axis=1)
    return out, keep_idx, next_scores
