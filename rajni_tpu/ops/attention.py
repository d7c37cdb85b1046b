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


def _head_layer_norm(
    x: jax.Array, params: AttnParams, eps: float
) -> jax.Array:
    """Per-head LayerNorm over the head dim (timm ``qk_norm``): ``x`` is
    ``[..., D]``, ``params`` carries ``scale``/``bias`` of shape ``[D]``.
    Statistics in fp32, like :func:`rajni_tpu.models.vit.layer_norm`."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return y.astype(dtype)


def apply_qk_norm(
    q: jax.Array, k: jax.Array, params: AttnParams, eps: float
) -> tuple[jax.Array, jax.Array]:
    """Apply the block's per-head q/k LayerNorms when present (timm
    ``qk_norm=True`` variants; ViT-22B style). ``q``/``k`` are ``[..., D]``;
    no-op for classic checkpoints (no ``q_norm`` key).

    The reference would silently *drop* these in pruned blocks (its
    RAJNIAttention steals only ``qkv``/``proj``, attention.py:8-12, noted in
    SURVEY.md §2/C2) — modeled correctly here instead, on every path the
    real attention takes.
    """
    if "q_norm" not in params:
        return q, k
    q = _head_layer_norm(q, params["q_norm"], eps)
    k = _head_layer_norm(k, params["k_norm"], eps)
    return q, k


def _sdpa(
    qkv: jax.Array,
    num_heads: int,
    scale: float,
    *,
    softmax_dtype: jnp.dtype = jnp.float32,
    qk_norm: tuple[AttnParams, float] | None = None,
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
    if qk_norm is not None:
        q, k = apply_qk_norm(q, k, *qk_norm)

    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn.astype(softmax_dtype), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(B, Np, C)


def _dispatch_sdpa(
    qkv: jax.Array, num_heads: int, scale: float, impl: str,
    qk_norm: tuple[AttnParams, float] | None = None,
) -> jax.Array:
    """Select the SDPA implementation: ``"xla"`` (lax reference) or
    ``"pallas"`` (:func:`rajni_tpu.kernels.attention.fused_sdpa`). qk-normed
    variants always take the lax path (the fused kernel does not implement
    the per-head norms; :func:`rajni_tpu.models.vit.vit_forward` demotes the
    whole block anyway)."""
    if impl == "xla" or qk_norm is not None:
        return _sdpa(qkv, num_heads, scale, qk_norm=qk_norm)
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
    norm_eps: float = 1e-6,
) -> jax.Array:
    """Stock (un-pruned) multi-head self-attention on ``[B, N, C]``.

    Applies the per-head q/k LayerNorms when ``params`` carries them
    (timm ``qk_norm`` variants; ``norm_eps`` is their eps)."""
    qkv = _qkv_projection(x, params)
    qk = (params, norm_eps) if "q_norm" in params else None
    out = _dispatch_sdpa(qkv, num_heads, scale, impl, qk_norm=qk)
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
    num_prefix: int = 1,
    norm_eps: float = 1e-6,
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
      num_prefix: always-kept leading tokens (1 = the reference's CLS-only
        semantics; CLS + registers for extended timm variants).
      norm_eps: eps of the per-head q/k LayerNorms, applied when ``params``
        carries them (timm ``qk_norm`` variants; both the real attention and
        the importance scorer's CLS row see the normed q/k — the scorer
        follows the attention the model actually computes).

    Returns:
      ``(out, keep_idx, next_scores)`` with shapes ``[B, K, C]``, ``[B, K]``,
      ``[B, K]`` where ``K = keep + num_prefix`` (prefix included).
    """
    qkv = _qkv_projection(x, params)  # full N (attention.py:22)
    qk = (params, norm_eps) if "q_norm" in params else None

    if update or prev_scores is None:
        scores = compute_importance(qkv, num_heads, qk_norm=qk)
    else:
        scores = prev_scores

    if impl == "pallas" and qk is None:
        # Sort-free selection + one-hot MXU gather: ~5x faster than XLA's
        # top_k/sort + dynamic-slice gather at these shapes, bit-identical
        # (see ops.pruning.select_tokens_dense / gather_tokens_matmul).
        keep_idx, sel = select_tokens_dense(
            scores, keep, qkv.dtype, num_prefix
        )
        qkv = gather_tokens_matmul(qkv, sel)
    else:
        keep_idx = select_tokens(scores, keep, num_prefix)
        qkv = gather_tokens(qkv, keep_idx)

    out = _dispatch_sdpa(qkv, num_heads, scale, impl, qk_norm=qk)
    proj = params["proj"]
    out = out @ proj["kernel"] + proj["bias"]

    next_scores = jnp.take_along_axis(scores, keep_idx, axis=1)
    return out, keep_idx, next_scores
