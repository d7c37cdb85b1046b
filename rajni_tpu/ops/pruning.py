"""Static-shape token selection and residual-stream compaction.

The reference selects tokens dynamically at runtime
(`/root/reference/rajni/wrapper/attention.py:30-43`) but — the critical insight
for a TPU build — the *number* of kept tokens depends only on ``keep_ratio``
and the incoming token count, both compile-time constants for a fixed schedule
and resolution. Per-block shapes are therefore static; only the gather
*indices* are data-dependent. Everything in this module takes ``keep`` as a
Python int and compiles to fixed-shape ``top_k`` + ``sort`` + gather, with no
dynamic shapes and no padding tricks.

Selection contract (reference attention.py:31-39):
  * ``keep = max(1, int(keep_ratio * (N - 1)))`` — floor of ratio × *patch*
    count; CLS is excluded from the count and always kept.
  * top-k over patch scores (``scores[:, 1:]``), indices sorted ascending to
    preserve spatial order, then CLS index 0 prepended → ``[B, keep + 1]``.

Compaction contract (reference model.py:55-56): the *pre-norm* residual stream
is gathered with the same indices before the attention residual add, so dropped
tokens vanish from both the attention output and the skip path at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keep_count(
    keep_ratio: float, num_tokens: int, num_prefix: int = 1
) -> int:
    """Number of patch tokens kept by a pruned block (prefix excluded).

    Mirrors reference attention.py:31-32: ``max(1, int(keep_ratio * (N-1)))``
    with ``int()`` truncation. Pure Python — evaluated at trace time so the
    result is a static shape.

    ``num_prefix`` generalizes the reference's single always-kept CLS to the
    CLS+registers prefix of extended timm variants (the ratio applies to the
    *patch* count, exactly as the reference applies it to ``N - 1``).
    """
    num_patches = num_tokens - num_prefix
    return max(1, int(keep_ratio * num_patches))


def select_tokens(
    scores: jax.Array, keep: int, num_prefix: int = 1
) -> jax.Array:
    """Pick the ``keep`` highest-scoring patch tokens, keep the prefix,
    sort by index.

    Args:
      scores: ``[B, N]`` importance scores (positions ``< num_prefix`` are
        the CLS[+register] prefix; their scores are ignored by ranking,
        reference attention.py:34).
      keep: static number of patch tokens to keep.
      num_prefix: always-kept leading tokens (1 = the reference's CLS-only
        semantics; CLS + registers for extended variants).

    Returns:
      ``keep_idx``: ``[B, keep + num_prefix]`` int32 gather indices into the
      token axis, ascending, with the prefix indices first (reference
      attention.py:35-39).
    """
    B = scores.shape[0]
    patch_scores = scores[:, num_prefix:]
    _, idx = jax.lax.top_k(patch_scores, keep)  # [B, keep]
    idx = jnp.sort(idx, axis=1)
    prefix_idx = jnp.broadcast_to(
        jnp.arange(num_prefix, dtype=idx.dtype), (B, num_prefix)
    )
    return jnp.concatenate([prefix_idx, idx + num_prefix], axis=1)


def gather_tokens(x: jax.Array, keep_idx: jax.Array) -> jax.Array:
    """Compact the token axis of ``[B, N, ...]`` down to ``[B, K, ...]``.

    Equivalent of the reference's expanded ``torch.gather`` over dim 1
    (attention.py:42-43, model.py:55-56), expressed as ``take_along_axis`` so
    XLA lowers it to a single dynamic-gather.
    """
    idx = keep_idx.reshape(keep_idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def select_tokens_dense(
    scores: jax.Array, keep: int, dtype=None, num_prefix: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Sort-free selection: rank matrix + mask compaction (TPU fast path).

    Semantically identical to :func:`select_tokens` (same top-k set, same
    ascending order, same stable lower-index tie-break as ``lax.top_k``), but
    built from VPU-friendly dense ops instead of sorts: XLA's bitonic sort
    costs ~1.2 ms per invocation on [256, 196] (measured v5e) while the whole
    O(N²) rank computation here is a few hundred µs of elementwise work.

      1. ``rank[b, n] = #{m : s_m > s_n or (s_m == s_n and m < n)}`` over
         patch tokens — one [B, N-1, N-1] comparison tensor, reduced.
      2. ``keep_mask = rank < keep``, CLS prepended (always kept).
      3. ``pos = cumsum(keep_mask) - 1`` assigns each kept token its output
         slot — ascending order falls out of the cumsum for free.
      4. The selection matrix ``sel[b, k, n] = (pos[b, n] == k) & keep_mask``
         doubles as the one-hot gather operand (:func:`gather_tokens_matmul`),
         and ``keep_idx = sel @ iota`` recovers integer indices exactly.

    ``num_prefix`` always-kept leading tokens (CLS + registers) generalize
    the reference's CLS-only rule — they occupy the first ``num_prefix``
    output slots and are never ranked.

    Returns:
      ``(keep_idx [B, keep+num_prefix] int32, sel [B, keep+num_prefix, N]
      dtype)``.
    """
    B, N = scores.shape
    if dtype is None:
        dtype = scores.dtype
    # patch scores (the prefix is never ranked)
    p = scores[:, num_prefix:].astype(jnp.float32)
    n = N - num_prefix

    ahead = p[:, :, None] < p[:, None, :]  # [B, n(self), n(other)]
    iota_self = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    iota_other = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    ties_ahead = (p[:, :, None] == p[:, None, :]) & (iota_other < iota_self)
    rank = (ahead | ties_ahead).sum(axis=2)  # [B, n]

    keep_mask = jnp.concatenate(
        [jnp.ones((B, num_prefix), bool), rank < keep], axis=1
    )  # [B, N] with the prefix always kept
    pos = jnp.cumsum(keep_mask.astype(jnp.int32), axis=1) - 1  # output slot

    iota_k = jax.lax.broadcasted_iota(
        jnp.int32, (1, keep + num_prefix, 1), 1
    )
    sel = (
        (pos[:, None, :] == iota_k) & keep_mask[:, None, :]
    ).astype(dtype)  # [B, keep+1, N]

    iota_n = jax.lax.broadcasted_iota(jnp.float32, (1, N, 1), 1)
    keep_idx = (
        jax.lax.dot_general(
            sel.astype(jnp.float32), jnp.broadcast_to(iota_n, (B, N, 1)),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        )[..., 0]
    ).astype(jnp.int32)
    return keep_idx, sel


def _float_order_key(x: jax.Array) -> jax.Array:
    """Order-preserving map fp32 → uint32 (``a < b ⇔ key(a) < key(b)``).

    Standard radix-sort transform: positive floats keep their bit pattern
    with the sign bit set; negatives are bitwise-complemented. Assumes no
    NaNs (importance scores are softmax × sigmoid products).
    """
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(
        x >= 0, u | jnp.uint32(0x80000000), ~u
    )


def select_tokens_radix(
    scores: jax.Array, keep: int, dtype=None
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k selection via per-row radix threshold search — no
    ``[B, N, N]`` tensors, identical outputs to :func:`select_tokens_dense`.

    Finds the k-th largest score with a 32-step binary search over the
    order-preserving uint32 key space (:func:`_float_order_key`) — 32 fused
    ``[B, N]`` compare+reduce passes, O(N) memory — then resolves threshold
    ties by ascending index (cumsum), which is exactly ``lax.top_k``'s
    stable lower-index-wins tie-break. CLS (token 0) is always kept, never
    ranked (reference attention.py:34-39).

    Measured on v5e (dispatch-floor-corrected): parity with
    :func:`select_tokens_dense` at both [256, 197] and [128, 577] — both
    are well under 1 ms, far off the critical path — so the default stays
    the rank-matrix version and this is the O(N)-memory alternative for
    sequences long enough that [B, N, N] comparison tensors stop fitting
    (N ≳ 2k; no BASELINE config needs it yet).

    Returns ``(keep_idx [B, keep+1] int32, sel [B, keep+1, N] dtype)``.
    """
    B, N = scores.shape
    if dtype is None:
        dtype = scores.dtype
    key = _float_order_key(scores[:, 1:])  # patch tokens only

    # largest threshold T with count(key >= T) >= keep  ⇒  T = k-th largest
    prefix = jnp.zeros((B, 1), jnp.uint32)
    for b in range(31, -1, -1):
        cand = prefix | jnp.uint32(1 << b)
        cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=1, keepdims=True)
        prefix = jnp.where(cnt >= keep, cand, prefix)

    greater = key > prefix
    ties = key == prefix
    cnt_gt = jnp.sum(greater.astype(jnp.int32), axis=1, keepdims=True)
    tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)
    kept_patches = greater | (ties & (tie_rank <= keep - cnt_gt))

    keep_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), kept_patches], axis=1
    )  # [B, N] with CLS always kept
    pos = jnp.cumsum(keep_mask.astype(jnp.int32), axis=1) - 1
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, keep + 1, 1), 1)
    sel = (
        (pos[:, None, :] == iota_k) & keep_mask[:, None, :]
    ).astype(dtype)
    iota_n = jax.lax.broadcasted_iota(jnp.float32, (1, N, 1), 1)
    keep_idx = (
        jax.lax.dot_general(
            sel.astype(jnp.float32), jnp.broadcast_to(iota_n, (B, N, 1)),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        )[..., 0]
    ).astype(jnp.int32)
    return keep_idx, sel


def onehot_matrix(keep_idx: jax.Array, n: int, dtype) -> jax.Array:
    """Selection matrix ``[B, K, N]`` with ``S[b, k, keep_idx[b, k]] = 1``.

    0/1 values are exact in every float dtype, so ``S @ x`` reproduces a
    gather bit-exactly (each output row sums exactly one input row).
    """
    iota = jax.lax.broadcasted_iota(keep_idx.dtype, (1, 1, n), 2)
    return (keep_idx[:, :, None] == iota).astype(dtype)


def gather_tokens_matmul(x: jax.Array, sel: jax.Array) -> jax.Array:
    """Token gather as an MXU matmul: ``[B, K, N] @ [B, N, C] -> [B, K, C]``.

    XLA lowers ``take_along_axis`` on TPU to a serial per-row dynamic-slice
    loop (measured 3.7 ms for the batch-256 ViT-B QKV gather); a batched
    one-hot contraction runs on the MXU instead (~0.5 ms) and is bit-exact
    (see :func:`onehot_matrix`). Used by the ``impl="pallas"`` fast path; the
    ``sel`` matrix is built once per pruned block and reused for the QKV and
    residual-stream gathers (reference attention.py:42-43 + model.py:55-56).
    """
    return jax.lax.dot_general(
        sel, x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
