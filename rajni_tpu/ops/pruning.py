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


def keep_count(keep_ratio: float, num_tokens: int) -> int:
    """Number of patch tokens kept by a pruned block (CLS excluded).

    Mirrors reference attention.py:31-32: ``max(1, int(keep_ratio * (N-1)))``
    with ``int()`` truncation. Pure Python — evaluated at trace time so the
    result is a static shape.
    """
    num_patches = num_tokens - 1
    return max(1, int(keep_ratio * num_patches))


def select_tokens(scores: jax.Array, keep: int) -> jax.Array:
    """Pick the ``keep`` highest-scoring patch tokens, keep CLS, sort by index.

    Args:
      scores: ``[B, N]`` importance scores (position 0 = CLS; its score is
        ignored by ranking, reference attention.py:34).
      keep: static number of patch tokens to keep.

    Returns:
      ``keep_idx``: ``[B, keep + 1]`` int32 gather indices into the token axis,
      ascending, with index 0 (CLS) first (reference attention.py:35-39).
    """
    B = scores.shape[0]
    patch_scores = scores[:, 1:]
    _, idx = jax.lax.top_k(patch_scores, keep)  # [B, keep]
    idx = jnp.sort(idx, axis=1)
    cls_idx = jnp.zeros((B, 1), dtype=idx.dtype)
    return jnp.concatenate([cls_idx, idx + 1], axis=1)


def gather_tokens(x: jax.Array, keep_idx: jax.Array) -> jax.Array:
    """Compact the token axis of ``[B, N, ...]`` down to ``[B, K, ...]``.

    Equivalent of the reference's expanded ``torch.gather`` over dim 1
    (attention.py:42-43, model.py:55-56), expressed as ``take_along_axis`` so
    XLA lowers it to a single dynamic-gather.
    """
    idx = keep_idx.reshape(keep_idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)
