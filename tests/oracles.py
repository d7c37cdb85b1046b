"""Independent NumPy re-derivations of the reference semantics.

These are the test oracles prescribed by SURVEY.md §4: hand re-derivations of
the reference algorithms (importance.py:14-34, attention.py:31-39,
model.py:39-63) in plain NumPy, written from the survey's semantic spec — not
from either implementation — so a shared bug is unlikely.
"""

from __future__ import annotations

import numpy as np


def importance_oracle(qkv: np.ndarray, num_heads: int, eps: float = 1e-6):
    """Spec: CLS-attention (1/sqrt(D) scale, head-averaged) × sigmoid of the
    token-axis z-score (unbiased std + eps) of centered head-mean value norms.
    """
    B, N, three_c = qkv.shape
    C = three_c // 3
    D = C // num_heads
    x = qkv.reshape(B, N, 3, num_heads, D).astype(np.float64)
    q = np.moveaxis(x[:, :, 0], 1, 2)  # [B, H, N, D]
    k = np.moveaxis(x[:, :, 1], 1, 2)
    v = np.moveaxis(x[:, :, 2], 1, 2)

    logits = np.einsum("bhd,bhnd->bhn", q[:, :, 0], k) / np.sqrt(D)
    logits -= logits.max(axis=-1, keepdims=True)
    e = np.exp(logits)
    a_cls = (e / e.sum(axis=-1, keepdims=True)).mean(axis=1)  # [B, N]

    V = v.mean(axis=1)  # [B, N, D]
    V = V - V.mean(axis=1, keepdims=True)
    vn = np.linalg.norm(V, axis=-1)
    mu = vn.mean(axis=1, keepdims=True)
    std = vn.std(axis=1, ddof=1, keepdims=True) + eps
    z = 1.0 / (1.0 + np.exp(-(vn - mu) / std))
    return a_cls * z


def select_oracle(scores: np.ndarray, keep_ratio: float):
    """Spec: keep = max(1, floor(ratio * patches)); top-k patch scores;
    ascending index sort; CLS(0) prepended."""
    B, N = scores.shape
    keep = max(1, int(keep_ratio * (N - 1)))
    patch = scores[:, 1:]
    # top-k: indices of the keep largest values
    idx = np.argpartition(-patch, keep - 1, axis=1)[:, :keep]
    idx = np.sort(idx, axis=1)
    return np.concatenate(
        [np.zeros((B, 1), dtype=idx.dtype), idx + 1], axis=1
    )
