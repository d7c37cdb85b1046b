"""compute_importance parity vs the NumPy oracle (SURVEY.md §4 item 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rajni_tpu.ops.importance import compute_importance
from .oracles import importance_oracle


@pytest.mark.parametrize("B,N,H,D", [(2, 197, 12, 64), (1, 17, 3, 8), (3, 5, 2, 4)])
def test_matches_oracle(rng, B, N, H, D):
    C = H * D
    qkv = rng.standard_normal((B, N, 3 * C)).astype(np.float32)
    got = np.asarray(compute_importance(jnp.asarray(qkv), H))
    want = importance_oracle(qkv, H)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eps_guards_zero_std(rng):
    """Constant value vectors → centered norms all 0 → std 0; eps (added to
    the std, not the variance — reference importance.py:28-31) must keep the
    z-score finite, giving sigmoid(0)=0.5 so scores = 0.5 * A_cls."""
    B, N, H, D = 1, 9, 2, 4
    C = H * D
    qkv = rng.standard_normal((B, N, 3 * C)).astype(np.float32)
    qkv[:, :, 2 * C :] = 1.0  # identical value vectors for every token
    got = np.asarray(compute_importance(jnp.asarray(qkv), H))
    assert np.all(np.isfinite(got))
    want = importance_oracle(qkv, H)  # oracle also yields 0.5 * A_cls here
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_unbiased_std(rng):
    """ddof=1 (torch default) — a biased-std implementation would disagree."""
    B, N, H, D = 1, 4, 1, 4  # tiny N makes ddof=0 vs 1 differ ~15%
    C = H * D
    qkv = rng.standard_normal((B, N, 3 * C)).astype(np.float32)
    got = np.asarray(compute_importance(jnp.asarray(qkv), H))
    want = importance_oracle(qkv, H)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    # biased-std variant must NOT match (guard that the test has teeth)
    biased = _biased_variant(qkv, H)
    assert not np.allclose(got, biased, rtol=1e-4, atol=1e-6)


def _biased_variant(qkv, num_heads, eps=1e-6):
    B, N, three_c = qkv.shape
    C = three_c // 3
    D = C // num_heads
    x = qkv.reshape(B, N, 3, num_heads, D).astype(np.float64)
    k = np.moveaxis(x[:, :, 1], 1, 2)
    q = np.moveaxis(x[:, :, 0], 1, 2)
    v = np.moveaxis(x[:, :, 2], 1, 2)
    logits = np.einsum("bhd,bhnd->bhn", q[:, :, 0], k) / np.sqrt(D)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    a_cls = (e / e.sum(-1, keepdims=True)).mean(axis=1)
    V = v.mean(axis=1)
    V = V - V.mean(axis=1, keepdims=True)
    vn = np.linalg.norm(V, axis=-1)
    std = vn.std(axis=1, ddof=0, keepdims=True) + eps  # biased (wrong)
    z = 1.0 / (1.0 + np.exp(-(vn - vn.mean(1, keepdims=True)) / std))
    return a_cls * z
