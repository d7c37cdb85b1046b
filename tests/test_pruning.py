"""Selection arithmetic & gather semantics (SURVEY.md §4 item 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rajni_tpu.ops.pruning import gather_tokens, keep_count, select_tokens
from .oracles import select_oracle


@pytest.mark.parametrize(
    "ratio,n,expected",
    [
        # floor semantics: int(ratio * (N-1)) (reference attention.py:31-32)
        (0.88, 197, 172),
        (0.8, 153, 121),
        (0.72, 122, 87),
        (0.95, 197, 186),
        (0.85, 188, 158),
        # floors at 1 patch even for tiny ratios
        (1e-6, 197, 1),
        (0.001, 5, 1),
        # keep-all
        (1.0, 197, 196),
        # ViT-B/384
        (0.95, 577, 547),
    ],
)
def test_keep_count(ratio, n, expected):
    assert keep_count(ratio, n) == expected


def test_select_matches_oracle(rng):
    scores = rng.standard_normal((4, 197)).astype(np.float32)
    for ratio in (0.88, 0.5, 0.01, 1.0):
        keep = keep_count(ratio, 197)
        got = np.asarray(select_tokens(jnp.asarray(scores), keep))
        want = select_oracle(scores, ratio)
        np.testing.assert_array_equal(got, want)


def test_select_always_keeps_cls_first(rng):
    scores = rng.standard_normal((3, 17)).astype(np.float32)
    scores[:, 0] = -1e9  # CLS score is never ranked (attention.py:34)
    idx = np.asarray(select_tokens(jnp.asarray(scores), 4))
    assert (idx[:, 0] == 0).all()
    # remaining indices ascending and in [1, N)
    assert (np.diff(idx[:, 1:], axis=1) > 0).all()
    assert idx.min() >= 0 and idx.max() < 17


def test_gather_tokens_matches_numpy(rng):
    x = rng.standard_normal((2, 9, 5)).astype(np.float32)
    scores = rng.standard_normal((2, 9)).astype(np.float32)
    idx = select_tokens(jnp.asarray(scores), 3)
    got = np.asarray(gather_tokens(jnp.asarray(x), idx))
    idx_np = np.asarray(idx)
    want = np.take_along_axis(x, idx_np[..., None], axis=1)
    np.testing.assert_array_equal(got, want)


def test_gather_tokens_2d(rng):
    """Score propagation gathers a [B, N] array (reference attention.py:58)."""
    scores = rng.standard_normal((2, 9)).astype(np.float32)
    idx = select_tokens(jnp.asarray(scores), 3)
    got = np.asarray(gather_tokens(jnp.asarray(scores), idx))
    want = np.take_along_axis(scores, np.asarray(idx), axis=1)
    np.testing.assert_array_equal(got, want)


class TestDenseSelection:
    """select_tokens_dense must be bit-identical to select_tokens."""

    def test_matches_topk_path(self, rng):
        from rajni_tpu.ops.pruning import select_tokens, select_tokens_dense

        import jax.numpy as jnp

        for N, keep in [(197, 167), (197, 1), (57, 28), (577, 547)]:
            scores = jnp.asarray(
                rng.standard_normal((4, N)), jnp.float32
            )
            want = select_tokens(scores, keep)
            got_idx, sel = select_tokens_dense(scores, keep)
            np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want))
            # sel gathers identically to take_along_axis
            x = jnp.asarray(rng.standard_normal((4, N, 8)), jnp.float32)
            from rajni_tpu.ops.pruning import gather_tokens, gather_tokens_matmul

            np.testing.assert_allclose(
                np.asarray(gather_tokens_matmul(x, sel)),
                np.asarray(gather_tokens(x, want)),
                atol=0,
            )

    def test_tie_break_prefers_lower_index(self):
        from rajni_tpu.ops.pruning import select_tokens, select_tokens_dense

        import jax.numpy as jnp

        # many exact ties: lax.top_k is stable (lower index first)
        scores = jnp.asarray(
            [[0.5, 1.0, 1.0, 0.25, 1.0, 0.25, 1.0, 0.25]], jnp.float32
        )
        for keep in range(1, 8):
            want = select_tokens(scores, keep)
            got, _ = select_tokens_dense(scores, keep)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestEdgeCases:
    def test_keep_ratio_one_keeps_everything(self, rng):
        """keep_ratio=1.0 → keep = N-1 patches: selection is the identity
        permutation, forward equals a no-gather forward."""
        import jax
        import jax.numpy as jnp

        from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
        from rajni_tpu.utils.schedule import normalize_schedule

        cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                        num_heads=4, num_classes=5)
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        full = normalize_schedule({1: {"keep_ratio": 1.0}}, cfg.depth)
        none = normalize_schedule(None, cfg.depth)
        np.testing.assert_allclose(
            np.asarray(vit_forward(params, x, cfg, full)),
            np.asarray(vit_forward(params, x, cfg, none)),
            rtol=1e-5, atol=1e-5,
        )

    def test_tiny_keep_ratio_floors_at_one_patch(self):
        from rajni_tpu.ops.pruning import keep_count

        assert keep_count(0.001, 197) == 1  # max(1, ...) floor
        assert keep_count(0.001, 5) == 1

    def test_batch_one_pruned_forward(self, rng):
        import jax
        import jax.numpy as jnp

        from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
        from rajni_tpu.utils.schedule import normalize_schedule

        cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                        num_heads=4, num_classes=5)
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
        sched = normalize_schedule({0: {"keep_ratio": 0.3},
                                    1: {"keep_ratio": 0.3}}, cfg.depth)
        for impl in ("xla", "pallas"):
            out = vit_forward(params, x, cfg, sched, impl)
            assert out.shape == (1, 5)
            assert np.isfinite(np.asarray(out)).all()

    def test_every_block_pruned(self, rng):
        """A schedule that prunes all blocks (extreme compaction chain)."""
        import jax
        import jax.numpy as jnp

        from rajni_tpu.models.vit import (
            ViTConfig, init_params, model_stats, vit_forward)
        from rajni_tpu.utils.schedule import normalize_schedule

        cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=3,
                        num_heads=4, num_classes=5)
        sched = normalize_schedule(
            {i: {"keep_ratio": 0.5} for i in range(3)}, cfg.depth)
        # 17 tokens -> 8+1 -> 4+1 -> 2+1
        assert model_stats(cfg, sched)["token_counts"] == [17, 9, 5]
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        for impl in ("xla", "pallas"):
            a = vit_forward(params, x, cfg, sched, impl)
            assert np.isfinite(np.asarray(a)).all()


def test_select_tokens_radix_matches_dense(rng):
    """Radix threshold-search selection is bit-identical to the rank-matrix
    version (same sets, same order, same lower-index tie-breaks) across
    random, tie-heavy, negative, and all-equal score patterns."""
    import jax.numpy as jnp

    from rajni_tpu.ops.pruning import select_tokens_dense, select_tokens_radix

    B, N = 4, 57
    cases = [
        rng.standard_normal((B, N)).astype(np.float32),
        # heavy ties: scores quantized to 4 levels
        np.round(rng.standard_normal((B, N)) * 2).astype(np.float32) / 2,
        -np.abs(rng.standard_normal((B, N))).astype(np.float32),
        np.zeros((B, N), np.float32),
        np.full((B, N), -0.0, np.float32),
    ]
    for keep in (1, 23, N - 1):
        for i, s in enumerate(cases):
            si = jnp.asarray(s)
            idx_d, sel_d = select_tokens_dense(si, keep, jnp.float32)
            idx_r, sel_r = select_tokens_radix(si, keep, jnp.float32)
            np.testing.assert_array_equal(
                np.asarray(idx_d), np.asarray(idx_r), f"case {i} keep {keep}")
            np.testing.assert_array_equal(
                np.asarray(sel_d), np.asarray(sel_r), f"case {i} keep {keep}")


def test_select_tokens_prefix_generalization(rng):
    """num_prefix > 1 (CLS + registers): the prefix occupies the first
    output slots, is never ranked, and both selectors agree exactly."""
    import jax.numpy as jnp

    from rajni_tpu.ops.pruning import (
        keep_count,
        select_tokens,
        select_tokens_dense,
    )

    B, N, P = 3, 21, 4
    scores = rng.standard_normal((B, N)).astype(np.float32)
    # adversarial: prefix scores far above and below every patch score —
    # neither may influence the ranking
    scores[:, 0] = 100.0
    scores[:, 1] = -100.0
    scores[:, 2] = 50.0
    scores[:, 3] = -50.0
    s = jnp.asarray(scores)

    keep = keep_count(0.5, N, P)  # = max(1, int(0.5 * 17)) = 8
    assert keep == 8

    idx = np.asarray(select_tokens(s, keep, num_prefix=P))
    assert idx.shape == (B, keep + P)
    np.testing.assert_array_equal(idx[:, :P], np.tile(np.arange(P), (B, 1)))
    assert (idx[:, P:] >= P).all()
    # ascending order, and exactly the top-keep patch scores
    assert (np.diff(idx[:, P:], axis=1) > 0).all()
    for b in range(B):
        want = np.sort(
            np.argsort(-scores[b, P:], kind="stable")[:keep] + P
        )
        np.testing.assert_array_equal(idx[b, P:], want)

    idx_d, sel_d = select_tokens_dense(s, keep, jnp.float32, num_prefix=P)
    np.testing.assert_array_equal(np.asarray(idx_d), idx)
    # selection matrix gathers the same rows
    gathered = np.asarray(sel_d) @ scores[..., None]
    np.testing.assert_allclose(
        gathered[..., 0], np.take_along_axis(scores, idx, axis=1)
    )


def test_keep_count_prefix_arithmetic():
    from rajni_tpu.ops.pruning import keep_count

    # reference semantics unchanged at prefix 1
    assert keep_count(0.95, 197) == 186
    # registers: ratio applies to the patch count only
    assert keep_count(0.5, 201, 5) == 98
    assert keep_count(0.001, 201, 5) == 1  # floors at one patch
