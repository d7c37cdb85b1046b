"""Pallas kernel tests: interpret-mode parity vs the lax reference ops
(SURVEY.md §4 item 4: kernels get ``interpret=True`` CPU tests against the
reference implementation)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rajni_tpu.kernels.attention import fused_sdpa
from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.ops.attention import _sdpa
from rajni_tpu.utils.schedule import normalize_schedule


@pytest.mark.parametrize(
    "B,N,H,D",
    [
        (2, 197, 12, 64),   # ViT-B/224 full sequence
        (2, 87, 12, 64),    # smallest pruned count of the README schedule
        (1, 577, 4, 16),    # ViT-B/384 sequence length (small dims for speed)
        (3, 16, 2, 8),      # tiny / unaligned everything
    ],
)
def test_fused_sdpa_matches_lax(rng, B, N, H, D):
    C = H * D
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), jnp.float32)
    scale = D**-0.5
    want = _sdpa(qkv, H, scale)
    got = fused_sdpa(qkv, H, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_sdpa_bf16(rng):
    B, N, H, D = 2, 64, 4, 16
    C = H * D
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), jnp.bfloat16)
    scale = D**-0.5
    want = _sdpa(qkv, H, scale)
    got = fused_sdpa(qkv, H, scale)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_vit_forward_pallas_impl_matches_xla(rng):
    """End-to-end: pallas-backed forward == xla-backed forward, pruned.

    Same params, same schedule; the only difference is the SDPA backend, so
    any mismatch is a kernel bug (including in the gather/score threading
    interplay)."""
    config = ViTConfig(
        img_size=32, patch_size=8, embed_dim=48, depth=3, num_heads=4,
        num_classes=10,
    )
    schedule = normalize_schedule(
        {1: {"keep_ratio": 0.6, "update": True},
         2: {"keep_ratio": 0.5, "update": False}},
        config.depth,
    )
    params = init_params(jax.random.key(0), config)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)), jnp.float32
    )
    fwd = jax.jit(vit_forward, static_argnums=(2, 3, 4))
    want = fwd(params, images, config, schedule, "xla")
    got = fwd(params, images, config, schedule, "pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_bad_impl_raises():
    config = ViTConfig(
        img_size=16, patch_size=8, embed_dim=16, depth=1, num_heads=2,
        num_classes=4,
    )
    params = init_params(jax.random.key(0), config)
    images = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="unknown attention impl"):
        vit_forward(params, images, config, None, "cuda")


@pytest.mark.parametrize("rows,C,hidden", [(2 * 197, 64, 256), (3 * 50, 48, 192)])
def test_fused_ln_mlp_residual_matches_lax(rng, rows, C, hidden):
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual
    from rajni_tpu.models.vit import layer_norm, mlp as mlp_ref

    B = 2
    N = rows // B
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.standard_normal(C), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    mp = {
        "fc1": {"kernel": jnp.asarray(rng.standard_normal((C, hidden)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(hidden), jnp.float32)},
        "fc2": {"kernel": jnp.asarray(rng.standard_normal((hidden, C)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)},
    }
    want = x + mlp_ref(layer_norm(x, ln, 1e-6), mp)
    got = fused_ln_mlp_residual(x, ln, mp, None, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    ls = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    want = x + ls * mlp_ref(layer_norm(x, ln, 1e-6), mp)
    got = fused_ln_mlp_residual(x, ln, mp, ls, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_ln_qkv_select_matches_composition(rng):
    """The single-dispatch select variant == fused_ln_qkv + XLA selection."""
    from rajni_tpu.kernels.block import fused_ln_qkv, fused_ln_qkv_select
    from rajni_tpu.ops.pruning import select_tokens_dense

    B, N, C, H = 2, 57, 32, 4
    keep = 23
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.standard_normal(C), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    qkv_p = {"kernel": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1,
                                   jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(3 * C), jnp.float32)}

    qkv_a, scores = fused_ln_qkv(x, ln, qkv_p, H, 1e-6, True)
    idx_a, sel_a = select_tokens_dense(scores, keep, x.dtype)
    ns_a = jnp.take_along_axis(scores, idx_a, axis=1)

    qkv_b, sel_b, idx_b, ns_b = fused_ln_qkv_select(x, ln, qkv_p, H, keep)

    np.testing.assert_allclose(np.asarray(qkv_b), np.asarray(qkv_a), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_a))
    np.testing.assert_array_equal(np.asarray(sel_b), np.asarray(sel_a))
    np.testing.assert_allclose(np.asarray(ns_b), np.asarray(ns_a), atol=1e-6)


def test_chunked_gather_matches_fast(rng, monkeypatch):
    """The query-chunked long-sequence kernel must agree with the fast body
    (forced by shrinking the VMEM budget), including a K not divisible by
    the 128-row chunk."""
    from rajni_tpu.kernels import block as blk

    B, N, C, H = 2, 300, 32, 4
    keep = 276  # K = 277: three chunks, last one partial
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scores = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    proj = {"kernel": jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                                  jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    from rajni_tpu.ops.pruning import select_tokens_dense

    _, sel = select_tokens_dense(scores, keep, jnp.float32)

    want = blk.fused_gather_sdpa_proj_residual(
        qkv, sel, x, proj, None, H, 8**-0.5)
    monkeypatch.setattr(blk, "_VMEM_BUDGET", 1)  # force the chunked path
    # bypass the jit cache (same shapes+statics would replay the fast trace)
    got = blk.fused_gather_sdpa_proj_residual.__wrapped__(
        qkv, sel, x, proj, None, H, 8**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_pruned_block_matches_two_kernel_path(rng):
    """The single mega-kernel pruned block must equal the two-kernel
    composition (fused_ln_qkv + XLA selection + gather kernel), both for
    fresh scoring and for update=False reuse."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.ops.pruning import select_tokens_dense

    B, N, C, H = 2, 57, 32, 4
    keep = 23
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.standard_normal(C), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    attn = {
        "qkv": {"kernel": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(3 * C) * 0.1,
                                    jnp.float32)},
        "proj": {"kernel": jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                                       jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(C) * 0.1,
                                     jnp.float32)},
    }
    scale = 8**-0.5

    # fresh scoring
    qkv, s = blk.fused_ln_qkv(x, ln, attn["qkv"], H, 1e-6, True)
    idx, sel = select_tokens_dense(s, keep, x.dtype)
    ns_want = jnp.take_along_axis(s, idx, axis=1)
    want = blk.fused_gather_sdpa_proj_residual(
        qkv, sel, x, attn["proj"], None, H, scale)
    got, ns = blk.fused_pruned_attn_block(
        x, ln, attn, None, None, H, keep, scale, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ns_want), atol=1e-6)

    # update=False reuse of external scores
    prev = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    idx2, sel2 = select_tokens_dense(prev, keep, x.dtype)
    want2 = blk.fused_gather_sdpa_proj_residual(
        qkv, sel2, x, attn["proj"], None, H, scale)
    got2, ns2 = blk.fused_pruned_attn_block(
        x, ln, attn, None, prev, H, keep, scale, 1e-6, False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ns2),
        np.asarray(jnp.take_along_axis(prev, idx2, axis=1)), atol=1e-6)


def _tiny_block_params(rng, C, hidden, quantized=False):
    def dense(i, o):
        p = {"kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.1,
                                   jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)}
        if quantized:
            from rajni_tpu.quant import quantize_weight

            p["kernel"] = quantize_weight(p["kernel"])
        return p

    def norm():
        return {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(C),
                                     jnp.float32),
                "bias": jnp.asarray(0.1 * rng.standard_normal(C),
                                    jnp.float32)}

    return {
        "norm1": norm(),
        "attn": {"qkv": dense(C, 3 * C), "proj": dense(C, C)},
        "norm2": norm(),
        "mlp": {"fc1": dense(C, hidden), "fc2": dense(hidden, C)},
    }


def test_full_stock_block_matches_split_kernels(rng):
    """fused_attn_mlp_block == fused_attn_block + fused_ln_mlp_residual,
    including the bf16-free fp32 case and the half-boundary rounding."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual

    B, N, C, H, hidden = 2, 33, 32, 4, 128
    bp = _tiny_block_params(rng, C, hidden)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 8**-0.5

    mid = blk.fused_attn_block(x, bp["norm1"], bp["attn"], None, H, scale)
    want = fused_ln_mlp_residual(mid, bp["norm2"], bp["mlp"])
    got = blk.fused_attn_mlp_block(x, bp, H, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_full_pruned_block_matches_split_kernels(rng):
    """fused_pruned_block_full == fused_pruned_attn_block +
    fused_ln_mlp_residual, both scoring modes."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual

    B, N, C, H, hidden, keep = 2, 57, 32, 4, 128, 23
    bp = _tiny_block_params(rng, C, hidden)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 8**-0.5

    mid, ns_want = blk.fused_pruned_attn_block(
        x, bp["norm1"], bp["attn"], None, None, H, keep, scale, 1e-6, True)
    want = fused_ln_mlp_residual(mid, bp["norm2"], bp["mlp"])
    got, ns = blk.fused_pruned_block_full(
        x, bp, None, H, keep, scale, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ns_want),
                               atol=1e-6)

    prev = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    mid2, _ = blk.fused_pruned_attn_block(
        x, bp["norm1"], bp["attn"], None, prev, H, keep, scale, 1e-6, False)
    want2 = fused_ln_mlp_residual(mid2, bp["norm2"], bp["mlp"])
    got2, _ = blk.fused_pruned_block_full(
        x, bp, prev, H, keep, scale, 1e-6, False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-5)


def test_full_stock_block_int8_matches_split_kernels(rng):
    """fused_block_full_int8 == fused_attn_block_int8 +
    fused_ln_mlp_residual_int8 (identical quantization steps on both
    sides, so the agreement is tight, not statistical)."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual_int8

    B, N, C, H, hidden = 2, 33, 64, 4, 128
    bp = _tiny_block_params(rng, C, hidden, quantized=True)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 16**-0.5

    mid = blk.fused_attn_block_int8(
        x, bp["norm1"], bp["attn"], None, H, scale)
    want = fused_ln_mlp_residual_int8(mid, bp["norm2"], bp["mlp"])
    got = blk.fused_block_full_int8(x, bp, H, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)


def test_full_pruned_block_int8_matches_split_kernels(rng):
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual_int8

    B, N, C, H, hidden, keep = 2, 57, 64, 4, 128, 23
    bp = _tiny_block_params(rng, C, hidden, quantized=True)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 16**-0.5

    mid, ns_want = blk.fused_pruned_attn_block_int8(
        x, bp["norm1"], bp["attn"], None, None, H, keep, scale, 1e-6, True)
    want = fused_ln_mlp_residual_int8(mid, bp["norm2"], bp["mlp"])
    got, ns = blk.fused_pruned_block_full_int8(
        x, bp, None, H, keep, scale, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ns_want),
                               atol=1e-6)


def test_longseq_block_matches_two_kernel_path(rng):
    """The token-chunked long-sequence mega-kernel (kernels.longseq) must
    equal the two-kernel composition on a ragged-chunk geometry (N=300,
    K=277: three 128-row query chunks, last partial), both scoring modes."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.longseq import fused_pruned_attn_block_long
    from rajni_tpu.ops.pruning import select_tokens_dense

    B, N, C, H = 2, 300, 32, 4
    keep = 276
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32),
          "bias": jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)}
    attn = {
        "qkv": {"kernel": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(3 * C) * 0.1,
                                    jnp.float32)},
        "proj": {"kernel": jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                                       jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(C) * 0.1,
                                     jnp.float32)},
    }
    scale = 8**-0.5

    qkv, s = blk.fused_ln_qkv(x, ln, attn["qkv"], H, 1e-6, True)
    idx, sel = select_tokens_dense(s, keep, x.dtype)
    want = blk.fused_gather_sdpa_proj_residual(
        qkv, sel, x, attn["proj"], None, H, scale)
    ns_want = jnp.take_along_axis(s, idx, axis=1)

    got, ns = fused_pruned_attn_block_long(
        x, ln, attn, None, None, H, keep, scale, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ns_want),
                               rtol=1e-5, atol=1e-6)

    # update=False threaded-score reuse
    prev = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    idx2, sel2 = select_tokens_dense(prev, keep, x.dtype)
    want2 = blk.fused_gather_sdpa_proj_residual(
        qkv, sel2, x, attn["proj"], None, H, scale)
    got2, ns2 = fused_pruned_attn_block_long(
        x, ln, attn, None, prev, H, keep, scale, 1e-6, False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ns2),
        np.asarray(jnp.take_along_axis(prev, idx2, axis=1)),
        rtol=1e-5, atol=1e-6)


def test_vit_forward_longseq_routing_matches_xla(rng, monkeypatch):
    """Force the whole-block fits-checks off so the pruned pallas path
    takes the TWO-KERNEL long-sequence fallback (fused_ln_qkv + XLA
    selection + gather tail — the ViT-B/384 production route, shrunk) and
    compare against the XLA reference end-to-end. NOTE: this does NOT
    execute kernels/longseq.py — that module is a tested-but-unrouted
    alternative (measured slower); its own pinning tests are above."""
    from rajni_tpu.kernels import block as blk

    monkeypatch.setattr(blk, "_pruned_block_fits", lambda *a: False)
    monkeypatch.setattr(blk, "_bf16_full_plan", lambda *a: None)

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=3,
                    num_heads=4, num_classes=13)
    sched = normalize_schedule(
        {1: {"keep_ratio": 0.7, "update": True},
         2: {"keep_ratio": 0.8, "update": False}}, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    want = np.asarray(vit_forward(params, x, cfg, sched, "xla"))
    got = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4)).__wrapped__(
            params, x, cfg, sched, "pallas")
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_full_stock_block_int8_multi_image_packing(rng):
    """The stock int8 whole-block kernel packs G images per program when
    the plan allows; results must be per-image independent (identical to
    running each image alone) and track the dequantized composition.
    C=128/hidden=512 plans G=2 with a chunked hidden activation (grouped
    quantization: per-chunk scales, so composition tolerance is the int8
    step, not exact)."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual_int8

    B, N, C, H, hidden = 4, 33, 128, 4, 512
    plan = blk._block_full_int8_plan(N, C, hidden, 4)
    assert plan is not None and plan[0] == 2, plan  # exercises packing
    bp = _tiny_block_params(rng, C, hidden, quantized=True)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 32**-0.5

    got = blk.fused_block_full_int8(x, bp, H, scale)
    # per-image independence: image 2 alone == image 2 in the packed batch
    solo = blk.fused_block_full_int8(x[2:3], bp, H, scale)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(solo[0]),
                               rtol=1e-5, atol=1e-5)
    # tracks the split-kernel composition within grouped-quant error
    mid = blk.fused_attn_block_int8(x, bp["norm1"], bp["attn"], None, H,
                                    scale)
    want = fused_ln_mlp_residual_int8(mid, bp["norm2"], bp["mlp"])
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < 0.05 * np.abs(np.asarray(want)).max(), err.max()


def test_full_pruned_block_int8_multi_image_packing(rng):
    """Pruned int8 whole-block kernel with G=2 packing: per-image
    independence of selection/scores and grouped-quant agreement with the
    split composition."""
    from rajni_tpu.kernels import block as blk
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual_int8

    B, N, C, H, hidden, keep = 4, 33, 128, 4, 512, 19
    plan = blk._pruned_full_int8_plan(N, keep + 1, C, hidden, 4)
    # pruned small-C plans prefer G=4 since r3 (measured DeiT-S int8 win);
    # per-image independence below holds for any packing factor
    assert plan is not None and plan[0] == 4, plan
    bp = _tiny_block_params(rng, C, hidden, quantized=True)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 32**-0.5

    got, ns = blk.fused_pruned_block_full_int8(
        x, bp, None, H, keep, scale, 1e-6, True)
    assert got.shape == (B, keep + 1, C) and ns.shape == (B, keep + 1)
    solo, ns_solo = blk.fused_pruned_block_full_int8(
        x[2:3], bp, None, H, keep, scale, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(solo[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns[2]), np.asarray(ns_solo[0]),
                               atol=1e-6)
    # split composition within grouped-quant error
    mid, _ = blk.fused_pruned_attn_block_int8(
        x, bp["norm1"], bp["attn"], None, None, H, keep, scale, 1e-6, True)
    want = fused_ln_mlp_residual_int8(mid, bp["norm2"], bp["mlp"])
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < 0.05 * np.abs(np.asarray(want)).max(), err.max()

    # update=False threaded-score reuse with packing
    prev = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    got2, _ = blk.fused_pruned_block_full_int8(
        x, bp, prev, H, keep, scale, 1e-6, False)
    solo2, _ = blk.fused_pruned_block_full_int8(
        x[1:2], bp, prev[1:2], H, keep, scale, 1e-6, False)
    np.testing.assert_allclose(np.asarray(got2[1]), np.asarray(solo2[0]),
                               rtol=1e-5, atol=1e-5)


def test_full_block_int8_odd_batch_downgrades_packing(rng):
    """A batch not divisible by the packing factor falls back to G=1 and
    still matches the packed result per image."""
    from rajni_tpu.kernels import block as blk

    B, N, C, H, hidden = 3, 33, 128, 4, 512  # odd B, plan would say G=2
    bp = _tiny_block_params(rng, C, hidden, quantized=True)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    scale = 32**-0.5
    got = blk.fused_block_full_int8(x, bp, H, scale)
    assert got.shape == (B, N, C)
    packed = blk.fused_block_full_int8(
        jnp.concatenate([x, x[:1]], axis=0), bp, H, scale)  # B=4 -> G=2
    np.testing.assert_allclose(np.asarray(got), np.asarray(packed[:3]),
                               rtol=1e-4, atol=1e-4)


def test_sdpa_hmajor_matches_perhead(rng, monkeypatch):
    """RAJNI_SDPA=hmajor (head-major scratch + batched dot_general SDPA)
    must be numerically interchangeable with the per-head loop on both the
    stock and pruned attention-half kernels (VERDICT r2 weak #2 A/B
    instrument)."""
    from rajni_tpu.kernels import block as blk

    B, N, C, H = 2, 57, 32, 4
    keep = 23
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.standard_normal(C), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    attn = {
        "qkv": {"kernel": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1,
                                      jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(3 * C) * 0.1,
                                    jnp.float32)},
        "proj": {"kernel": jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                                       jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(C) * 0.1,
                                     jnp.float32)},
    }
    scale = 8**-0.5

    want_stock = blk.fused_attn_block.__wrapped__(
        x, ln, attn, None, H, scale)
    want_pr, want_ns = blk.fused_pruned_attn_block.__wrapped__(
        x, ln, attn, None, None, H, keep, scale)

    monkeypatch.setenv("RAJNI_SDPA", "hmajor")
    got_stock = blk.fused_attn_block.__wrapped__(
        x, ln, attn, None, H, scale)
    got_pr, got_ns = blk.fused_pruned_attn_block.__wrapped__(
        x, ln, attn, None, None, H, keep, scale)

    np.testing.assert_allclose(np.asarray(got_stock),
                               np.asarray(want_stock), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_pr), np.asarray(want_pr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ns), np.asarray(want_ns),
                               rtol=1e-6, atol=1e-7)
