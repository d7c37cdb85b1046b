"""End-to-end forward semantics: shapes, keep_ratio=1 equivalence, score
propagation state machine (SURVEY.md §4 items 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rajni_tpu.ops.attention as attention_ops
from rajni_tpu.models.vit import (
    ViTConfig,
    init_params,
    model_stats,
    patch_embed,
    vit_forward,
)
from rajni_tpu.utils.schedule import PruneSpec, normalize_schedule, token_count_trace

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=32, depth=5, num_heads=4, num_classes=10
)


@pytest.fixture
def tiny_params():
    return init_params(jax.random.key(0), TINY)


def _images(rng, b=2, cfg=TINY):
    return jnp.asarray(
        rng.standard_normal((b, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    )


def test_forward_shape(rng, tiny_params):
    x = _images(rng)
    logits = vit_forward(tiny_params, x, TINY)
    assert logits.shape == (2, 10)

    sched = normalize_schedule({1: {"keep_ratio": 0.5}}, TINY.depth)
    logits = vit_forward(tiny_params, x, TINY, sched)
    assert logits.shape == (2, 10)


def test_keep_ratio_one_equals_identity(rng, tiny_params):
    """keep_ratio=1.0 keeps every patch; sorted indices are then the identity
    permutation, so the pruned path must reproduce the stock forward exactly
    (the reference's implicit no-op case, attention.py:31-39)."""
    x = _images(rng)
    base = vit_forward(tiny_params, x, TINY)
    sched = normalize_schedule(
        {i: {"keep_ratio": 1.0} for i in range(TINY.depth)}, TINY.depth
    )
    pruned = vit_forward(tiny_params, x, TINY, sched)
    np.testing.assert_allclose(np.asarray(base), np.asarray(pruned), rtol=2e-5, atol=2e-5)


def test_jit_matches_eager(rng, tiny_params):
    x = _images(rng)
    sched = normalize_schedule({1: {"keep_ratio": 0.6}, 3: {"keep_ratio": 0.5}}, 5)
    eager = vit_forward(tiny_params, x, TINY, sched)
    jitted = jax.jit(vit_forward, static_argnums=(2, 3))(tiny_params, x, TINY, sched)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=2e-5, atol=2e-5)


def test_model_stats_contract():
    sched = normalize_schedule({1: {"keep_ratio": 0.5}, 2: {"keep_ratio": 0.5}}, 5)
    stats = model_stats(TINY, sched)
    # 5 tokens → keep max(1, int(0.5*4)) = 2 → 3 tokens → keep 1 → 2 tokens
    assert stats == {"token_counts": [5, 5, 3, 2, 2]}
    assert stats["token_counts"] == token_count_trace(TINY.num_tokens, sched)


def test_score_state_machine(rng, tiny_params, monkeypatch):
    """The reference's update/invalidate semantics (model.py:39-63,
    attention.py:25-28): recompute iff `update or prev_scores is None`; any
    stock block resets scores to None."""
    calls = []
    real = attention_ops.compute_importance

    def counting(qkv, num_heads, *a, **k):
        calls.append(qkv.shape[1])
        return real(qkv, num_heads, *a, **k)

    monkeypatch.setattr(attention_ops, "compute_importance", counting)
    x = _images(rng)

    # blocks: 0 stock, 1 pruned(update=False), 2 pruned(update=False),
    #         3 stock, 4 pruned(update=False)
    sched = (
        None,
        PruneSpec(0.75, update=False),
        PruneSpec(0.75, update=False),
        None,
        PruneSpec(0.75, update=False),
    )
    vit_forward(tiny_params, x, TINY, sched)
    # block 1 computes (prev None); block 2 reuses; block 3 stock invalidates;
    # block 4 computes again.
    assert len(calls) == 2

    calls.clear()
    sched_update = (
        None,
        PruneSpec(0.75, update=True),
        PruneSpec(0.75, update=True),
        None,
        PruneSpec(0.75, update=True),
    )
    vit_forward(tiny_params, x, TINY, sched_update)
    assert len(calls) == 3  # every pruned block recomputes


def test_reused_scores_drive_selection(rng):
    """With update=False, selection must rank by the surviving previous
    scores, not fresh ones (attention.py:25-28, 58)."""
    from rajni_tpu.ops.attention import pruned_attention
    from rajni_tpu.ops.pruning import select_tokens

    B, N, C, H = 1, 9, 16, 2
    k = jax.random.split(jax.random.key(1), 3)
    params = {
        "qkv": {
            "kernel": jax.random.normal(k[0], (C, 3 * C)) * 0.2,
            "bias": jnp.zeros((3 * C,)),
        },
        "proj": {
            "kernel": jax.random.normal(k[1], (C, C)) * 0.2,
            "bias": jnp.zeros((C,)),
        },
    }
    x = jax.random.normal(k[2], (B, N, C))
    prev = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))

    _, keep_idx, next_scores = pruned_attention(
        x, params, H, (C // H) ** -0.5, keep=4, update=False, prev_scores=prev
    )
    np.testing.assert_array_equal(
        np.asarray(keep_idx), np.asarray(select_tokens(prev, 4))
    )
    np.testing.assert_allclose(
        np.asarray(next_scores),
        np.take_along_axis(np.asarray(prev), np.asarray(keep_idx), axis=1),
    )


def test_patch_embed_matches_conv(rng):
    """Patchify+matmul must equal the reference's Conv2d(3,C,P,stride=P)
    (model.py:34) — validated against lax.conv with an HWIO reshape of the
    same kernel."""
    cfg = TINY
    P, C = cfg.patch_size, cfg.embed_dim
    kernel = rng.standard_normal((P * P * 3, C)).astype(np.float32)
    bias = rng.standard_normal((C,)).astype(np.float32)
    x = rng.standard_normal((2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    got = patch_embed(
        jnp.asarray(x), {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}, cfg
    )

    hwio = kernel.reshape(P, P, 3, C)
    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(hwio),
        window_strides=(P, P),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = conv.reshape(2, cfg.num_patches, C) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


class TestRAJNIViTWrapper:
    """Object API parity with the reference RAJNIViTWrapper call shape."""

    def test_call_and_stats(self, rng):
        import jax.numpy as jnp

        from rajni_tpu import RAJNIViT
        from rajni_tpu.models.vit import ViTConfig

        cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                        num_heads=4, num_classes=5)
        schedule = {1: {"keep_ratio": 0.5}}
        model = RAJNIViT(cfg, schedule, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        y = model(x)
        assert y.shape == (2, 5)
        assert model.get_last_stats() == {"token_counts": [5, 5]}

    def test_matches_functional(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rajni_tpu import RAJNIViT, init_params, vit_forward
        from rajni_tpu.models.vit import ViTConfig
        from rajni_tpu.utils.schedule import normalize_schedule

        cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                        num_heads=4, num_classes=5)
        params = init_params(jax.random.key(3), cfg, jnp.float32)
        sched = normalize_schedule({1: {"keep_ratio": 0.5}}, cfg.depth)
        model = RAJNIViT(cfg, sched, params=params)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        # jitted (wrapper) vs eager (functional): same math, fusion-level
        # float differences only
        np.testing.assert_allclose(
            np.asarray(model(x)),
            np.asarray(vit_forward(params, x, cfg, sched, model.impl)),
            rtol=2e-5, atol=1e-5,
        )


def test_get_config_name_grammar():
    """Names outside the registry parse via the timm grammar (VERDICT r1
    missing #4: the reference CLI forwards any timm name, run.py:28-29)."""
    import pytest

    from rajni_tpu.models.vit import VARIANTS, get_config

    cfg = get_config("vit_large_patch14_336")
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (1024, 24, 16)
    assert cfg.img_size == 336 and cfg.patch_size == 14
    assert cfg.num_tokens == (336 // 14) ** 2 + 1

    d3 = get_config("deit3_small_patch16_224")
    assert d3.use_layer_scale and d3.embed_dim == 384

    # registry entries still win (vit_huge is 32-deep there)
    assert get_config("vit_huge_patch14_224") is VARIANTS["vit_huge_patch14_224"]

    with pytest.raises(ValueError, match="unknown model"):
        get_config("swin_base_patch4_window7_224")
    with pytest.raises(ValueError, match="unknown model"):
        get_config("vit_base_patch16_225")  # 225 % 16 != 0


# ---------------------------------------------------------------------------
# Extended timm variants: pruning with a CLS+registers prefix, pooled heads,
# qk-norm — forward-level semantics (converter parity lives in test_params).
# ---------------------------------------------------------------------------


REG = ViTConfig(
    img_size=32, patch_size=8, embed_dim=32, depth=4, num_heads=4,
    num_classes=7, reg_tokens=3, no_embed_class=True,
)


def test_register_pruned_trace_and_demotion(rng):
    """Registers are prefix tokens: keep = ratio × patches, trace adds the
    prefix back, and impl="pallas" demotes to the identical XLA program."""
    params = init_params(jax.random.key(1), REG)
    sched = normalize_schedule(
        {1: {"keep_ratio": 0.5}, 2: {"keep_ratio": 0.5, "update": False}},
        REG.depth,
    )
    # 16 patches + 4 prefix = 20; block1: int(0.5·16)=8 → 12; block2:
    # int(0.5·8)=4 → 8
    assert model_stats(REG, sched)["token_counts"] == [20, 20, 12, 8]

    x = _images(rng, 2, REG)
    a = vit_forward(params, x, REG, sched, impl="xla")
    b = vit_forward(params, x, REG, sched, impl="pallas")  # demoted
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 7)
    assert np.isfinite(np.asarray(a)).all()


def test_register_rows_survive_pruning(rng):
    """All prefix rows reach the head untouched by selection: with keep=1
    the surviving sequence is exactly [CLS, reg×3, best patch]."""
    from rajni_tpu.models.vit import vit_activations

    params = init_params(jax.random.key(2), REG)
    sched = normalize_schedule({1: {"keep_ratio": 1e-9}}, REG.depth)
    acts, _ = vit_activations(params, _images(rng, 2, REG), REG, sched)
    # block 1 output: 4 prefix + max(1, 0) = 5 tokens
    assert acts[1].shape[1] == 5


def test_pooled_head_with_pruning(rng):
    """avg pool runs over the surviving patch tokens (prefix excluded)."""
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        num_classes=7, global_pool="avg",
    )
    params = init_params(jax.random.key(3), cfg)
    sched = normalize_schedule({1: {"keep_ratio": 0.5}}, cfg.depth)
    logits = vit_forward(params, _images(rng, 2, cfg), cfg, sched)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()

    # fc_norm forward must differ from a token-pool forward on the same
    # weights (same tree shape modulo the norm key) — guards against the
    # pool silently reading CLS
    params_tok = dict(params)
    params_tok["norm"] = params_tok.pop("fc_norm")
    cfg_tok = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        num_classes=7,
    )
    tok = vit_forward(params_tok, _images(rng, 2, cfg_tok), cfg_tok, sched)
    assert np.abs(np.asarray(tok) - np.asarray(logits)).max() > 1e-4


def test_quantized_qk_norm_forward(rng):
    """int8 quantization keeps the q/k norms in the tree and the (demoted)
    forward still applies them."""
    from rajni_tpu.quant import quantize_params

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        num_classes=7, qk_norm=True,
    )
    params = init_params(jax.random.key(4), cfg)
    qparams = quantize_params(params)
    assert "q_norm" in qparams["blocks"][0]["attn"]

    sched = normalize_schedule({1: {"keep_ratio": 0.5}}, cfg.depth)
    x = _images(rng, 2, cfg)
    full = vit_forward(params, x, cfg, sched)
    quant = vit_forward(qparams, x, cfg, sched, impl="pallas")  # demoted
    assert np.isfinite(np.asarray(quant)).all()
    # int8 weight error is bounded; wildly-off logits would mean the norms
    # were dropped on one side
    assert np.abs(np.asarray(full) - np.asarray(quant)).max() < 1.0


def test_extended_config_guards(rng):
    """Paths that re-derive the classic semantics reject extended configs
    instead of silently mis-running them."""
    import jax as _jax

    from rajni_tpu.parallel.pipeline import make_pipe_mesh, pipeline_forward
    from rajni_tpu.quant import calibrate_act_scales

    params = init_params(jax.random.key(5), REG)
    with pytest.raises(ValueError, match="classic"):
        mesh = make_pipe_mesh(pipe=2)
        pipeline_forward(params, REG, None, mesh)
    with pytest.raises(ValueError, match="XLA path"):
        calibrate_act_scales(
            params, _images(np.random.default_rng(0), 2, REG), REG
        )


def test_extended_variant_grads_flow(rng):
    """Fine-tuning an extended variant: gradients reach the new leaves
    (q/k norms, fc_norm, reg_token) and are finite everywhere."""
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_classes=5, reg_tokens=2, no_embed_class=True, qk_norm=True,
        global_pool="avg",
    )
    params = init_params(jax.random.key(6), cfg)
    x = _images(rng, 4, cfg)
    labels = jnp.array([0, 1, 2, 3])
    sched = normalize_schedule({1: {"keep_ratio": 0.5}}, cfg.depth)

    def loss(p):
        logits = vit_forward(p, x, cfg, sched)
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(4), labels]
        )

    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.isfinite(leaf).all())
        for leaf in jax.tree_util.tree_leaves(g)
    )
    assert float(jnp.abs(g["blocks"][0]["attn"]["q_norm"]["scale"]).max()) > 0
    assert float(jnp.abs(g["fc_norm"]["scale"]).max()) > 0
    assert float(jnp.abs(g["reg_token"]).max()) > 0


def test_distilled_int8_head(rng):
    """Full-int8 quantization covers the distillation head; the (demoted)
    quantized forward stays close to fp32."""
    from rajni_tpu.quant import is_quantized, quantize_params

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_classes=5, distilled=True,
    )
    params = init_params(jax.random.key(8), cfg)
    q = quantize_params(params)
    assert is_quantized(q["head_dist"]["kernel"])

    x = _images(rng, 2, cfg)
    sched = normalize_schedule({1: {"keep_ratio": 0.5}}, cfg.depth)
    full = vit_forward(params, x, cfg, sched)
    quant = vit_forward(q, x, cfg, sched, impl="pallas")  # demoted
    assert np.isfinite(np.asarray(quant)).all()
    assert np.abs(np.asarray(full) - np.asarray(quant)).max() < 1.0


def test_lane_unaligned_width_demotes_on_real_tpu(monkeypatch, rng):
    """Mosaic cannot compile the fused kernels for C % 128 != 0 (measured:
    vit_tiny's C=192 fails with "unsupported shape cast" on v5e while
    C=384..1280 compile). pallas_compilable gates the route on real TPU
    only — interpret mode keeps the tiny-dim test configs on the kernels."""
    from rajni_tpu.kernels import math as kmath
    from rajni_tpu.models.vit import get_config, init_params, pallas_compilable

    tiny = get_config("vit_tiny_patch16_64")  # C=192
    assert pallas_compilable(tiny)  # off-TPU: interpret mode, no demotion

    monkeypatch.setattr(kmath, "use_interpret", lambda: False)  # "real TPU"
    assert not pallas_compilable(tiny)
    assert pallas_compilable(get_config("vit_base_patch16_224"))  # C=768
    assert pallas_compilable(get_config("deit_small_patch16_224"))  # C=384

    # forward-level: impl="pallas" must demote to the bit-identical XLA
    # program instead of building a kernel Mosaic would reject (with the
    # patch active, actually running a kernel on CPU would fail too — the
    # demotion is what makes this call succeed)
    params = init_params(jax.random.key(0), tiny)
    sched = normalize_schedule({3: {"keep_ratio": 0.9}}, tiny.depth)
    x = _images(rng, 2, tiny)
    a = vit_forward(params, x, tiny, sched, impl="xla")
    b = vit_forward(params, x, tiny, sched, impl="pallas")  # demoted
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vit_token_trace_masks():
    """vit_token_trace: per-block kept-token masks agree with the static
    token-count trace, never resurrect a token, always keep the prefix,
    and leave the logits untouched."""
    from rajni_tpu.models.vit import (
        ViTConfig, init_params, model_stats, vit_forward, vit_token_trace,
    )
    from rajni_tpu.utils.schedule import normalize_schedule

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=3,
                    num_heads=4, num_classes=8)
    sched = normalize_schedule(
        {1: {"keep_ratio": 0.5},
         2: {"keep_ratio": 0.7, "update": False}},  # reuse path tapped too
        cfg.depth,
    )
    params = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
        jnp.float32,
    )
    masks, logits = vit_token_trace(params, x, cfg, sched)
    assert len(masks) == cfg.depth + 1
    counts = model_stats(cfg, sched)["token_counts"]
    for i, m in enumerate(masks[:-1]):
        assert (np.asarray(m).sum(1) == counts[i]).all(), i
    for a, b in zip(masks, masks[1:]):
        assert (np.asarray(b) <= np.asarray(a)).all()
    assert all(np.asarray(m)[:, 0].all() for m in masks)  # CLS kept
    want = vit_forward(params, x, cfg, sched, "xla")
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want), rtol=1e-6, atol=1e-6
    )
    # the two images select different patches (scores are data-dependent)
    assert (np.asarray(masks[-1][0]) != np.asarray(masks[-1][1])).any()


def test_vit_token_trace_prefix_tokens():
    """Registers (and any prefix token) are always-kept, never-ranked —
    the masks must show the whole prefix alive through every block."""
    from rajni_tpu.models.vit import ViTConfig, init_params, vit_token_trace
    from rajni_tpu.utils.schedule import normalize_schedule

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, num_classes=8, reg_tokens=2,
                    no_embed_class=True)
    sched = normalize_schedule({0: {"keep_ratio": 0.5}}, cfg.depth)
    params = init_params(jax.random.key(1), cfg)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
        jnp.float32,
    )
    masks, _ = vit_token_trace(params, x, cfg, sched)
    pre = cfg.num_prefix_tokens
    assert pre == 3
    for m in masks:
        assert np.asarray(m)[:, :pre].all()
