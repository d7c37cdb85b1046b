"""Int8 dynamic-quantization tests (opt-in extension, rajni_tpu.quant)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.quant import (
    dequantize_weight,
    is_quantized,
    quantize_params,
    quantize_weight,
)
from rajni_tpu.utils.schedule import normalize_schedule

CFG = ViTConfig(
    img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
    num_classes=7,
)


def test_weight_roundtrip_error_bounded(rng):
    w = jnp.asarray(rng.standard_normal((64, 256)) * 0.1, jnp.float32)
    q = quantize_weight(w)
    assert q["int8"].dtype == jnp.int8
    assert is_quantized(q)
    back = dequantize_weight(q)
    # symmetric 8-bit: error <= scale/2 per element
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(q["scale"])[0] / 2 + 1e-8
    assert (err <= bound[None, :]).all()


def test_int8_kernel_matches_dequantized_reference(rng):
    """The int8 kernel must equal the fp32 math on the *dequantized* weights
    with the same per-row activation quantization — i.e. the only error
    source is quantization itself, not the kernel."""
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual_int8

    B, N, C, Hd = 2, 40, 64, 256
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.ones((C,), jnp.float32),
          "bias": jnp.zeros((C,), jnp.float32)}
    mlp_q = {
        "fc1": {"kernel": quantize_weight(
                    jnp.asarray(rng.standard_normal((C, Hd)) * 0.1,
                                jnp.float32)),
                "bias": jnp.asarray(rng.standard_normal(Hd) * 0.1,
                                    jnp.float32)},
        "fc2": {"kernel": quantize_weight(
                    jnp.asarray(rng.standard_normal((Hd, C)) * 0.1,
                                jnp.float32)),
                "bias": jnp.asarray(rng.standard_normal(C) * 0.1,
                                    jnp.float32)},
    }
    got = fused_ln_mlp_residual_int8(x, ln, mlp_q)

    # NumPy re-derivation with identical quantization steps
    def rows_q(y):
        s = np.maximum(np.abs(y).max(axis=-1, keepdims=True), 1e-8) / 127.0
        return np.clip(np.round(y / s), -127, 127), s

    xn = np.asarray(x, np.float64).reshape(-1, C)
    mu = xn.mean(-1, keepdims=True)
    va = ((xn - mu) ** 2).mean(-1, keepdims=True)
    y = (xn - mu) / np.sqrt(va + 1e-6)
    yq, ys = rows_q(y)
    w1 = np.asarray(mlp_q["fc1"]["kernel"]["int8"], np.float64)
    s1 = np.asarray(mlp_q["fc1"]["kernel"]["scale"], np.float64)
    h = (yq @ w1) * ys * s1 + np.asarray(mlp_q["fc1"]["bias"])
    from scipy.special import erf as _erf  # fallback below if absent

    h = 0.5 * h * (1 + _erf(h / np.sqrt(2)))
    hq, hs = rows_q(h)
    w2 = np.asarray(mlp_q["fc2"]["kernel"]["int8"], np.float64)
    s2 = np.asarray(mlp_q["fc2"]["kernel"]["scale"], np.float64)
    out = (hq @ w2) * hs * s2 + np.asarray(mlp_q["fc2"]["bias"])
    want = (xn + out).reshape(B, N, C)

    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_int8_sdpa_attn_block_matches_quantized_oracle(rng):
    """The full-int8 attention block (int8 QKV proj → int8 SDPA → int8 out
    proj) must equal a NumPy re-derivation with identical quantization
    steps — the only error source is quantization itself, not the kernel.

    Pins the int8-SDPA layout: per-token-row q/k scales (shared across
    heads), per-channel v scales, and the softmax normalizer folded into
    the p-dequant (p_q = round(127·exp(l−m)), scale 1/(127·Σexp)).
    ``int8_sdpa=True`` opts in (the default keeps SDPA bf16 — measured
    faster at ViT shapes; the projections stay int8 either way)."""
    from rajni_tpu.kernels.block import fused_attn_block_int8

    B, N, C, H = 2, 24, 64, 4
    D = C // H
    scale = D**-0.5
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32),
          "bias": jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)}
    attn_q = {
        "qkv": {"kernel": quantize_weight(jnp.asarray(
                    rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)),
                "bias": jnp.asarray(rng.standard_normal(3 * C) * 0.1,
                                    jnp.float32)},
        "proj": {"kernel": quantize_weight(jnp.asarray(
                    rng.standard_normal((C, C)) * 0.1, jnp.float32)),
                 "bias": jnp.asarray(rng.standard_normal(C) * 0.1,
                                     jnp.float32)},
    }
    got = fused_attn_block_int8(x, ln, attn_q, None, H, scale,
                                int8_sdpa=True)

    def rows_q(y):  # identical to kernels.math.quantize_rows
        am = np.maximum(np.abs(y).max(axis=-1, keepdims=True), 1e-8)
        return np.clip(np.round(y * (127.0 / am)), -127, 127), am / 127.0

    def cols_q(y):
        am = np.maximum(np.abs(y).max(axis=0, keepdims=True), 1e-8)
        return np.clip(np.round(y * (127.0 / am)), -127, 127), am / 127.0

    wq = np.asarray(attn_q["qkv"]["kernel"]["int8"], np.float64)
    sq = np.asarray(attn_q["qkv"]["kernel"]["scale"], np.float64)
    wp = np.asarray(attn_q["proj"]["kernel"]["int8"], np.float64)
    sp = np.asarray(attn_q["proj"]["kernel"]["scale"], np.float64)

    want = np.empty((B, N, C))
    for b in range(B):
        x32 = np.asarray(x[b], np.float64)
        mu = x32.mean(-1, keepdims=True)
        va = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        y = (x32 - mu) / np.sqrt(va + 1e-6)
        y = y * np.asarray(ln["scale"]) + np.asarray(ln["bias"])
        yq, ys = rows_q(y)
        qkv = (yq @ wq) * ys * sq + np.asarray(attn_q["qkv"]["bias"])

        qq, qs = rows_q(qkv[:, :C])
        kq, ks = rows_q(qkv[:, C:2 * C])
        vq, vs = cols_q(qkv[:, 2 * C:])
        heads = []
        for h in range(H):
            acc = qq[:, h * D:(h + 1) * D] @ kq[:, h * D:(h + 1) * D].T
            logits = acc * (qs * scale) * ks.T
            e = np.exp(logits - logits.max(-1, keepdims=True))
            s = e.sum(-1, keepdims=True)
            pq = np.round(e * 127.0)
            acc2 = pq @ vq[:, h * D:(h + 1) * D]
            heads.append(acc2 / (127.0 * s) * vs[:, h * D:(h + 1) * D])
        attn = np.concatenate(heads, axis=-1)
        aq, as_ = rows_q(attn)
        out = (aq @ wp) * as_ * sp + np.asarray(attn_q["proj"]["bias"])
        want[b] = x32 + out

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_int8_head(rng):
    """head=True quantizes the classifier; the int8 head tracks fp32."""
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    q = quantize_params(params)
    assert is_quantized(q["head"]["kernel"])
    assert not is_quantized(
        quantize_params(params, head=False)["head"]["kernel"])
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(vit_forward(params, x, CFG, None, "xla"))
    got = np.asarray(vit_forward(q, x, CFG, None, "xla"))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.15


def test_quantized_forward_close_to_fp32(rng):
    """End-to-end: the int8 model tracks the fp32 model closely on both
    backends, pruned schedule included."""
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    qparams = quantize_params(params, attn=False, head=False)  # MLP-only
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    ref = np.asarray(vit_forward(params, x, CFG, sched, "xla"))
    for impl in ("xla", "pallas"):
        got = np.asarray(vit_forward(qparams, x, CFG, sched, impl))
        assert np.isfinite(got).all()
        # int8 error budget: logits track within a small fraction of range
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.15, impl
        # both backends agree with each other tightly (same quantized math)
    a = np.asarray(vit_forward(qparams, x, CFG, sched, "xla"))
    b = np.asarray(vit_forward(qparams, x, CFG, sched, "pallas"))
    # xla path dequantizes weights (no activation quant) so a != b exactly;
    # they share the weight error and must stay close
    assert np.abs(a - b).max() / np.abs(a).max() < 0.1


def test_quantize_params_structure(rng):
    params = init_params(jax.random.key(0), CFG, jnp.bfloat16)
    q = quantize_params(params, attn=False)
    fc1 = q["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert is_quantized(fc1)
    # attention untouched with attn=False
    assert not is_quantized(q["blocks"][0]["attn"]["qkv"]["kernel"])
    # default quantizes attention projections too
    assert is_quantized(
        quantize_params(params)["blocks"][0]["attn"]["qkv"]["kernel"])
    # original params untouched (no aliasing surprises)
    assert not is_quantized(params["blocks"][0]["mlp"]["fc1"]["kernel"])


def test_attn_quantized_forward(rng):
    """attn=True quantization: QKV/proj run int8; logits stay close to fp32
    and both backends agree on the quantized model."""
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    qparams = quantize_params(params, attn=True)
    assert is_quantized(qparams["blocks"][0]["attn"]["qkv"]["kernel"])
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    ref = np.asarray(vit_forward(params, x, CFG, sched, "xla"))
    got_xla = np.asarray(vit_forward(qparams, x, CFG, sched, "xla"))
    got_pls = np.asarray(vit_forward(qparams, x, CFG, sched, "pallas"))
    denom = np.abs(ref).max()
    assert np.isfinite(got_pls).all()
    assert np.abs(got_xla - ref).max() / denom < 0.15
    assert np.abs(got_pls - ref).max() / denom < 0.2


def test_double_quantize_rejected(rng):
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    q = quantize_params(params)
    with pytest.raises(ValueError, match="already quantized"):
        quantize_params(q)


def test_wrapper_with_quantized_params(rng):
    from rajni_tpu import RAJNIViT

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    model = RAJNIViT(CFG, {1: {"keep_ratio": 0.6}},
                     params=quantize_params(params))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    out = model(x)
    assert out.shape == (2, CFG.num_classes)
    assert np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------
# Calibrated static activation scales (rajni_tpu.quant.calibrate_act_scales)
# --------------------------------------------------------------------------


def test_calibration_forward_matches_vit_forward(rng):
    """The calibration forward is a re-derivation of the XLA path; its
    logits must match vit_forward exactly (guards calibration drift)."""
    from rajni_tpu.quant import _calibration_forward

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    amax, head_amax, logits = _calibration_forward(params, x, CFG, sched)
    ref = vit_forward(params, x, CFG, sched, "xla")
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    assert len(amax) == CFG.depth
    assert all(len(row) == 4 for row in amax)
    assert all(float(m) > 0 for row in amax for m in row)
    assert float(head_amax) > 0


def test_calibrate_act_scales_api(rng):
    from rajni_tpu.quant import ActScales, calibrate_act_scales

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 32, 32, 3)) * 3, jnp.float32)
    s1 = calibrate_act_scales(params, x1, CFG)
    assert isinstance(s1, ActScales)
    assert len(s1.blocks) == CFG.depth
    hash(s1)  # static-jit-arg requirement
    # multi-batch calibration takes the elementwise max of the ranges
    s12 = calibrate_act_scales(params, [x1, x2], CFG)
    for row, row1 in zip(s12.blocks, s1.blocks):
        assert all(a >= b for a, b in zip(row, row1))
    # margin multiplies every scale
    s_m = calibrate_act_scales(params, x1, CFG, margin=2.0)
    np.testing.assert_allclose(
        np.asarray(s_m.blocks), 2 * np.asarray(s1.blocks), rtol=1e-6
    )
    assert s_m.head == pytest.approx(2 * s1.head, rel=1e-6)
    # calibration requires unquantized params
    with pytest.raises(ValueError, match="unquantized"):
        calibrate_act_scales(quantize_params(params), x1, CFG)


def test_static_int8_pruned_forward_close(rng):
    """Static-scale int8 (whole-block pruned kernels + head) tracks both
    the fp32 reference and the dynamic int8 path on calibration data."""
    from rajni_tpu.quant import calibrate_act_scales

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG, sched)
    q = quantize_params(params)

    ref = np.asarray(vit_forward(params, x, CFG, sched, "xla"))
    dyn = np.asarray(vit_forward(q, x, CFG, sched, "pallas"))
    stat = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, x, CFG, sched, "pallas", scales
        )
    )
    assert np.isfinite(stat).all()
    denom = np.abs(ref).max()
    assert np.abs(stat - ref).max() / denom < 0.2
    assert np.abs(stat - dyn).max() / denom < 0.15


def test_static_int8_stock_forward_close(rng):
    """No schedule: the stock whole-block int8 kernel's static path."""
    from rajni_tpu.quant import calibrate_act_scales

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG)
    q = quantize_params(params)

    ref = np.asarray(vit_forward(params, x, CFG, None, "xla"))
    stat = np.asarray(vit_forward(q, x, CFG, None, "pallas", scales))
    assert np.isfinite(stat).all()
    assert np.abs(stat - ref).max() / np.abs(ref).max() < 0.2


def test_static_int8_out_of_range_saturates(rng):
    """Inputs beyond the calibrated range must saturate (clip at ±127),
    never overflow or go non-finite."""
    from rajni_tpu.quant import calibrate_act_scales

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    x_small = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)) * 0.05, jnp.float32
    )
    scales = calibrate_act_scales(params, x_small, CFG)
    q = quantize_params(params)
    x_big = jnp.asarray(rng.standard_normal((2, 32, 32, 3)) * 20,
                        jnp.float32)
    out = np.asarray(vit_forward(q, x_big, CFG, None, "pallas", scales))
    assert np.isfinite(out).all()


def test_static_int8_two_kernel_fallback_close(rng, monkeypatch):
    """Force the two-kernel fallback (LN+QKV int8 -> gather+SDPA+proj int8
    -> standalone MLP int8): the calibrated static scales must flow
    through all three per-op kernels (r3: fallback static support)."""
    import rajni_tpu.kernels.block as blk
    from rajni_tpu.quant import calibrate_act_scales

    monkeypatch.setattr(blk, "_full_block_fits_int8",
                        lambda *a, **k: False)
    monkeypatch.setattr(blk, "_pruned_block_fits", lambda *a, **k: False)

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG, sched)
    q = quantize_params(params)

    ref = np.asarray(vit_forward(params, x, CFG, sched, "xla"))
    stat = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, x, CFG, sched, "pallas", scales
        )
    )
    assert np.isfinite(stat).all()
    assert np.abs(stat - ref).max() / np.abs(ref).max() < 0.2


def test_static_int8_pruned_attn_half_close(rng, monkeypatch):
    """Force the pruned attention-HALF mega-kernel route (whole-block
    refused, attn-half accepted): its static path folds (a_qkv, a_proj)
    and the MLP kernel takes the calibrated pair."""
    import rajni_tpu.kernels.block as blk
    from rajni_tpu.quant import calibrate_act_scales

    monkeypatch.setattr(blk, "_full_block_fits_int8",
                        lambda *a, **k: False)

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG, sched)
    q = quantize_params(params)

    ref = np.asarray(vit_forward(params, x, CFG, sched, "xla"))
    stat = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, x, CFG, sched, "pallas", scales
        )
    )
    assert np.isfinite(stat).all()
    assert np.abs(stat - ref).max() / np.abs(ref).max() < 0.2


def test_static_int8_stock_fallback_close(rng, monkeypatch):
    """Force the stock split route: the attn-half kernel folds
    (a_qkv, a_proj) and the MLP half takes the calibrated pair."""
    import rajni_tpu.kernels.block as blk
    from rajni_tpu.quant import calibrate_act_scales

    monkeypatch.setattr(blk, "_block_full_int8_fits",
                        lambda *a, **k: False)

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG)
    q = quantize_params(params)

    ref = np.asarray(vit_forward(params, x, CFG, None, "xla"))
    stat = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, x, CFG, None, "pallas", scales
        )
    )
    assert np.isfinite(stat).all()
    assert np.abs(stat - ref).max() / np.abs(ref).max() < 0.2


def _bias_perturbed_params(rng):
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    blocks = []
    for b in params["blocks"]:
        b = jax.tree_util.tree_map(lambda x: x, b)  # shallow copy pytree
        for path in (("attn", "qkv"), ("attn", "proj"), ("mlp", "fc1"),
                     ("mlp", "fc2")):
            d = b
            for k in path[:-1]:
                d = d[k]
            leaf = d[path[-1]]
            leaf["bias"] = leaf["bias"] + jnp.asarray(
                rng.standard_normal(leaf["bias"].shape) * 0.5, jnp.float32
            )
        blocks.append(b)
    params = dict(params, blocks=blocks)
    params["head"] = dict(
        params["head"],
        bias=params["head"]["bias"] + jnp.asarray(
            rng.standard_normal(params["head"]["bias"].shape) * 0.5,
            jnp.float32,
        ),
    )
    return params


@pytest.mark.parametrize("route", ["whole_block", "attn_half", "two_kernel",
                                   "bf16_tail"])
def test_static_int8_nonzero_bias_parity(rng, monkeypatch, route):
    """Static-scale parity with NONZERO biases on every kernel route —
    the V-column fold must scale the V-third of the qkv bias too, and the
    bf16 gather tail must never receive V-folded QKV."""
    import rajni_tpu.kernels.block as blk
    from rajni_tpu.quant import calibrate_act_scales

    if route == "attn_half":
        monkeypatch.setattr(blk, "_full_block_fits_int8",
                            lambda *a, **k: False)
    elif route == "two_kernel":
        monkeypatch.setattr(blk, "_full_block_fits_int8",
                            lambda *a, **k: False)
        monkeypatch.setattr(blk, "_pruned_block_fits",
                            lambda *a, **k: False)
    elif route == "bf16_tail":
        monkeypatch.setattr(blk, "_full_block_fits_int8",
                            lambda *a, **k: False)
        monkeypatch.setattr(blk, "_pruned_block_fits",
                            lambda *a, **k: False)
        monkeypatch.setattr(blk, "_gather_fits_fast",
                            lambda *a, **k: False)

    params = _bias_perturbed_params(rng)
    sched = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG, sched)
    q = quantize_params(params)

    ref = np.asarray(vit_forward(params, x, CFG, sched, "xla"))
    dyn = np.asarray(vit_forward(q, x, CFG, sched, "pallas"))
    stat = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, x, CFG, sched, "pallas", scales
        )
    )
    denom = np.abs(ref).max()
    # the static path must stay in the same error class as dynamic int8
    assert np.abs(dyn - ref).max() / denom < 0.1
    assert np.abs(stat - ref).max() / denom < 0.1
    assert np.abs(stat - dyn).max() / denom < 0.1


def test_static_int8_nonzero_bias_stock(rng):
    """Stock (no schedule) whole-block static route with nonzero biases."""
    from rajni_tpu.quant import calibrate_act_scales

    params = _bias_perturbed_params(rng)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG)
    q = quantize_params(params)
    ref = np.asarray(vit_forward(params, x, CFG, None, "xla"))
    stat = np.asarray(vit_forward(q, x, CFG, None, "pallas", scales))
    assert np.abs(stat - ref).max() / np.abs(ref).max() < 0.1


@pytest.mark.parametrize("static", [False, True])
def test_int8_mlp_hidden_chunk_route(rng, monkeypatch, static):
    """The streamed-chunk int8 MLP (ViT-g-class weights that exceed the
    resident budget) must match the unchunked kernel: exactly for static
    scales (same per-tensor quantize per chunk), tolerance for dynamic
    (per-chunk per-row scales are a finer grid than whole-row)."""
    import rajni_tpu.kernels.mlp as mlpmod
    from rajni_tpu.kernels.mlp import fused_ln_mlp_residual_int8
    from rajni_tpu.quant import quantize_weight

    B, N, C, Hd = 2, 8, 64, 512
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0,
                               jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)}
    mlp_q = {
        "fc1": {"kernel": quantize_weight(jnp.asarray(
                    rng.standard_normal((C, Hd)) * 0.1, jnp.float32)),
                "bias": jnp.asarray(rng.standard_normal(Hd) * 0.1,
                                    jnp.float32)},
        "fc2": {"kernel": quantize_weight(jnp.asarray(
                    rng.standard_normal((Hd, C)) * 0.1, jnp.float32)),
                "bias": jnp.asarray(rng.standard_normal(C) * 0.1,
                                    jnp.float32)},
    }
    scales = (2.0, 3.0) if static else None

    want = np.asarray(
        fused_ln_mlp_residual_int8(x, ln, mlp_q, act_scales=scales)
    )
    # shrink the budget so Hd=512 streams in 4 chunks of 128; clear the
    # jit cache or the second call replays the unchunked trace
    monkeypatch.setattr(mlpmod, "_WEIGHT_BUDGET", 2 * C * 128)
    assert mlpmod._hidden_chunk(C, Hd, 1) == 128  # chunk route engaged
    fused_ln_mlp_residual_int8.clear_cache()
    try:
        got = np.asarray(
            fused_ln_mlp_residual_int8(x, ln, mlp_q, act_scales=scales)
        )
    finally:
        fused_ln_mlp_residual_int8.clear_cache()  # don't poison later tests
    denom = np.abs(want).max()
    tol = 1e-5 if static else 0.05
    assert np.abs(got - want).max() / denom < tol
