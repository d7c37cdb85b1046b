"""Converter + checkpoint-IO tests.

The oracle here is an independent torch mini-ViT implementing the documented
timm ``VisionTransformer`` semantics (SURVEY.md §1/L0 interface contract:
conv patch-embed, CLS concat, pos-embed add, pre-norm blocks with packed-QKV
attention and erf-GELU MLP, final norm, CLS-only head). Its state_dict uses
timm naming, so it exercises the exact transposes/flattenings the converter
performs on real pretrained checkpoints.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import ViTConfig, vit_forward
from rajni_tpu.params.convert import convert_timm_state_dict
from rajni_tpu.params.io import load_params, save_params

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ViTConfig(
    img_size=32,
    patch_size=8,
    embed_dim=48,
    depth=3,
    num_heads=4,
    num_classes=11,
)


class TorchOracleViT(nn.Module):
    """timm-layout ViT written from the L0 interface spec (SURVEY.md §1).

    Covers the extended-variant surface too, each following the documented
    timm ``VisionTransformer`` semantics: ``qk_norm`` (per-head LayerNorm
    on q/k before the score matmul), register tokens (prefix after CLS,
    ``no_embed_class`` patch-only pos-embed applied before the prefix
    concat), and the pooled heads (``global_pool='avg'`` over the
    non-prefix tokens, ``fc_norm`` replacing the pre-pool norm)."""

    def __init__(self, cfg: ViTConfig, layer_scale: bool = False):
        super().__init__()
        C, P = cfg.embed_dim, cfg.patch_size
        self.cfg = cfg
        self.cls_token = nn.Parameter(torch.randn(1, 1, C) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, cfg.pos_embed_len, C) * 0.02
        )
        if cfg.distilled:
            self.dist_token = nn.Parameter(torch.randn(1, 1, C) * 0.02)
            self.head_dist = nn.Linear(C, cfg.num_classes)
        if cfg.reg_tokens:
            self.reg_token = nn.Parameter(
                torch.randn(1, cfg.reg_tokens, C) * 0.02
            )
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(cfg.in_chans, C, P, stride=P)}
        )
        self.blocks = nn.ModuleList(
            [self._block(cfg, layer_scale) for _ in range(cfg.depth)]
        )
        if cfg.fc_norm_resolved:
            self.norm = nn.Identity()  # timm: no norm weights in the sd
            self.fc_norm = nn.LayerNorm(C, eps=cfg.layer_norm_eps)
        else:
            self.norm = nn.LayerNorm(C, eps=cfg.layer_norm_eps)
        self.head = nn.Linear(C, cfg.num_classes)

    @staticmethod
    def _block(cfg, layer_scale):
        C, Hid = cfg.embed_dim, cfg.mlp_hidden
        attn = nn.ModuleDict(
            {"qkv": nn.Linear(C, 3 * C), "proj": nn.Linear(C, C)}
        )
        if cfg.qk_norm:
            D = cfg.head_dim
            attn["q_norm"] = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            attn["k_norm"] = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            # non-trivial affines so the test would catch a dropped norm
            with torch.no_grad():
                for m in (attn["q_norm"], attn["k_norm"]):
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.uniform_(-0.2, 0.2)
        block = nn.ModuleDict(
            {
                "norm1": nn.LayerNorm(C, eps=cfg.layer_norm_eps),
                "attn": attn,
                "norm2": nn.LayerNorm(C, eps=cfg.layer_norm_eps),
                "mlp": nn.ModuleDict(
                    {"fc1": nn.Linear(C, Hid), "fc2": nn.Linear(Hid, C)}
                ),
            }
        )
        if layer_scale:
            for name in ("ls1", "ls2"):
                mod = nn.Module()
                mod.gamma = nn.Parameter(torch.rand(C) * 1e-2)
                block[name] = mod
        return block

    def _attn(self, block, x):
        B, N, C = x.shape
        H = self.cfg.num_heads
        D = C // H
        qkv = block["attn"]["qkv"](x).reshape(B, N, 3, H, D).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if "q_norm" in block["attn"]:
            q = block["attn"]["q_norm"](q)
            k = block["attn"]["k_norm"](k)
        attn = (q @ k.transpose(-2, -1)) * D**-0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return block["attn"]["proj"](out)

    def forward(self, x):  # x: [B, 3, H, W]
        B = x.shape[0]
        cfg = self.cfg
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        if cfg.no_embed_class:
            x = x + self.pos_embed
        prefix = [self.cls_token.expand(B, -1, -1)]
        if cfg.distilled:
            prefix.append(self.dist_token.expand(B, -1, -1))
        if cfg.reg_tokens:
            prefix.append(self.reg_token.expand(B, -1, -1))
        x = torch.cat(prefix + [x], dim=1)
        if not cfg.no_embed_class:
            x = x + self.pos_embed[:, : x.shape[1]]
        gelu = nn.GELU()  # erf form (timm default)
        for blk in self.blocks:
            out = self._attn(blk, blk["norm1"](x))
            if "ls1" in blk:
                out = out * blk["ls1"].gamma
            x = x + out
            h = blk["mlp"]["fc2"](gelu(blk["mlp"]["fc1"](blk["norm2"](x))))
            if "ls2" in blk:
                h = h * blk["ls2"].gamma
            x = x + h
        x = self.norm(x)
        if cfg.distilled:
            # timm DeiT eval head: mean of the two heads
            return (self.head(x[:, 0]) + self.head_dist(x[:, 1])) / 2
        P = cfg.num_prefix_tokens
        if cfg.global_pool == "avg":
            feats = x[:, P:].mean(dim=1)
        else:
            feats = x[:, 0]
        if cfg.fc_norm_resolved:
            feats = self.fc_norm(feats)
        return self.head(feats)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    return TorchOracleViT(CFG).eval()


def _images(rng, batch=4):
    return rng.standard_normal((batch, CFG.img_size, CFG.img_size, 3)).astype(
        np.float32
    )


def test_converted_logits_match_torch(oracle, rng):
    cfg = dataclass_replace(CFG)
    params = convert_timm_state_dict(oracle.state_dict(), cfg, np.float32)
    imgs = _images(rng)

    with torch.no_grad():
        want = oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(vit_forward(params, jnp.asarray(imgs), cfg, None))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_converted_logits_match_torch_layer_scale(rng):
    torch.manual_seed(1)
    cfg = dataclass_replace(CFG, use_layer_scale=True)
    oracle = TorchOracleViT(cfg, layer_scale=True).eval()
    params = convert_timm_state_dict(oracle.state_dict(), cfg, np.float32)
    imgs = _images(rng)

    with torch.no_grad():
        want = oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(vit_forward(params, jnp.asarray(imgs), cfg, None))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_depth_mismatch_raises(oracle):
    import dataclasses

    shallow = dataclasses.replace(CFG, depth=2)
    deep = dataclasses.replace(CFG, depth=4)
    with pytest.raises(ValueError, match="more than 2 blocks"):
        convert_timm_state_dict(oracle.state_dict(), shallow)
    with pytest.raises(KeyError, match="depth"):
        convert_timm_state_dict(oracle.state_dict(), deep)


def test_qk_norm_without_config_flag_rejected(oracle):
    """qk-norm weights with a qk_norm=False config must raise (a LayerNorm
    normalizes even with identity affine weights — silently ignoring the
    keys would be silently wrong logits); adapt_config is the fix."""
    from rajni_tpu.params.convert import adapt_config

    sd = dict(oracle.state_dict())
    sd["blocks.0.attn.q_norm.weight"] = torch.ones(CFG.head_dim)
    with pytest.raises(ValueError, match="qk_norm"):
        convert_timm_state_dict(sd, CFG)
    assert adapt_config(CFG, sd).qk_norm is True
    # and the flag without the weights is a mismatch too
    with pytest.raises(ValueError, match="qk_norm"):
        convert_timm_state_dict(
            oracle.state_dict(), dataclass_replace(CFG, qk_norm=True)
        )


# ---------------------------------------------------------------------------
# Extended timm variants (qk-norm / registers / pooled heads): converted
# logits must match the torch oracle running the documented timm semantics.
# ---------------------------------------------------------------------------


def _variant_parity(cfg, seed=2, batch=3):
    torch.manual_seed(seed)
    oracle = TorchOracleViT(cfg).eval()
    params = convert_timm_state_dict(oracle.state_dict(), cfg, np.float32)
    imgs = np.random.default_rng(seed).standard_normal(
        (batch, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(vit_forward(params, jnp.asarray(imgs), cfg, None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    return oracle, params


def test_qk_norm_parity():
    _variant_parity(dataclass_replace(CFG, qk_norm=True))


def test_qk_norm_is_load_bearing():
    """Dropping the q/k norms from the converted tree must change the
    logits — guards against a forward that carries but ignores them."""
    cfg = dataclass_replace(CFG, qk_norm=True)
    torch.manual_seed(3)
    oracle = TorchOracleViT(cfg).eval()
    params = convert_timm_state_dict(oracle.state_dict(), cfg, np.float32)
    imgs = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    with_norm = np.asarray(vit_forward(params, imgs, cfg, None))
    stripped = dict(params)
    stripped["blocks"] = [
        {**b, "attn": {k: v for k, v in b["attn"].items()
                       if k in ("qkv", "proj")}}
        for b in params["blocks"]
    ]
    without = np.asarray(vit_forward(stripped, imgs, cfg, None))
    assert np.abs(with_norm - without).max() > 1e-3


def test_register_tokens_parity():
    _variant_parity(
        dataclass_replace(CFG, reg_tokens=3, no_embed_class=True)
    )


def test_avg_pool_fc_norm_parity():
    _variant_parity(dataclass_replace(CFG, global_pool="avg"))


def test_avg_pool_without_fc_norm_parity():
    _variant_parity(
        dataclass_replace(CFG, global_pool="avg", use_fc_norm=False)
    )


def test_combined_variant_parity():
    """DINOv2-shaped: registers + qk-norm + avg pool, all at once."""
    _variant_parity(
        dataclass_replace(
            CFG, reg_tokens=2, no_embed_class=True, qk_norm=True,
            global_pool="avg",
        )
    )


def test_distilled_deit_parity():
    """DeiT distillation: dist token joins the always-kept prefix; eval
    logits are the mean of the CLS and distillation heads (timm deit.py
    semantics — the reference would read only CLS, model.py:65-66)."""
    _variant_parity(dataclass_replace(CFG, distilled=True))


def test_distilled_adapt_and_trace():
    from rajni_tpu.models.vit import adapt_config_to_params, model_stats
    from rajni_tpu.params.convert import adapt_config

    cfg = dataclass_replace(CFG, distilled=True)
    torch.manual_seed(6)
    sd = TorchOracleViT(cfg).state_dict()
    assert adapt_config(CFG, sd).distilled is True
    params = convert_timm_state_dict(sd, cfg, np.float32)
    assert adapt_config_to_params(CFG, params).distilled is True
    # 16 patches + (CLS, dist): keep = int(0.5·16) = 8 → 10 tokens
    trace = model_stats(cfg, {1: {"keep_ratio": 0.5}})["token_counts"]
    assert trace == [18, 18, 10]
    with pytest.raises(ValueError, match="distil"):
        convert_timm_state_dict(sd, CFG)


def test_adapt_config_from_state_dict():
    from rajni_tpu.params.convert import adapt_config

    cfg = dataclass_replace(
        CFG, reg_tokens=3, no_embed_class=True, qk_norm=True,
        global_pool="avg",
    )
    torch.manual_seed(4)
    sd = TorchOracleViT(cfg).state_dict()
    adapted = adapt_config(CFG, sd)
    # adapters set use_fc_norm explicitly (fc_norm presence is what the
    # checkpoint encodes); compare the resolved semantics
    assert adapted == dataclass_replace(cfg, use_fc_norm=True)
    assert adapted.fc_norm_resolved == cfg.fc_norm_resolved
    # and the adapted config converts cleanly
    params = convert_timm_state_dict(sd, adapted, np.float32)
    assert "fc_norm" in params and "reg_token" in params


def test_adapt_config_to_params():
    from rajni_tpu.models.vit import adapt_config_to_params

    cfg = dataclass_replace(
        CFG, reg_tokens=3, no_embed_class=True, qk_norm=True,
        global_pool="avg",
    )
    torch.manual_seed(5)
    params = convert_timm_state_dict(
        TorchOracleViT(cfg).state_dict(), cfg, np.float32
    )
    assert adapt_config_to_params(CFG, params) == dataclass_replace(
        cfg, use_fc_norm=True
    )
    # classic params leave a classic config untouched
    torch.manual_seed(5)
    classic = convert_timm_state_dict(
        TorchOracleViT(CFG).state_dict(), CFG, np.float32
    )
    assert adapt_config_to_params(CFG, classic) == CFG


def test_variant_presence_mismatches_raise(oracle):
    sd = dict(oracle.state_dict())
    with pytest.raises(ValueError, match="fc_norm"):
        convert_timm_state_dict(sd, dataclass_replace(CFG, global_pool="avg"))
    with pytest.raises(ValueError, match="reg"):
        convert_timm_state_dict(
            sd, dataclass_replace(CFG, reg_tokens=2, no_embed_class=True)
        )


def test_save_load_roundtrip(oracle, tmp_path):
    params = convert_timm_state_dict(oracle.state_dict(), CFG, np.float32)
    path = str(tmp_path / "ckpt.msgpack")
    save_params(path, params)
    loaded = load_params(path)

    assert isinstance(loaded["blocks"], list) and len(loaded["blocks"]) == CFG.depth
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_leaves_with_path(loaded)
    }
    assert len(flat_a) == len(flat_b)
    for path_key, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(path_key)])
        )


def test_load_dtype_cast(oracle, tmp_path):
    params = convert_timm_state_dict(oracle.state_dict(), CFG, np.float32)
    path = str(tmp_path / "ckpt.msgpack")
    save_params(path, params)
    loaded = load_params(path, dtype=jnp.bfloat16)
    assert loaded["cls_token"].dtype == jnp.bfloat16


def test_load_dtype_cast_preserves_quantized_records(oracle, tmp_path):
    """Loading a quantized checkpoint with dtype= must NOT cast the int8
    weights / fp32 scales (ADVICE r1: a bf16-cast int8 record would still
    route into the int8 kernels and silently corrupt the forward)."""
    from rajni_tpu.quant import quantize_params

    params = quantize_params(
        convert_timm_state_dict(oracle.state_dict(), CFG, np.float32)
    )
    path = str(tmp_path / "q.msgpack")
    save_params(path, params)
    loaded = load_params(path, dtype=jnp.bfloat16)

    rec = loaded["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert rec["int8"].dtype == jnp.int8
    assert rec["scale"].dtype == jnp.float32
    # non-quantized leaves still get the cast
    assert loaded["cls_token"].dtype == jnp.bfloat16
    assert loaded["blocks"][0]["mlp"]["fc1"]["bias"].dtype == jnp.bfloat16


def test_resample_pos_embed_matches_torch_bicubic():
    """resample_pos_embed ≡ F.interpolate(mode='bicubic',
    align_corners=False) — the exact resampler timm applies on a resolution
    change (VERDICT r1 missing #3). Grid 7×7 → 12×12 (ViT-ish upscale)."""
    import torch.nn.functional as F

    from rajni_tpu.params.convert import resample_pos_embed

    rng = np.random.default_rng(0)
    C = 16
    pe = rng.standard_normal((1, 1 + 7 * 7, C)).astype(np.float32)

    got = resample_pos_embed(pe, 1 + 12 * 12)

    grid = torch.from_numpy(pe[:, 1:].reshape(1, 7, 7, C).transpose(0, 3, 1, 2))
    want = F.interpolate(grid, size=(12, 12), mode="bicubic",
                         align_corners=False, antialias=True)
    want = want.permute(0, 2, 3, 1).reshape(1, 144, C).numpy()

    np.testing.assert_array_equal(got[:, :1], pe[:, :1])  # CLS untouched
    np.testing.assert_allclose(got[:, 1:], want, rtol=1e-5, atol=1e-5)


def test_resample_pos_embed_downscale_matches_torch():
    """Downscale uses torch's ANTIALIASED bicubic — timm's
    resample_abs_pos_embed defaults antialias=True, and torch applies it
    exactly when downscaling (loading a 384 checkpoint into a 224 config)."""
    import torch.nn.functional as F

    from rajni_tpu.params.convert import resample_pos_embed

    rng = np.random.default_rng(1)
    C = 8
    pe = rng.standard_normal((1, 1 + 14 * 14, C)).astype(np.float32)
    got = resample_pos_embed(pe, 1 + 7 * 7)
    grid = torch.from_numpy(
        pe[:, 1:].reshape(1, 14, 14, C).transpose(0, 3, 1, 2)
    )
    want = F.interpolate(grid, size=(7, 7), mode="bicubic",
                         align_corners=False, antialias=True)
    want = want.permute(0, 2, 3, 1).reshape(1, 49, C).numpy()
    np.testing.assert_allclose(got[:, 1:], want, rtol=1e-4, atol=1e-5)


def test_convert_resolution_transfer(oracle):
    """A 32px-pretrained oracle checkpoint loads into a 64px config — the
    reference gets this free from timm (run.py:89); the converter resamples
    the pos-embed and the forward runs at the new resolution."""
    import dataclasses

    cfg64 = dataclasses.replace(CFG, img_size=64)
    params = convert_timm_state_dict(oracle.state_dict(), cfg64, np.float32)
    assert params["pos_embed"].shape == (1, cfg64.num_tokens, CFG.embed_dim)

    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    logits = vit_forward(params, x, cfg64)
    assert logits.shape == (2, CFG.num_classes)
    assert bool(jnp.isfinite(logits).all())


def dataclass_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw) if kw else cfg


def test_orbax_roundtrip(oracle, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from rajni_tpu.params.io import load_params, save_params_orbax

    params = convert_timm_state_dict(oracle.state_dict(), CFG, np.float32)
    path = str(tmp_path / "orbax_ckpt")
    save_params_orbax(path, params)
    loaded = load_params(path)  # directory → orbax backend auto-detected
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"][0]["attn"]["qkv"]["kernel"]),
        np.asarray(params["blocks"][0]["attn"]["qkv"]["kernel"]),
    )
    assert isinstance(loaded["blocks"], list)


def test_unconsumed_keys_rejected(oracle):
    """Weights the converter does not model (norm_pre, head_dist, ...)
    must raise instead of being silently dropped — dropped semantic
    weights mean silently wrong logits."""
    sd = dict(oracle.state_dict())
    sd["norm_pre.weight"] = torch.rand(CFG.embed_dim)
    sd["norm_pre.bias"] = torch.rand(CFG.embed_dim)
    with pytest.raises(ValueError, match="does not model"):
        convert_timm_state_dict(sd, CFG)


def test_bfloat16_torch_checkpoint_converts(oracle, rng):
    """torch bf16 tensors have no .numpy(); the converter must round-trip
    through f32 (exact) instead of crashing on modern bf16 checkpoints."""
    sd = {k: v.to(torch.bfloat16) for k, v in oracle.state_dict().items()}
    params = convert_timm_state_dict(sd, CFG, np.float32)
    x = jnp.asarray(_images(rng, 2))
    out = np.asarray(vit_forward(params, x, CFG))
    assert out.shape == (2, CFG.num_classes)
    assert np.isfinite(out).all()
