"""End-to-end golden-logits test: full *pruned* forward vs an independent
torch re-derivation of the reference semantics (SURVEY.md §4 item 2).

The oracle below composes the torch mini-ViT from test_params with the RAJNI
pruning pipeline written directly from the documented semantics
(SURVEY.md §2/§3 — importance scoring, keep arithmetic, sorted-top-k + CLS
prepend, QKV and residual-stream gathers, score threading/invalidation),
sharing no code with rajni_tpu. Any agreement bug in either implementation
would show up as a logits mismatch.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import ViTConfig, model_stats, vit_forward
from rajni_tpu.params.convert import convert_timm_state_dict
from rajni_tpu.utils.schedule import normalize_schedule

torch = pytest.importorskip("torch")

from tests.test_params import TorchOracleViT  # noqa: E402

CFG = ViTConfig(
    img_size=48,
    patch_size=8,
    embed_dim=64,
    depth=4,
    num_heads=4,
    num_classes=13,
)
# exercises: fresh scoring, update=False reuse, an unpruned block resetting
# scores, and a final pruned block rescoring from scratch
SCHEDULE = {
    1: {"keep_ratio": 0.7, "update": True},
    2: {"keep_ratio": 0.8, "update": False},
    3: {"keep_ratio": 0.5, "update": True},
}


def torch_importance(qkv: torch.Tensor, num_heads: int, eps=1e-6):
    """Reference C1 semantics (SURVEY.md §2), written from the spec."""
    B, N, three_c = qkv.shape
    C = three_c // 3
    D = C // num_heads
    q, k, v = (
        qkv.reshape(B, N, 3, num_heads, D).permute(2, 0, 3, 1, 4).unbind(0)
    )
    attn = torch.softmax(
        (q[:, :, 0:1] @ k.transpose(-2, -1)) / D**0.5, dim=-1
    )  # [B, H, 1, N]
    a_cls = attn.mean(dim=1)[:, 0]  # [B, N]

    V = v.mean(dim=1)  # [B, N, D]
    V = V - V.mean(dim=1, keepdim=True)
    vn = V.norm(dim=-1)  # [B, N]
    z = (vn - vn.mean(dim=1, keepdim=True)) / (
        vn.std(dim=1, keepdim=True) + eps
    )
    return a_cls * torch.sigmoid(z)


def torch_pruned_forward(oracle: TorchOracleViT, x: torch.Tensor, schedule):
    """Reference RAJNIViTWrapper.forward semantics (SURVEY.md §3.3/§3.4)."""
    cfg = oracle.cfg
    H = cfg.num_heads
    B = x.shape[0]
    x = oracle.patch_embed["proj"](x).flatten(2).transpose(1, 2)
    x = torch.cat([oracle.cls_token.expand(B, -1, -1), x], dim=1)
    x = x + oracle.pos_embed[:, : x.shape[1]]

    gelu = torch.nn.GELU()
    scores = None
    token_counts = []
    for i, blk in enumerate(oracle.blocks):
        token_counts.append(x.shape[1])
        if i in schedule:
            spec = schedule[i]
            x_norm = blk["norm1"](x)
            qkv = blk["attn"]["qkv"](x_norm)  # full token set
            if spec.get("update", True) or scores is None:
                scores = torch_importance(qkv, H)
            N = x.shape[1]
            keep = max(1, int(spec["keep_ratio"] * (N - 1)))
            _, idx = torch.topk(scores[:, 1:], keep, dim=1)
            idx, _ = torch.sort(idx, dim=1)
            keep_idx = torch.cat(
                [torch.zeros(B, 1, dtype=idx.dtype), idx + 1], dim=1
            )
            qkv = torch.gather(
                qkv, 1, keep_idx[..., None].expand(-1, -1, qkv.shape[-1])
            )
            Np = qkv.shape[1]
            D = cfg.embed_dim // H
            q, k, v = (
                qkv.reshape(B, Np, 3, H, D).permute(2, 0, 3, 1, 4).unbind(0)
            )
            attn = torch.softmax((q @ k.transpose(-2, -1)) * D**-0.5, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(B, Np, cfg.embed_dim)
            out = blk["attn"]["proj"](out)
            scores = torch.gather(scores, 1, keep_idx)
            # residual compaction BEFORE the residual add (model.py:55-56)
            x = torch.gather(
                x, 1, keep_idx[..., None].expand(-1, -1, x.shape[-1])
            )
            x = x + out
            x = x + blk["mlp"]["fc2"](
                gelu(blk["mlp"]["fc1"](blk["norm2"](x)))
            )
        else:
            out = oracle._attn(blk, blk["norm1"](x))
            x = x + out
            x = x + blk["mlp"]["fc2"](
                gelu(blk["mlp"]["fc1"](blk["norm2"](x)))
            )
            scores = None  # invalidation (model.py:63)

    x = oracle.norm(x)
    return oracle.head(x[:, 0]), token_counts


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    return TorchOracleViT(CFG).eval()


def test_pruned_logits_match_torch_oracle(oracle, rng):
    params = convert_timm_state_dict(oracle.state_dict(), CFG, np.float32)
    schedule = normalize_schedule(SCHEDULE, CFG.depth)
    imgs = rng.standard_normal((3, CFG.img_size, CFG.img_size, 3)).astype(
        np.float32
    )

    with torch.no_grad():
        want, token_counts = torch_pruned_forward(
            oracle, torch.from_numpy(imgs).permute(0, 3, 1, 2), SCHEDULE
        )

    fwd = jax.jit(vit_forward, static_argnums=(2, 3, 4))
    for impl in ("xla", "pallas"):
        got = np.asarray(fwd(params, jnp.asarray(imgs), CFG, schedule, impl))
        np.testing.assert_allclose(
            got, want.numpy(), rtol=1e-4, atol=2e-4, err_msg=impl
        )

    assert model_stats(CFG, schedule)["token_counts"] == token_counts


def test_update_false_reuse_changes_result(oracle, rng):
    """update=False must actually reuse scores: flipping block 2 to
    update=True changes the selection (sanity that the flag is live)."""
    params = convert_timm_state_dict(oracle.state_dict(), CFG, np.float32)
    imgs = jnp.asarray(
        rng.standard_normal((3, CFG.img_size, CFG.img_size, 3)), jnp.float32
    )
    reuse = normalize_schedule(SCHEDULE, CFG.depth)
    rescore = normalize_schedule(
        {**SCHEDULE, 2: {"keep_ratio": 0.8, "update": True}}, CFG.depth
    )
    a = np.asarray(vit_forward(params, imgs, CFG, reuse))
    b = np.asarray(vit_forward(params, imgs, CFG, rescore))
    assert not np.allclose(a, b)


# ---------------------------------------------------------------------------
# Extended-variant pruning: the same independent torch re-derivation,
# generalized exactly the way the JAX side documents it (CLAUDE.md /
# ops/pruning.py): the CLS[+dist][+register] prefix is always kept and never
# ranked, keep = max(1, int(ratio * patches)), the scorer's CLS row sees the
# per-head-normed q/k under qk_norm, and the pooled/distilled heads read the
# *surviving* tokens. The reference itself silently misbehaves on these
# configs (attention.py:8-12 drops q_norm/k_norm; model.py:65-66 reads only
# CLS) — these tests pin our *documented* generalization instead.


def torch_importance_ext(qkv, attn_mod, num_heads, eps=1e-6):
    """C1 semantics with the qk-norm generalization (scorer follows the
    attention the model actually computes; raw v, as in timm)."""
    B, N, three_c = qkv.shape
    C = three_c // 3
    D = C // num_heads
    q, k, v = (
        qkv.reshape(B, N, 3, num_heads, D).permute(2, 0, 3, 1, 4).unbind(0)
    )
    if "q_norm" in attn_mod:
        q = attn_mod["q_norm"](q)
        k = attn_mod["k_norm"](k)
    attn = torch.softmax(
        (q[:, :, 0:1] @ k.transpose(-2, -1)) / D**0.5, dim=-1
    )
    a_cls = attn.mean(dim=1)[:, 0]
    V = v.mean(dim=1)
    V = V - V.mean(dim=1, keepdim=True)
    vn = V.norm(dim=-1)
    z = (vn - vn.mean(dim=1, keepdim=True)) / (
        vn.std(dim=1, keepdim=True) + eps
    )
    return a_cls * torch.sigmoid(z)


def torch_pruned_forward_ext(oracle: TorchOracleViT, x, schedule):
    """RAJNI pruned forward generalized to the extended-variant surface."""
    cfg = oracle.cfg
    H = cfg.num_heads
    P = cfg.num_prefix_tokens
    B = x.shape[0]
    x = oracle.patch_embed["proj"](x).flatten(2).transpose(1, 2)
    if cfg.no_embed_class:
        x = x + oracle.pos_embed
    prefix = [oracle.cls_token.expand(B, -1, -1)]
    if cfg.distilled:
        prefix.append(oracle.dist_token.expand(B, -1, -1))
    if cfg.reg_tokens:
        prefix.append(oracle.reg_token.expand(B, -1, -1))
    x = torch.cat(prefix + [x], dim=1)
    if not cfg.no_embed_class:
        x = x + oracle.pos_embed[:, : x.shape[1]]

    gelu = torch.nn.GELU()
    scores = None
    token_counts = []
    for i, blk in enumerate(oracle.blocks):
        token_counts.append(x.shape[1])
        if i in schedule:
            spec = schedule[i]
            x_norm = blk["norm1"](x)
            qkv = blk["attn"]["qkv"](x_norm)
            if spec.get("update", True) or scores is None:
                scores = torch_importance_ext(qkv, blk["attn"], H)
            N = x.shape[1]
            keep = max(1, int(spec["keep_ratio"] * (N - P)))
            _, idx = torch.topk(scores[:, P:], keep, dim=1)
            idx, _ = torch.sort(idx, dim=1)
            keep_idx = torch.cat(
                [
                    torch.arange(P, dtype=idx.dtype)
                    .unsqueeze(0)
                    .expand(B, -1),
                    idx + P,
                ],
                dim=1,
            )
            qkv = torch.gather(
                qkv, 1, keep_idx[..., None].expand(-1, -1, qkv.shape[-1])
            )
            Np = qkv.shape[1]
            D = cfg.embed_dim // H
            q, k, v = (
                qkv.reshape(B, Np, 3, H, D).permute(2, 0, 3, 1, 4).unbind(0)
            )
            if "q_norm" in blk["attn"]:
                q = blk["attn"]["q_norm"](q)
                k = blk["attn"]["k_norm"](k)
            attn = torch.softmax(
                (q @ k.transpose(-2, -1)) * D**-0.5, dim=-1
            )
            out = (attn @ v).transpose(1, 2).reshape(B, Np, cfg.embed_dim)
            out = blk["attn"]["proj"](out)
            if "ls1" in blk:
                out = out * blk["ls1"].gamma
            scores = torch.gather(scores, 1, keep_idx)
            x = torch.gather(
                x, 1, keep_idx[..., None].expand(-1, -1, x.shape[-1])
            )
            x = x + out
            h = blk["mlp"]["fc2"](gelu(blk["mlp"]["fc1"](blk["norm2"](x))))
            if "ls2" in blk:
                h = h * blk["ls2"].gamma
            x = x + h
        else:
            out = oracle._attn(blk, blk["norm1"](x))
            if "ls1" in blk:
                out = out * blk["ls1"].gamma
            x = x + out
            h = blk["mlp"]["fc2"](gelu(blk["mlp"]["fc1"](blk["norm2"](x))))
            if "ls2" in blk:
                h = h * blk["ls2"].gamma
            x = x + h
            scores = None

    x = oracle.norm(x)
    if cfg.distilled:
        logits = (oracle.head(x[:, 0]) + oracle.head_dist(x[:, 1])) / 2
        return logits, token_counts
    if cfg.global_pool == "avg":
        feats = x[:, P:].mean(dim=1)
    else:
        feats = x[:, 0]
    if cfg.fc_norm_resolved:
        feats = oracle.fc_norm(feats)
    return oracle.head(feats), token_counts


def _ext_pruned_parity(cfg, layer_scale=False, seed=11):
    torch.manual_seed(seed)
    oracle = TorchOracleViT(cfg, layer_scale=layer_scale).eval()
    params = convert_timm_state_dict(oracle.state_dict(), cfg, np.float32)
    schedule = normalize_schedule(SCHEDULE, cfg.depth)
    imgs = np.random.default_rng(seed).standard_normal(
        (3, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32)

    with torch.no_grad():
        want, token_counts = torch_pruned_forward_ext(
            oracle, torch.from_numpy(imgs).permute(0, 3, 1, 2), SCHEDULE
        )

    got = np.asarray(
        vit_forward(params, jnp.asarray(imgs), cfg, schedule)
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=2e-4)
    assert model_stats(cfg, schedule)["token_counts"] == token_counts


def test_pruned_distilled_matches_torch_oracle():
    import dataclasses

    _ext_pruned_parity(dataclasses.replace(CFG, distilled=True))


def test_pruned_registers_qk_norm_matches_torch_oracle():
    import dataclasses

    _ext_pruned_parity(
        dataclasses.replace(
            CFG, reg_tokens=3, no_embed_class=True, qk_norm=True,
            use_layer_scale=True,
        ),
        layer_scale=True,
    )


def test_pruned_avg_pool_matches_torch_oracle():
    import dataclasses

    _ext_pruned_parity(dataclasses.replace(CFG, global_pool="avg"))
