"""TPU-native Vision Transformer with first-class RAJNI token pruning.

This is *not* a wrapper. The reference monkey-patches a pretrained timm ViT
(`/root/reference/rajni/wrapper/model.py:13-23`); here the ViT is built
natively as a pure function over a parameter pytree, with pruning a
schedule-parameterized part of the forward itself. The schedule is a static
jit argument, so each (schedule, resolution, batch) tuple compiles to one XLA
program with fully static per-block shapes (SURVEY.md §2 "critical insight").

Forward semantics mirror the reference exactly (model.py:30-69):
  patch-embed → CLS concat → pos-embed (sliced to seq len) + pos-drop →
  12× pre-norm blocks (pruned or stock) → final norm → head on CLS only.

Pruned block (model.py:51-59):
  ``x_norm = norm1(x)``; attention scores/selects/prunes (see
  :func:`rajni_tpu.ops.attention.pruned_attention`); the **pre-norm residual
  stream is gathered with the same keep_idx before the residual add**
  (model.py:55-56); then ``x += ls1(out)``; ``x += ls2(mlp(norm2(x)))``.
  Drop-path is inference-inert (eval mode) and omitted; layer-scale is applied
  when the params carry ``ls1``/``ls2`` (mirroring the hasattr fallbacks at
  model.py:45-48).

Stock block: standard timm pre-norm block; any stock block resets the threaded
scores to ``None`` (model.py:61-63), so ``update=false`` only ever reuses
scores from an *immediately preceding* pruned block.

Data layout is NHWC (``[B, H, W, 3]``) — canonical for TPU; the patch-embed
conv is expressed as an MXU-friendly patch-extract + single matmul.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.attention import attention, pruned_attention
from ..ops.pruning import keep_count
from ..utils.schedule import Schedule, normalize_schedule, token_count_trace

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static architecture config (hashable → usable as a jit-static arg)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    use_layer_scale: bool = False
    layer_scale_init: float = 1e-5
    # -- extended timm-variant surface (beyond the classic ViT the reference
    # was written against; the reference CLI forwards ANY timm name,
    # run.py:28-29, so these checkpoints are in its nominal scope — it would
    # run them subtly wrong: qk-norm silently dropped in pruned blocks
    # (attention.py:8-12 steals only qkv/proj), registers ranked as if they
    # were patches, pooled heads read as CLS (model.py:65-66). Here they are
    # modeled correctly, with the pruning semantics generalized: the
    # *prefix* (CLS + registers) is always kept and never ranked. --
    reg_tokens: int = 0  # DINOv2-style register tokens after CLS
    distilled: bool = False  # DeiT distillation token + second head
    no_embed_class: bool = False  # pos-embed covers patches only (timm flag)
    qk_norm: bool = False  # per-head LayerNorm on q and k (ViT-22B style)
    global_pool: str = "token"  # "token" (CLS head) or "avg" (patch mean)
    use_fc_norm: bool | None = None  # None → (global_pool == "avg"), timm rule

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_prefix_tokens(self) -> int:
        """Always-kept leading tokens: CLS [+ distillation token]
        [+ registers] (timm naming and ordering)."""
        return 1 + int(self.distilled) + self.reg_tokens

    @property
    def num_tokens(self) -> int:
        """Patches + prefix (197 for ViT-B/16 @ 224; 577 @ 384)."""
        return self.num_patches + self.num_prefix_tokens

    @property
    def pos_embed_len(self) -> int:
        """Rows in ``pos_embed``: patches only under ``no_embed_class``
        (timm applies the pos-embed before prefix concat then), else the
        full token count."""
        return self.num_patches if self.no_embed_class else self.num_tokens

    @property
    def fc_norm_resolved(self) -> bool:
        """timm's ``use_fc_norm`` default: follows ``global_pool == 'avg'``
        unless explicitly set. True → the final norm moves *after* pooling
        (params carry ``fc_norm`` instead of ``norm``)."""
        if self.use_fc_norm is None:
            return self.global_pool == "avg"
        return self.use_fc_norm

    @property
    def kernel_path_supported(self) -> bool:
        """Whether the fused Pallas block kernels implement this config.

        The kernels hard-code the classic reference semantics (single CLS
        prefix, no qk-norm); extended configs transparently demote
        ``impl="pallas"`` to the XLA ops path in :func:`vit_forward` —
        correctness over speed, same rule as the per-kernel VMEM refusals.
        Pooled heads are fine (the head is XLA on every path).
        """
        return self.num_prefix_tokens == 1 and not self.qk_norm

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def attn_scale(self) -> float:
        """Softmax scale: ``head_dim ** -0.5`` (timm default; reference
        attention.py:9 steals this from the wrapped module)."""
        return self.head_dim**-0.5

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


# Registry keyed by the timm model names the reference CLI accepts
# (reference run.py:28-29, README.md:19). deit_small shares vit_small's
# architecture (distinct pretrained weights only).
VARIANTS: dict[str, ViTConfig] = {
    "vit_tiny_patch16_224": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "vit_small_patch16_224": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "deit_small_patch16_224": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16_224": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "vit_base_patch16_384": ViTConfig(
        img_size=384, embed_dim=768, depth=12, num_heads=12
    ),
    "vit_large_patch16_224": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
    # 16×16 grid + CLS = 257 tokens; head_dim 80
    "vit_huge_patch14_224": ViTConfig(
        patch_size=14, embed_dim=1280, depth=32, num_heads=16
    ),
    # DINOv2 + registers (timm vit_*_patch14_reg4_dinov2): 518px, 4 register
    # tokens, patch-only pos-embed, LayerScale. (The giant variant uses a
    # SwiGLU MLP — not modeled; small/base/large are plain-MLP.)
    "vit_small_patch14_reg4_dinov2": ViTConfig(
        img_size=518, patch_size=14, embed_dim=384, depth=12, num_heads=6,
        reg_tokens=4, no_embed_class=True, use_layer_scale=True,
    ),
    "vit_base_patch14_reg4_dinov2": ViTConfig(
        img_size=518, patch_size=14, embed_dim=768, depth=12, num_heads=12,
        reg_tokens=4, no_embed_class=True, use_layer_scale=True,
    ),
    "vit_large_patch14_reg4_dinov2": ViTConfig(
        img_size=518, patch_size=14, embed_dim=1024, depth=24, num_heads=16,
        reg_tokens=4, no_embed_class=True, use_layer_scale=True,
    ),
}


# timm size-word → (embed_dim, depth, num_heads, mlp_ratio); the reference
# CLI forwards ANY timm name (run.py:28-29), so names outside VARIANTS are
# parsed from the canonical `{family}_{size}_patch{P}_{res}` grammar.
_SIZE_WORDS: dict[str, tuple[int, int, int, float]] = {
    "tiny": (192, 12, 3, 4.0),
    "small": (384, 12, 6, 4.0),
    "medium": (512, 12, 8, 4.0),
    "base": (768, 12, 12, 4.0),
    "large": (1024, 24, 16, 4.0),
    "huge": (1280, 32, 16, 4.0),
    "giant": (1408, 40, 16, 48 / 11),
    "gigantic": (1664, 48, 16, 64 / 13),
}


def _parse_model_name(name: str) -> ViTConfig | None:
    """`vit_large_patch14_336` → ViTConfig, for names not in VARIANTS.

    An optional ``_reg{R}`` segment after the patch size (timm register
    convention, e.g. ``vit_base_patch16_reg4_224``) sets ``reg_tokens=R``
    with a patch-only pos-embed (``no_embed_class=True`` — what every timm
    register config uses).
    """
    import re

    m = re.fullmatch(
        r"(vit|deit|deit3)_([a-z]+)(_distilled)?_patch(\d+)(?:_reg(\d+))?_(\d+)",
        name,
    )
    if m is None or m.group(2) not in _SIZE_WORDS:
        return None
    dim, depth, heads, mlp_ratio = _SIZE_WORDS[m.group(2)]
    patch, img = int(m.group(4)), int(m.group(6))
    if img % patch:
        return None
    reg = int(m.group(5)) if m.group(5) else 0
    return ViTConfig(
        img_size=img,
        patch_size=patch,
        embed_dim=dim,
        depth=depth,
        num_heads=heads,
        mlp_ratio=mlp_ratio,
        reg_tokens=reg,
        distilled=m.group(3) is not None,
        no_embed_class=reg > 0,
        # deit3 trains with LayerScale (timm init_values=1e-6); the actual
        # gammas come from the checkpoint, this only shapes init_params.
        use_layer_scale=m.group(1) == "deit3",
    )


def get_config(name: str) -> ViTConfig:
    """Resolve a timm model name to a config: registry first, then the
    `{family}_{size}_patch{P}_{res}` grammar (reference run.py:28-29 accepts
    any timm name; this is the equivalent open surface)."""
    if name in VARIANTS:
        return VARIANTS[name]
    parsed = _parse_model_name(name)
    if parsed is not None:
        return parsed
    raise ValueError(
        f"unknown model {name!r}; known: {sorted(VARIANTS)} or any "
        "'{vit|deit|deit3}_{size}_patch{P}[_reg{R}]_{res}' timm name"
    )


def adapt_config_to_params(config: ViTConfig, params: Params) -> ViTConfig:
    """Flip the extended-variant config flags from a loaded parameter tree.

    A timm model *name* does not encode ``qk_norm`` / pooled heads /
    registers (timm sets them per pretrained tag), but a converted
    checkpoint does — by which leaves it carries. The CLIs call this after
    ``load_params`` so ``--model vit_base_patch16_224`` plus (say) an
    MAE-finetuned checkpoint runs with the checkpoint's actual head
    semantics instead of failing shape checks mid-forward.

    State-dict-side twin: :func:`rajni_tpu.params.convert.adapt_config`.
    """
    kw: dict[str, Any] = {}
    if params["blocks"] and "q_norm" in params["blocks"][0]["attn"]:
        kw["qk_norm"] = True
    if "fc_norm" in params and "norm" not in params:
        kw["global_pool"] = "avg"
        kw["use_fc_norm"] = True
    if "dist_token" in params:
        kw["distilled"] = True
    if "reg_token" in params:
        kw["reg_tokens"] = int(params["reg_token"].shape[1])
        kw["no_embed_class"] = True
    cfg = dataclasses.replace(config, **kw) if kw else config
    rows = int(params["pos_embed"].shape[1])
    if not cfg.reg_tokens and rows == cfg.num_patches != cfg.pos_embed_len:
        cfg = dataclasses.replace(cfg, no_embed_class=True)
    return cfg


# --------------------------------------------------------------------------
# Parameter init
# --------------------------------------------------------------------------


def init_params(
    rng: jax.Array, config: ViTConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Initialize a ViT parameter pytree (trunc-normal-ish; inference focus).

    Layout notes:
      * ``patch_embed.kernel`` is ``[P*P*3, C]`` — the conv kernel flattened
        in ``(ph, pw, c)`` order to match :func:`patch_embed`'s extraction;
        the timm converter transposes torch's ``[C, 3, P, P]`` accordingly.
      * ``qkv.kernel`` is ``[C, 3C]`` packed q|k|v (timm order).
      * Linear kernels are ``[in, out]`` (transposed from torch's
        ``[out, in]``).
    """
    C = config.embed_dim
    H = config.mlp_hidden
    P = config.patch_size
    keys = iter(jax.random.split(rng, 6 + 4 * config.depth))

    def dense(key, fan_in, fan_out):
        bound = 1.0 / math.sqrt(fan_in)
        return {
            "kernel": jax.random.uniform(
                key, (fan_in, fan_out), dtype, -bound, bound
            ),
            "bias": jnp.zeros((fan_out,), dtype),
        }

    def norm():
        return {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)}

    params: Params = {
        "patch_embed": dense(next(keys), P * P * config.in_chans, C),
        "cls_token": jnp.zeros((1, 1, C), dtype),
        "pos_embed": (
            jax.random.normal(next(keys), (1, config.pos_embed_len, C), dtype)
            * 0.02
        ),
        "blocks": [],
        "head": dense(next(keys), C, config.num_classes),
    }
    # Pooled-head configs move the final norm after pooling (timm fc_norm;
    # the pre-pool `norm` is Identity there and carries no weights).
    params["fc_norm" if config.fc_norm_resolved else "norm"] = norm()
    if config.distilled:
        params["dist_token"] = jnp.zeros((1, 1, C), dtype)
        params["head_dist"] = dense(next(keys), C, config.num_classes)
    if config.reg_tokens:
        params["reg_token"] = jnp.zeros((1, config.reg_tokens, C), dtype)

    def head_norm():
        D = config.head_dim
        return {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

    for _ in range(config.depth):
        block = {
            "norm1": norm(),
            "attn": {
                "qkv": dense(next(keys), C, 3 * C),
                "proj": dense(next(keys), C, C),
            },
            "norm2": norm(),
            "mlp": {
                "fc1": dense(next(keys), C, H),
                "fc2": dense(next(keys), H, C),
            },
        }
        if config.qk_norm:
            block["attn"]["q_norm"] = head_norm()
            block["attn"]["k_norm"] = head_norm()
        if config.use_layer_scale:
            block["ls1"] = jnp.full((C,), config.layer_scale_init, dtype)
            block["ls2"] = jnp.full((C,), config.layer_scale_init, dtype)
        params["blocks"].append(block)
    return params


# --------------------------------------------------------------------------
# Building blocks (pure functions)
# --------------------------------------------------------------------------


def layer_norm(x: jax.Array, params: Params, eps: float) -> jax.Array:
    """LayerNorm matching torch semantics (biased variance, eps inside sqrt).

    Statistics accumulate in fp32 regardless of activation dtype.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def patch_embed(x: jax.Array, params: Params, config: ViTConfig) -> jax.Array:
    """Non-overlapping P×P patchify + single matmul (reference model.py:34).

    The reference's Conv2d(3, C, P, stride=P) is exactly a blocked reshape +
    one ``[B·N, P·P·3] @ [P·P·3, C]`` matmul — the MXU-friendly form: one
    large dense contraction instead of a convolution XLA must tile itself.

    Args:
      x: ``[B, H, W, 3]`` (NHWC).
    Returns:
      ``[B, N, C]`` patch tokens in row-major (gh, gw) order — matching
      torch's ``flatten(2).transpose(1, 2)`` of the conv output.
    """
    B = x.shape[0]
    P, G = config.patch_size, config.grid_size
    x = x.reshape(B, G, P, G, P, config.in_chans)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, c]
    x = x.reshape(B, config.num_patches, P * P * config.in_chans)
    return x @ params["kernel"] + params["bias"]


def mlp(x: jax.Array, params: Params) -> jax.Array:
    """timm Mlp: Linear → exact (erf) GELU → Linear (dropout inference-inert).

    timm's ``nn.GELU`` default is the exact erf form — ``approximate=False``
    here; JAX's default would be the tanh approximation.
    """
    h = x @ params["fc1"]["kernel"] + params["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["fc2"]["kernel"] + params["fc2"]["bias"]


def _layer_scale(out: jax.Array, block: Params, name: str) -> jax.Array:
    """Apply layer-scale when present (reference model.py:45-48 fallbacks)."""
    if name in block:
        out = out * block[name]
    return out


def drop_path_rates(rate: float, depth: int) -> tuple[float, ...]:
    """timm's stochastic-depth schedule: ``linspace(0, rate, depth)`` —
    the first block is never dropped, the last drops at the full rate
    (timm vision_transformer.py builds ``dpr`` exactly this way;
    ``torch.linspace(0, rate, 1)`` is ``[0.0]``, so a depth-1 model is
    never dropped either)."""
    if depth == 1:
        return (0.0,)
    return tuple(rate * i / (depth - 1) for i in range(depth))


def _stochastic_depth(
    out: jax.Array, key: jax.Array, rate: float
) -> jax.Array:
    """timm ``DropPath``: zero the residual branch per *sample* with
    probability ``rate``, scaling survivors by ``1/keep_prob`` so the
    branch expectation is unchanged (``scale_by_keep=True``, the default).

    Train-time only — callers gate on an RNG key being supplied; the
    inference forward never sees it, so eval numerics are untouched.
    ``rate`` is static (a compile-time constant of the drop-path
    schedule); the mask is a pure function of ``key``, so a resumed run
    replays the identical drop decisions.
    """
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(key, keep_prob, (out.shape[0], 1, 1))
    return out * (mask.astype(out.dtype) / keep_prob)


def _mlp_branch(
    x: jax.Array, block: Params, config: ViTConfig, impl: str,
    act_scales: tuple[float, float] | None = None,
    droppath: tuple[jax.Array, float] | None = None,
) -> jax.Array:
    """``x + ls2 * mlp(norm2(x))`` (reference model.py:59), backend-dispatched.

    Under ``impl="pallas"`` the whole branch runs as one fused kernel
    (:func:`rajni_tpu.kernels.mlp.fused_ln_mlp_residual`) so the ``[B, N, 4C]``
    hidden activation never reaches HBM. ``act_scales`` — the calibrated
    static ``(a_fc1, a_fc2)`` pair — applies to the int8 pallas route only.
    ``droppath`` — a ``(key, rate)`` pair — applies train-time stochastic
    depth to the branch (:func:`_stochastic_depth`); the XLA training path
    is its only producer (the fused kernels are inference-only).
    """
    from ..quant import is_quantized

    quantized = is_quantized(block["mlp"]["fc1"]["kernel"])
    if impl == "pallas":
        if quantized:
            from ..kernels.mlp import fused_ln_mlp_residual_int8

            return fused_ln_mlp_residual_int8(
                x,
                block["norm2"],
                block["mlp"],
                block.get("ls2"),
                config.layer_norm_eps,
                act_scales=act_scales,
            )
        from ..kernels.mlp import fused_ln_mlp_residual

        return fused_ln_mlp_residual(
            x,
            block["norm2"],
            block["mlp"],
            block.get("ls2"),
            config.layer_norm_eps,
        )
    mlp_params = block["mlp"]
    if quantized:
        # lax fallback: dequantize the int8 records (tests/CPU path).
        from ..quant import dequantize_weight

        mlp_params = {
            name: {
                "kernel": dequantize_weight(mlp_params[name]["kernel"], x.dtype),
                "bias": mlp_params[name]["bias"],
            }
            for name in ("fc1", "fc2")
        }
    out = mlp(layer_norm(x, block["norm2"], config.layer_norm_eps), mlp_params)
    out = _layer_scale(out, block, "ls2")
    if droppath is not None:
        out = _stochastic_depth(out, *droppath)
    return x + out


def _dequant_attn(attn_params: Params, dtype) -> Params:
    """Materialize plain kernels from int8 quantization records (the lax
    fallback and the gather kernel's projection consume plain weights)."""
    from ..quant import dequantize_weight, is_quantized

    if not is_quantized(attn_params["qkv"]["kernel"]):
        return attn_params
    out = dict(attn_params)  # keep q_norm/k_norm (never quantized)
    for name in ("qkv", "proj"):
        out[name] = {
            "kernel": dequantize_weight(attn_params[name]["kernel"], dtype),
            "bias": attn_params[name]["bias"],
        }
    return out


def stock_block(
    x: jax.Array, block: Params, config: ViTConfig, impl: str = "xla",
    droppath: tuple[jax.Array, jax.Array, float] | None = None,
) -> jax.Array:
    """Standard timm pre-norm block (the reference's ``blk(x)`` path,
    model.py:61). ``droppath`` — ``(attn_key, mlp_key, rate)`` — applies
    train-time stochastic depth to both residual branches with
    independent per-sample masks (timm instantiates a separate
    ``DropPath`` per branch)."""
    out = attention(
        layer_norm(x, block["norm1"], config.layer_norm_eps),
        _dequant_attn(block["attn"], x.dtype),
        config.num_heads,
        config.attn_scale,
        impl,
        norm_eps=config.layer_norm_eps,
    )
    out = _layer_scale(out, block, "ls1")
    if droppath is not None:
        out = _stochastic_depth(out, droppath[0], droppath[2])
    x = x + out
    return _mlp_branch(
        x, block, config, impl,
        droppath=None if droppath is None else (droppath[1], droppath[2]),
    )


def embed_tokens(
    params: Params, images: jax.Array, config: "ViTConfig"
) -> jax.Array:
    """Patchify + prefix tokens + position embedding: the forward's
    prologue, shared by :func:`vit_forward` and the training kernel path
    (:mod:`rajni_tpu.models.train_path`). Returns ``[B, N, C]`` with the
    prefix (CLS / dist / registers) already concatenated (reference
    model.py:34-37)."""
    B = images.shape[0]
    dtype = params["cls_token"].dtype
    x = patch_embed(images.astype(dtype), params["patch_embed"], config)
    if config.no_embed_class:
        # timm no_embed_class: pos-embed covers patches only, applied
        # BEFORE the prefix concat (DINOv2 / register variants).
        x = x + params["pos_embed"][:, : x.shape[1]]
    prefix = [jnp.broadcast_to(params["cls_token"], (B, 1, config.embed_dim))]
    if config.distilled:
        prefix.append(
            jnp.broadcast_to(params["dist_token"], (B, 1, config.embed_dim))
        )
    if config.reg_tokens:
        prefix.append(
            jnp.broadcast_to(
                params["reg_token"],
                (B, config.reg_tokens, config.embed_dim),
            )
        )
    x = jnp.concatenate(prefix + [x], axis=1)
    if not config.no_embed_class:
        # pos_embed sliced to the live sequence length (reference
        # model.py:37).
        x = x + params["pos_embed"][:, : x.shape[1]]
    return x


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------


# Batch size at which the fused Pallas kernels overtake the XLA path on TPU
# (measured v5e ViT-B/16: batch 1 → XLA 3.1 ms vs Pallas 5.6 ms/forward;
# batch 16 → XLA 10.2 ms vs Pallas 7.5 ms — the per-image kernel grid has no
# parallel work to pipeline at tiny batch).
_PALLAS_MIN_BATCH = 8


def pallas_compilable(config: "ViTConfig") -> bool:
    """Whether Mosaic (the real-TPU kernel lowering) can compile the fused
    kernels for this width. Mosaic requires the feature dim to be a
    multiple of the 128-lane vector width — C=192-class models (vit_tiny)
    fail with "infer-vector-layout: unsupported shape cast" (measured on
    v5e; C=384/768/1024/1280 all compile). Interpret mode (CPU tests,
    virtual meshes) has no such constraint, so off-TPU the tiny-dim test
    configs keep exercising the kernels; on TPU the forward demotes these
    configs to the XLA path (correctness over speed, same rule as the
    VMEM refusals)."""
    from ..kernels.math import use_interpret

    return config.embed_dim % 128 == 0 or use_interpret()


def resolve_impl(impl: str, batch: int) -> str:
    """Resolve ``"auto"`` per (backend, batch) — both static at trace time."""
    if impl != "auto":
        return impl
    if jax.default_backend() == "tpu" and batch >= _PALLAS_MIN_BATCH:
        return "pallas"
    return "xla"


def vit_forward(
    params: Params,
    images: jax.Array,
    config: ViTConfig,
    schedule: Schedule | None = None,
    impl: str = "xla",
    act_scales=None,
    remat: bool = False,
    drop_path: float = 0.0,
    rng: jax.Array | None = None,
    return_dist: bool = False,
    _tap=None,
    _sel_tap=None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Pruned ViT forward: ``[B, H, W, 3] -> [B, num_classes]`` logits
    (a ``(cls_logits, dist_logits)`` pair under ``return_dist=True``).

    ``config``, ``schedule``, ``impl`` (and ``act_scales`` when used) must
    be static when jitted::

        fn = jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))

    ``act_scales`` (:class:`rajni_tpu.quant.ActScales`, with int8-quantized
    params only) switches the int8 pallas kernels and the classifier head
    from dynamic per-row activation quantization to the calibrated static
    scales — the per-row absmax passes disappear from the kernels. Every
    int8 pallas route honors them (whole-block, attention-half, two-kernel
    fallback, standalone MLP, classifier head); only the XLA int8 route
    keeps dynamic quantization, which is always at least as accurate.

    ``impl`` selects the compute backend: ``"xla"`` (lax reference),
    ``"pallas"`` (fused VMEM-resident kernels, :mod:`rajni_tpu.kernels`), or
    ``"auto"`` (Pallas on TPU at batch ≥ 8, XLA otherwise — the measured
    crossover; see :func:`resolve_impl`).

    The per-block token counts are a compile-time constant of
    ``(config, schedule)`` — retrieve them with :func:`model_stats` (the
    reference's ``get_last_stats`` contract, model.py:25-28).

    ``remat`` (static) wraps each transformer block in ``jax.checkpoint``
    on the XLA path: under ``jax.grad`` the backward pass recomputes the
    block's internals from its entry activations instead of keeping every
    intermediate live, cutting peak training memory from O(depth ·
    activations) to O(depth · x + one block's internals) at ~⅓ extra
    forward FLOPs. Inference-only callers should leave it off — without a
    ``grad`` there is nothing to save, and the extra checkpoint regions
    only constrain XLA fusion. Ignored on the Pallas path (kernels define
    no VJP; training routes XLA) and when a ``_tap``/``_sel_tap`` debug
    hook is installed (the hook would observe the recomputation too).

    ``drop_path`` (static) enables train-time stochastic depth: each
    block's two residual branches are zeroed per *sample* with the timm
    ``linspace(0, drop_path, depth)`` per-block rate, survivors scaled by
    ``1/keep_prob`` (:func:`_stochastic_depth`). Requires ``rng`` (the
    per-step key — the train step derives it from ``(seed, step)`` under
    a domain tag, so ``--resume`` replays the identical drop decisions)
    and the XLA path (the fused kernels are inference-only; training
    routes XLA anyway). The inference CLIs never set it, so eval
    numerics are untouched. Capability extension over the inference-only
    reference: the DeiT training recipe its checkpoints come from uses
    stochastic depth (timm vision_transformer.py ``dpr``).

    ``_tap``, when given, is called as ``_tap(block_idx, x)`` with each
    block's output activations — the capture hook behind
    :func:`vit_activations` (attestation/debug; not for jitted hot paths).
    ``_sel_tap(block_idx, keep_idx)`` similarly captures each pruned
    block's selection indices where they exist outside a fused kernel
    (the XLA ops path and the two-kernel pallas fallback) — the hook
    behind :func:`vit_token_trace`.
    """
    schedule = normalize_schedule(schedule, config.depth)
    B = images.shape[0]
    impl = resolve_impl(impl, B)
    if impl == "pallas" and not (
        config.kernel_path_supported and pallas_compilable(config)
    ):
        # The fused kernels hard-code the classic semantics (CLS-only
        # prefix, no qk-norm); extended variants take the XLA ops path —
        # same correctness-over-speed rule as the per-kernel VMEM refusals.
        # pallas_compilable additionally demotes lane-unaligned widths
        # (C % 128 != 0) that Mosaic cannot compile on real TPU.
        impl = "xla"
    remat = remat and _tap is None and _sel_tap is None
    dpr: tuple[float, ...] | None = None
    if drop_path > 0.0:
        if rng is None:
            raise ValueError(
                "drop_path > 0 requires an rng key (train-time only; "
                "pass rng=fold_in(key, step) from the train step)"
            )
        if impl != "xla":
            raise ValueError(
                "drop_path is XLA-path only — the fused kernels are "
                "inference-only (training routes XLA)"
            )
        dpr = drop_path_rates(drop_path, config.depth)
    n_prefix = config.num_prefix_tokens
    x = embed_tokens(params, images, config)

    scores: jax.Array | None = None
    for blk_i, (spec, block) in enumerate(zip(schedule, params["blocks"])):
        dp: tuple[jax.Array, jax.Array, float] | None = None
        if dpr is not None and dpr[blk_i] > 0.0:
            # one fold per block, split into the two branch masks (timm
            # instantiates a separate DropPath per branch)
            k_attn, k_mlp = jax.random.split(
                jax.random.fold_in(rng, blk_i)
            )
            dp = (k_attn, k_mlp, dpr[blk_i])
        if spec is not None:
            n = x.shape[1]
            keep = keep_count(spec.keep_ratio, n, n_prefix)
            # per-block calibrated static scales (a_qkv, a_proj, a_fc1,
            # a_fc2) — each int8 pallas route below that supports them
            # picks its sites from this tuple (act_scales implies
            # quantized params by contract)
            blk_as = (
                None if act_scales is None else act_scales.block(blk_i)
            )
            mlp_as = None if blk_as is None else blk_as[2:4]
            if impl == "pallas":
                # Fully-fused pruned path (kernels/block.py): LN+QKV with
                # in-kernel scoring, sort-free selection, then in-kernel
                # gather+SDPA+proj+compacted-residual. Same semantics as the
                # XLA branch below, no intermediate HBM round trips.
                from ..kernels.block import (
                    _gather_fits_fast,
                    _pruned_block_fits,
                    fused_gather_sdpa_proj_residual,
                    fused_ln_qkv,
                    fused_ln_qkv_int8,
                    fused_pruned_attn_block,
                )
                from ..ops.pruning import select_tokens_dense
                from ..quant import is_quantized

                with_scores = spec.update or scores is None
                quantized = is_quantized(block["attn"]["qkv"]["kernel"])
                if quantized and is_quantized(
                    block["mlp"]["fc1"]["kernel"]
                ):
                    from ..kernels.block import (
                        _full_block_fits_int8,
                        fused_pruned_block_full_int8,
                    )

                    hidden = block["mlp"]["fc1"]["kernel"]["int8"].shape[1]
                    if _full_block_fits_int8(
                        n, keep + 1, config.embed_dim, hidden,
                        jnp.dtype(x.dtype).itemsize,
                    ):
                        # Whole block in one kernel: QKV *and* the [B, K, C]
                        # inter-half activation never reach HBM.
                        x, scores = fused_pruned_block_full_int8(
                            x,
                            block,
                            scores,
                            config.num_heads,
                            keep,
                            config.attn_scale,
                            config.layer_norm_eps,
                            with_scores,
                            act_scales=blk_as,
                        )
                        if _tap is not None:
                            _tap(blk_i, x)
                        continue
                if not quantized and not is_quantized(
                    block["mlp"]["fc1"]["kernel"]
                ):
                    from ..kernels.block import (
                        _bf16_full_plan,
                        fused_pruned_block_full,
                    )

                    hidden = block["mlp"]["fc1"]["kernel"].shape[1]
                    itemsize = jnp.dtype(x.dtype).itemsize
                    # plan != None: whole-block bf16 weights VMEM-resident
                    # (small-model-only — fc streaming was measured a loss,
                    # see the kernel's docstring).
                    if _bf16_full_plan(
                        n, keep + 1, config.embed_dim, hidden, itemsize
                    ):
                        # Whole bf16 block in one kernel (weights fully
                        # VMEM-resident): no [B, K, C] HBM round trip
                        # between the attention and MLP halves.
                        x, scores = fused_pruned_block_full(
                            x,
                            block,
                            scores,
                            config.num_heads,
                            keep,
                            config.attn_scale,
                            config.layer_norm_eps,
                            with_scores,
                        )
                        if _tap is not None:
                            _tap(blk_i, x)
                        continue
                if _pruned_block_fits(
                    n, keep + 1, config.embed_dim,
                    jnp.dtype(x.dtype).itemsize,
                ):
                    # Single mega-kernel: QKV never reaches HBM.
                    if quantized:
                        from ..kernels.block import (
                            fused_pruned_attn_block_int8,
                        )

                        x, scores = fused_pruned_attn_block_int8(
                            x,
                            block["norm1"],
                            block["attn"],
                            block.get("ls1"),
                            scores,
                            config.num_heads,
                            keep,
                            config.attn_scale,
                            config.layer_norm_eps,
                            with_scores,
                            act_scales=(
                                None if blk_as is None else blk_as[:2]
                            ),
                        )
                    else:
                        x, scores = fused_pruned_attn_block(
                            x,
                            block["norm1"],
                            block["attn"],
                            block.get("ls1"),
                            scores,
                            config.num_heads,
                            keep,
                            config.attn_scale,
                            config.layer_norm_eps,
                            with_scores,
                        )
                    x = _mlp_branch(x, block, config, impl, mlp_as)
                    if _tap is not None:
                        _tap(blk_i, x)
                    continue
                # NOTE: kernels/longseq.py holds a token-chunked mega-kernel
                # for N=577 (QKV never reaches HBM) — kept as a tested
                # alternative, NOT routed: measured 1317 vs 1355 img/s
                # against this two-kernel path on ViT-B/384 (the per-image
                # serial scoring/selection phase costs more than the QKV
                # round trip it saves). Dispatch-floor-corrected micro-
                # benchmarks put XLA selection well under 1 ms here, so
                # select_tokens_dense stays the selector (the O(N)-memory
                # select_tokens_radix is a tested alternative for far
                # longer sequences); the residual 384 gap is the one-hot
                # gather matmul cost at K ≈ 0.95·N.
                # The V-column fold (1/a_proj baked into the qkv producer)
                # is only valid when the INT8 gather tail consumes the
                # pre-scaled V — the bf16 fallback tail below never
                # compensates, so decide the tail ONCE up front.
                int8_tail = quantized and _gather_fits_fast(
                    n, keep + 1, config.embed_dim,
                    jnp.dtype(x.dtype).itemsize,
                )
                if quantized:
                    qkv, new_scores = fused_ln_qkv_int8(
                        x,
                        block["norm1"],
                        block["attn"]["qkv"],
                        config.num_heads,
                        config.layer_norm_eps,
                        with_scores,
                        act_scales=(
                            None if (blk_as is None or not int8_tail)
                            else blk_as[:2]
                        ),
                    )
                else:
                    qkv, new_scores = fused_ln_qkv(
                        x,
                        block["norm1"],
                        block["attn"]["qkv"],
                        config.num_heads,
                        config.layer_norm_eps,
                        with_scores,
                    )
                if with_scores:
                    scores = new_scores
                # Selection stays in XLA: the batched rank computation
                # vectorizes across images, which measures faster than the
                # per-image in-kernel variant (kernels.block.
                # fused_ln_qkv_select: 4230 vs 4520 img/s end-to-end).
                keep_idx, sel = select_tokens_dense(scores, keep, x.dtype)
                if _sel_tap is not None:
                    _sel_tap(blk_i, keep_idx)
                scores = jnp.take_along_axis(scores, keep_idx, axis=1)
                if int8_tail:
                    from ..kernels.block import (
                        fused_gather_sdpa_proj_residual_int8,
                    )

                    x = fused_gather_sdpa_proj_residual_int8(
                        qkv,
                        sel,
                        x,
                        block["attn"]["proj"],
                        block.get("ls1"),
                        config.num_heads,
                        config.attn_scale,
                        act_scale=None if blk_as is None else blk_as[1],
                    )
                else:
                    x = fused_gather_sdpa_proj_residual(
                        qkv,
                        sel,
                        x,
                        _dequant_attn(block["attn"], x.dtype)["proj"],
                        block.get("ls1"),
                        config.num_heads,
                        config.attn_scale,
                    )
                x = _mlp_branch(x, block, config, impl, mlp_as)
            else:

                def _xla_pruned_block(x, scores, block=block, spec=spec,
                                      keep=keep, mlp_as=mlp_as, blk_i=blk_i,
                                      dp=dp):
                    x_norm = layer_norm(
                        x, block["norm1"], config.layer_norm_eps
                    )
                    out, keep_idx, scores = pruned_attention(
                        x_norm,
                        _dequant_attn(block["attn"], x.dtype),
                        config.num_heads,
                        config.attn_scale,
                        keep,
                        spec.update,
                        scores,
                        impl,
                        num_prefix=n_prefix,
                        norm_eps=config.layer_norm_eps,
                    )
                    if _sel_tap is not None:
                        _sel_tap(blk_i, keep_idx)
                    # Residual-stream compaction BEFORE the residual add
                    # (reference model.py:55-56).
                    idx = keep_idx[..., None]
                    x = jnp.take_along_axis(x, idx, axis=1)
                    out = _layer_scale(out, block, "ls1")
                    if dp is not None:
                        out = _stochastic_depth(out, dp[0], dp[2])
                    x = x + out
                    return _mlp_branch(
                        x, block, config, impl, mlp_as,
                        droppath=None if dp is None else (dp[1], dp[2]),
                    ), scores

                if remat:
                    _xla_pruned_block = jax.checkpoint(_xla_pruned_block)
                x, scores = _xla_pruned_block(x, scores)
        elif impl == "pallas":
            from ..kernels.block import fused_attn_block, fused_attn_block_int8
            from ..quant import is_quantized

            n = x.shape[1]
            itemsize = jnp.dtype(x.dtype).itemsize
            attn_q = is_quantized(block["attn"]["qkv"]["kernel"])
            mlp_q = is_quantized(block["mlp"]["fc1"]["kernel"])
            if attn_q and mlp_q:
                from ..kernels.block import (
                    _block_full_int8_fits,
                    fused_block_full_int8,
                )

                hidden = block["mlp"]["fc1"]["kernel"]["int8"].shape[1]
                if _block_full_int8_fits(
                    n, config.embed_dim, hidden, itemsize
                ):
                    x = fused_block_full_int8(
                        x, block, config.num_heads, config.attn_scale,
                        config.layer_norm_eps,
                        act_scales=(
                            None if act_scales is None
                            else act_scales.block(blk_i)
                        ),
                    )
                    scores = None  # invalidate (model.py:63)
                    if _tap is not None:
                        _tap(blk_i, x)
                    continue
            elif not attn_q and not mlp_q:
                from ..kernels.block import (
                    _attn_mlp_block_fits,
                    fused_attn_mlp_block,
                )

                hidden = block["mlp"]["fc1"]["kernel"].shape[1]
                # full weight residency only (fc streaming measured a loss)
                if _attn_mlp_block_fits(
                    n, config.embed_dim, hidden, itemsize
                ):
                    x = fused_attn_mlp_block(
                        x, block, config.num_heads, config.attn_scale,
                        config.layer_norm_eps,
                    )
                    scores = None  # invalidate (model.py:63)
                    if _tap is not None:
                        _tap(blk_i, x)
                    continue
            stock_as = (
                None if act_scales is None else act_scales.block(blk_i)
            )
            if attn_q:
                x = fused_attn_block_int8(
                    x,
                    block["norm1"],
                    block["attn"],
                    block.get("ls1"),
                    config.num_heads,
                    config.attn_scale,
                    config.layer_norm_eps,
                    act_scales=(
                        None if stock_as is None else stock_as[:2]
                    ),
                )
            else:
                x = fused_attn_block(
                    x,
                    block["norm1"],
                    block["attn"],
                    block.get("ls1"),
                    config.num_heads,
                    config.attn_scale,
                    config.layer_norm_eps,
                )
            x = _mlp_branch(
                x, block, config, impl,
                None if stock_as is None else stock_as[2:4],
            )
            scores = None  # invalidate (model.py:63)
        else:

            def _xla_stock_block(x, block=block, dp=dp):
                return stock_block(x, block, config, impl, droppath=dp)

            if remat:
                _xla_stock_block = jax.checkpoint(_xla_stock_block)
            x = _xla_stock_block(x)
            scores = None  # invalidate: token layout unchanged (model.py:63)
        if _tap is not None:
            _tap(blk_i, x)

    return classifier_head(
        x, params, config, act_scales, impl, return_dist=return_dist
    )


def classifier_head(
    x: jax.Array,
    params: Params,
    config: ViTConfig,
    act_scales=None,
    impl: str = "xla",
    return_dist: bool = False,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Final norm + pooling + head (reference model.py:65-66 reads CLS
    only; extended pooled-head variants follow timm's ``forward_head``).

    Shared by :func:`vit_forward` and the tensor-parallel composition
    (:func:`rajni_tpu.parallel.mesh.tp_pallas_forward`) so the head
    semantics — CLS-only norm, int8/static-quantize rules, output dtype —
    cannot drift between the two entry points.

    Pooling modes (timm ``global_pool`` × ``use_fc_norm``):
      * ``token`` (classic, the reference's semantics): final ``norm``
        then the CLS row.
      * ``avg`` + ``fc_norm`` (MAE-finetuned style): mean over the
        surviving *patch* tokens (prefix excluded), then ``fc_norm``.
      * ``avg`` without ``fc_norm``: ``norm`` over the full sequence,
        then the patch mean.
    With pruning active, the avg pool runs over the tokens that survived —
    the natural generalization (dropped tokens vanish from the residual
    stream entirely, reference model.py:55-56).

    ``return_dist`` (static) switches the return to the ``(cls_logits,
    dist_logits)`` pair the distillation *training* loss needs (timm's
    DeiT train mode): the CLS head supervises against the labels, the
    dist head against the teacher. For distilled configs these are the
    two heads separately (inference averages them); for plain configs
    both elements alias the single head's logits — the "usual
    distillation" fallback where one head absorbs both terms.
    """
    eps = config.layer_norm_eps
    n_prefix = config.num_prefix_tokens
    if config.distilled:
        # DeiT inference head (timm): mean of the CLS head and the
        # distillation head on their respective (normed) prefix rows.
        y = layer_norm(x[:, 0:2], params["norm"], eps)
        cls_logits = _head_matmul(
            y[:, 0], params["head"], config, act_scales, impl
        )
        # act_scales.head is calibrated on the CLS feature; the dist head
        # always quantizes dynamically (calibration rejects non-classic
        # configs anyway, so act_scales is None here in practice)
        dist_logits = _head_matmul(
            y[:, 1], params["head_dist"], config, None, impl
        )
        if return_dist:
            return cls_logits, dist_logits
        return ((cls_logits + dist_logits) * 0.5).astype(cls_logits.dtype)
    if config.fc_norm_resolved:
        if config.global_pool == "avg":
            pooled = jnp.mean(
                x[:, n_prefix:], axis=1, dtype=jnp.float32
            ).astype(x.dtype)
        else:
            pooled = x[:, 0]
        cls_out = layer_norm(pooled, params["fc_norm"], eps)
    elif config.global_pool == "avg":
        y = layer_norm(x, params["norm"], eps)
        cls_out = jnp.mean(
            y[:, n_prefix:], axis=1, dtype=jnp.float32
        ).astype(x.dtype)
    else:
        # LayerNorm is per-token, so norm(x)[:, 0] ≡ norm(x[:, 0:1])[:, 0] —
        # normalizing just the CLS row skips a full-sequence pass
        # bit-exactly.
        cls_out = layer_norm(x[:, 0:1], params["norm"], eps)[:, 0]
    logits = _head_matmul(cls_out, params["head"], config, act_scales, impl)
    if return_dist:
        return logits, logits
    return logits


def _head_matmul(
    feat: jax.Array,
    head: Params,
    config: ViTConfig,
    act_scales=None,
    impl: str = "xla",
) -> jax.Array:
    """``[B, C] @ head`` with the int8/static-quantize rules of the
    classifier head (shared by the CLS and DeiT distillation heads)."""
    from ..quant import is_quantized

    if is_quantized(head["kernel"]):
        # Int8 classifier head (full-int8 mode): per-row dynamic activation
        # quantization + int8 dot, dequantized by row·column scales — or,
        # with calibrated act_scales, a static-scale quantize (constant
        # multiply, no absmax reduce). Plain XLA — a [B, C] @ [C, classes]
        # matmul needs no Pallas kernel.
        from ..kernels.math import quantize_rows, quantize_static

        cls32 = feat.astype(jnp.float32)
        if act_scales is not None and impl == "pallas":
            # static head only on the kernel route: the documented
            # contract is that impl="xla" + act_scales stays fully
            # dynamic (the conservative attestation baseline)
            a_scale = act_scales.head
            y_q = quantize_static(cls32, 1.0 / a_scale)
        else:
            y_q, a_scale = quantize_rows(cls32)
        acc = jax.lax.dot_general(
            y_q, head["kernel"]["int8"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        logits = acc * a_scale * head["kernel"]["scale"] + head[
            "bias"
        ].astype(jnp.float32)
        return logits.astype(feat.dtype)
    return feat @ head["kernel"] + head["bias"]


def vit_activations(
    params: Params,
    images: jax.Array,
    config: ViTConfig,
    schedule: Schedule | None = None,
    impl: str = "xla",
) -> tuple[list[jax.Array], jax.Array]:
    """Forward returning ``(per_block_outputs, logits)``.

    The attestation capture path (bf16-vs-fp32 drift measurement at real
    model geometry, tests/test_attest.py): each entry is the residual
    stream after block *i*, shape ``[B, N_i, C]`` with ``N_i`` following
    the schedule's token-count trace.
    """
    acts: list[jax.Array] = []
    logits = vit_forward(
        params, images, config, schedule, impl,
        _tap=lambda i, x: acts.append(x),
    )
    return acts, logits


def vit_token_trace(
    params: Params,
    images: jax.Array,
    config: ViTConfig,
    schedule: Schedule | None = None,
) -> tuple[list[jax.Array], jax.Array]:
    """Which ORIGINAL tokens enter each block under ``schedule``.

    Returns ``(masks, logits)``: ``masks`` holds ``depth + 1`` boolean
    arrays of shape ``[B, num_tokens]`` — ``masks[i][b, j]`` is True iff
    original token ``j`` (prefix tokens first, then patches in raster
    order) is still in image ``b``'s residual stream at the ENTRY of block
    ``i``; ``masks[depth]`` is the set surviving the whole stack. Each
    image's ``masks[i].sum()`` equals ``model_stats(...)["token_counts"][i]``
    and the sets shrink monotonically (compaction never resurrects a
    token).

    Runs the XLA ops path eagerly (the fused kernels keep selection
    in-kernel) — this is the debug/visualization surface behind
    ``examples/token_map.py``, not a hot path. The reference exposes only
    the per-block counts (``get_last_stats``, reference model.py:25-28,
    68); the *identity* of the surviving tokens is new introspection
    surface.
    """
    sels: dict[int, jax.Array] = {}
    logits = vit_forward(
        params, images, config, schedule, "xla",
        _sel_tap=lambda i, k: sels.__setitem__(i, k),
    )
    B = images.shape[0]
    N = config.num_tokens
    alive = jnp.broadcast_to(jnp.arange(N), (B, N))
    masks: list[jax.Array] = []
    for i in range(config.depth + 1):
        m = jnp.zeros((B, N), bool)
        m = m.at[jnp.arange(B)[:, None], alive].set(True)
        masks.append(m)
        if i in sels:
            alive = jnp.take_along_axis(alive, sels[i], axis=1)
    return masks, logits


def model_stats(config: ViTConfig, schedule: Schedule | None = None) -> dict:
    """The reference's ``get_last_stats()`` contract (model.py:25-28, 68).

    Token counts are static in this framework, so stats need no forward pass.
    """
    schedule = normalize_schedule(schedule, config.depth)
    return {
        "token_counts": token_count_trace(
            config.num_tokens, schedule, config.num_prefix_tokens
        )
    }
