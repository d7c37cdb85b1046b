"""Fused-kernel TRAINING forward: pallas primal, residual-fed XLA backward.

The inference kernel path (``vit_forward(impl="pallas")``) defines no VJP —
its kernels keep every intermediate in VMEM, so there is nothing for a
backward to read. This module gives the training pillar a kernel path
without writing backward kernels:

  * the **forward** runs the residual-emitting fused kernels of
    :mod:`rajni_tpu.kernels.train` (same math as the inference kernels,
    ~70% MFU, plus HBM writes of the packed ``qkv`` and pre-GELU ``h``);
  * the **backward** is a :func:`jax.custom_vjp` rule built from *segment*
    VJPs of the XLA block math evaluated at the saved boundaries
    ``(x, qkv, x1, h)``. Each segment's unused primal output (the QKV /
    fc1 / fc2 / proj matmuls — the forward's FLOPs) is dead code XLA
    eliminates, so the backward costs only the true backward GEMMs (which
    XLA runs at ~50%+ MFU, they are large-K weight-gradient shapes) plus
    cheap elementwise recompute (two LayerNorms, ``gelu``, the O(N²C)
    SDPA) — **not** a full forward recompute like ``jax.checkpoint``.

Per-block cost vs alternatives (ViT-B/224 per-image estimates):

  ========================  =========  ==========================
  step                      plain XLA  kernel path (this module)
  ========================  =========  ==========================
  forward                   ~39% MFU   ~70% MFU (fused kernels)
  backward                  ~52% MFU   same GEMMs + tiny recompute
  extra fwd recompute       none       none
  ========================  =========  ==========================

Gradient semantics: identical math to ``vit_forward(impl="xla")`` up to
the saved-boundary roundings (qkv, h stored in the activation dtype) and
the kernels' fp32-accumulated matmuls — tolerance-level, pinned by
``tests/test_train_kernels.py``. Importance scores keep the reference's
``no_grad`` contract (`/root/reference/rajni/wrapper/importance.py:4`):
the pruned op's backward returns a zero cotangent for the score thread.

Not supported here (callers fall back to ``impl="xla"``): stochastic
depth (mask application sits inside the fused kernels' residual adds),
quantized params, extended variants (qk-norm / registers / pooled heads),
and schedules whose pruned-gather working set exceeds VMEM
(:func:`train_kernels_supported` reports the reason). Width alone is NOT
a blocker: the MLP half falls back to the same math in XLA when its
weights exceed residency (:func:`_mlp_half`), so ViT-L-class models
kernel-train — compose with ``remat=True`` when their activations
exceed HBM (the checkpoint recompute re-runs the pallas forward).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..kernels.train import (
    _train_attn_fits,
    train_attn_block,
    train_ln_mlp,
    train_mlp_fits,
    train_sdpa_bwd,
    train_sdpa_bwd_fits,
)
from ..ops.attention import _sdpa
from ..ops.pruning import (
    gather_tokens_matmul,
    keep_count,
    onehot_matrix,
    select_tokens_dense,
)
from ..utils.schedule import normalize_schedule
from .vit import (
    ViTConfig,
    classifier_head,
    drop_path_rates,
    embed_tokens,
    layer_norm,
    pallas_compilable,
    stock_block,
)

Params = dict


# --------------------------------------------------------------------------
# XLA backward segments. Each is the exact XLA-path math between two saved
# boundaries; only their *VJPs* ever run (the primal outputs feeding the
# next saved boundary are discarded, and XLA DCEs the forward matmuls).
# --------------------------------------------------------------------------


def _seg_qkv(ln1, qkvp, x, eps):
    a = layer_norm(x, ln1, eps)
    return a @ qkvp["kernel"] + qkvp["bias"]


def _seg_fc1(ln2, fc1, x1, eps):
    b = layer_norm(x1, ln2, eps)
    return b @ fc1["kernel"] + fc1["bias"]


def _seg_fc2(fc2, ls2, x1, h):
    hg = jax.nn.gelu(h, approximate=False)
    out = hg @ fc2["kernel"] + fc2["bias"]
    if ls2 is not None:
        out = out * ls2
    return x1 + out


def _sdpa_hmajor(qkv, num_heads, scale):
    """SDPA with ONE explicit up-front head-major transpose (A/B
    experiment vs :func:`_sdpa`'s in-einsum head indexing — the backward
    of the default form pays ~10-15 ms/step of layout-permute copies
    where its einsums consume the saved qkv). MEASURED A WASH: 992.6 vs
    1000.1 img/s on the ViT-B batch-128 kernel train bench — the explicit
    transpose just moves the same copies. Kept selectable
    (``RAJNI_TRAIN_SDPA=hmajor`` at trace time) so nobody re-litigates
    it blindly; the copies are intrinsic to feeding einsums from a
    custom-call output's fixed layout."""
    B, K = qkv.shape[:2]
    C = qkv.shape[-1] // 3
    D = C // num_heads
    qkv = qkv.reshape(B, K, 3, num_heads, D).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, K, D]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, K, C)


def _seg_attn_tail(proj, ls1, x, qkv, keep_idx, num_heads, scale):
    """SDPA + proj + residual; with ``keep_idx`` the pruned variant
    (gather before SDPA, residual gathered before the add — reference
    model.py:55-56).

    Gathers are expressed as one-hot MXU matmuls (bit-exact,
    :func:`rajni_tpu.ops.pruning.gather_tokens_matmul`) rather than
    ``take_along_axis``: the matmul's transpose is another matmul
    (``selᵀ @ cotangent`` — the exact scatter-add, on the MXU), where the
    take_along_axis transpose lowers to a serial TPU scatter (the same
    per-row-loop pathology as the forward gather, CLAUDE.md landmark)."""
    if keep_idx is not None:
        sel = onehot_matrix(keep_idx, x.shape[1], x.dtype)
        qkv = gather_tokens_matmul(qkv, sel)
        x = gather_tokens_matmul(x, sel)
    if os.environ.get("RAJNI_TRAIN_SDPA") == "hmajor":
        out = _sdpa_hmajor(qkv, num_heads, scale)
    else:
        out = _sdpa(qkv, num_heads, scale)
    out = out @ proj["kernel"] + proj["bias"]
    if ls1 is not None:
        out = out * ls1
    return x + out


def _mlp_bwd(block, x1, h, g_y, eps):
    """Backward through the MLP half from saved ``(x1, h)``. Returns
    ``(d_x1, grads_dict_pieces)``."""
    if "ls2" in block:
        _, vjp4 = jax.vjp(
            lambda fc2, ls2, x1, h: _seg_fc2(fc2, ls2, x1, h),
            block["mlp"]["fc2"], block["ls2"], x1, h,
        )
        d_fc2, d_ls2, d_x1a, d_h = vjp4(g_y)
    else:
        _, vjp4 = jax.vjp(
            lambda fc2, x1, h: _seg_fc2(fc2, None, x1, h),
            block["mlp"]["fc2"], x1, h,
        )
        d_fc2, d_x1a, d_h = vjp4(g_y)
        d_ls2 = None
    _, vjp3 = jax.vjp(
        lambda ln2, fc1, x1: _seg_fc1(ln2, fc1, x1, eps),
        block["norm2"], block["mlp"]["fc1"], x1,
    )
    d_ln2, d_fc1, d_x1b = vjp3(d_h)
    return d_x1a + d_x1b, (d_ln2, d_fc1, d_fc2, d_ls2)


def _attn_bwd_pallas(block, x, qkv, keep_idx, d_x1, num_heads, scale, eps):
    """Attention-half backward with the fused Pallas SDPA-backward kernel.

    Hand-written vjp of :func:`_seg_attn_tail` (same math, term by term):
    the SDPA recompute + its backward run inside
    :func:`rajni_tpu.kernels.train.train_sdpa_bwd` — qkv stays in its
    packed ``[B, K, 3C]`` custom-call layout end to end, so the ~13 ms/step
    of ``[B,K,3,H,D]`` relayout copies the XLA einsum backward pays
    (profile_train.py attribution) never exist. Everything around the
    kernel is the same XLA GEMMs the vjp path runs (proj dgrad/wgrad, the
    one-hot gather transposes, the ln1+qkv segment vjp)."""
    proj = block["attn"]["proj"]
    ls1 = block.get("ls1")
    if keep_idx is not None:
        sel = onehot_matrix(keep_idx, x.shape[1], x.dtype)
        qkv_g = gather_tokens_matmul(qkv, sel)
    else:
        sel = None
        qkv_g = qkv
    # tail: out = x_g + t,  t = ls1 * (ao @ Wp + bp)
    d_t = d_x1 * ls1 if ls1 is not None else d_x1
    d_ao = jnp.einsum("bkc,dc->bkd", d_t, proj["kernel"])
    ao, d_qkv_g = train_sdpa_bwd(qkv_g, d_ao, num_heads, scale)
    d_wp = jnp.einsum("bkd,bkc->dc", ao, d_t)
    d_bp = d_t.astype(jnp.float32).sum((0, 1)).astype(proj["bias"].dtype)
    if ls1 is not None:
        proj_out = ao @ proj["kernel"] + proj["bias"]
        d_ls1 = (
            (proj_out.astype(jnp.float32) * d_x1.astype(jnp.float32))
            .sum((0, 1)).astype(ls1.dtype)
        )
    else:
        d_ls1 = None
    if sel is not None:
        # gather transpose = scatter-add as a matmul (selᵀ @ cotangent)
        d_qkv = jnp.einsum("bkn,bkc->bnc", sel, d_qkv_g)
        d_x_res = jnp.einsum("bkn,bkc->bnc", sel, d_x1)
    else:
        d_qkv = d_qkv_g
        d_x_res = d_x1
    _, vjp1 = jax.vjp(
        lambda ln1, qkvp, x: _seg_qkv(ln1, qkvp, x, eps),
        block["norm1"], block["attn"]["qkv"], x,
    )
    d_ln1, d_qkvp, d_xb = vjp1(d_qkv)
    d_proj = {"kernel": d_wp, "bias": d_bp}
    return d_x_res + d_xb, (d_ln1, d_qkvp, d_proj, d_ls1)


def _attn_bwd(block, x, qkv, keep_idx, d_x1, num_heads, scale, eps):
    """Backward through the attention half from saved ``(x, qkv)``.
    Returns ``(d_x, grads_dict_pieces)``.

    Routes the fused Pallas SDPA backward (:func:`_attn_bwd_pallas`) when
    the per-image working set fits VMEM — the default after measurement;
    ``RAJNI_TRAIN_ATTN_BWD=xla`` (trace-time) forces the XLA einsum vjp
    (also the long-sequence fallback, e.g. N=577)."""
    K = qkv.shape[1] if keep_idx is None else keep_idx.shape[1]
    if (
        os.environ.get("RAJNI_TRAIN_ATTN_BWD", "pallas") == "pallas"
        and train_sdpa_bwd_fits(
            K, x.shape[-1], jnp.dtype(x.dtype).itemsize
        )
    ):
        return _attn_bwd_pallas(
            block, x, qkv, keep_idx, d_x1, num_heads, scale, eps
        )
    if "ls1" in block:
        _, vjp2 = jax.vjp(
            lambda proj, ls1, x, qkv: _seg_attn_tail(
                proj, ls1, x, qkv, keep_idx, num_heads, scale
            ),
            block["attn"]["proj"], block["ls1"], x, qkv,
        )
        d_proj, d_ls1, d_xa, d_qkv = vjp2(d_x1)
    else:
        _, vjp2 = jax.vjp(
            lambda proj, x, qkv: _seg_attn_tail(
                proj, None, x, qkv, keep_idx, num_heads, scale
            ),
            block["attn"]["proj"], x, qkv,
        )
        d_proj, d_xa, d_qkv = vjp2(d_x1)
        d_ls1 = None
    _, vjp1 = jax.vjp(
        lambda ln1, qkvp, x: _seg_qkv(ln1, qkvp, x, eps),
        block["norm1"], block["attn"]["qkv"], x,
    )
    d_ln1, d_qkvp, d_xb = vjp1(d_qkv)
    return d_xa + d_xb, (d_ln1, d_qkvp, d_proj, d_ls1)


def _assemble_block_grads(block, attn_pieces, mlp_pieces):
    """Cotangent tree with exactly the block's structure (classic keys +
    optional layer-scales)."""
    d_ln1, d_qkvp, d_proj, d_ls1 = attn_pieces
    d_ln2, d_fc1, d_fc2, d_ls2 = mlp_pieces
    g = {
        "norm1": d_ln1,
        "attn": {"qkv": d_qkvp, "proj": d_proj},
        "norm2": d_ln2,
        "mlp": {"fc1": d_fc1, "fc2": d_fc2},
    }
    if "ls1" in block:
        g["ls1"] = d_ls1
    if "ls2" in block:
        g["ls2"] = d_ls2
    return g


# --------------------------------------------------------------------------
# Stock block op
# --------------------------------------------------------------------------


def _dp_mask(key, rate: float, batch: int, dtype):
    """Scaled stochastic-depth mask — the same draw as
    :func:`rajni_tpu.models.vit._stochastic_depth` (timm DropPath):
    per-sample Bernoulli(keep), survivors scaled by ``1/keep``. The
    kernel ops apply it OUTSIDE the fused kernel as
    ``x + m·(y − x)`` (the kernels return ``y = x + branch``), which
    equals the XLA path's ``x + branch·m`` up to bf16 rounding of the
    subtraction."""
    keep = 1.0 - rate
    return (
        jax.random.bernoulli(key, keep, (batch, 1, 1)).astype(dtype) / keep
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stock_block_op(static, block, x, dp):
    num_heads, scale, eps = static
    x1, _ = train_attn_block(
        x, block["norm1"], block["attn"], block.get("ls1"),
        num_heads, scale, eps,
    )
    if dp is not None:
        x1 = x + dp[0] * (x1 - x)
    y, _ = _mlp_half(x1, block, eps)
    if dp is not None:
        y = x1 + dp[1] * (y - x1)
    return y


def _stock_block_fwd(static, block, x, dp):
    num_heads, scale, eps = static
    x1, qkv = train_attn_block(
        x, block["norm1"], block["attn"], block.get("ls1"),
        num_heads, scale, eps,
    )
    if dp is not None:
        x1 = x + dp[0] * (x1 - x)
    y, h = _mlp_half(x1, block, eps)
    if dp is not None:
        y = x1 + dp[1] * (y - x1)
    return y, (block, x, qkv, x1, h, dp)


def _stock_block_bwd(static, res, g_y):
    num_heads, scale, eps = static
    block, x, qkv, x1, h, dp = res
    if dp is None:
        d_x1, mlp_pieces = _mlp_bwd(block, x1, h, g_y, eps)
        d_x, attn_pieces = _attn_bwd(
            block, x, qkv, None, d_x1, num_heads, scale, eps
        )
        d_dp = None
    else:
        # y = x1 + m2·branch2(x1): the branch vjp sees m2·g_y, the
        # residual identity sees the full g_y — add the (1−m2) part back.
        m1, m2 = dp
        d_x1, mlp_pieces = _mlp_bwd(block, x1, h, m2 * g_y, eps)
        d_x1 = d_x1 + (1.0 - m2) * g_y
        d_x, attn_pieces = _attn_bwd(
            block, x, qkv, None, m1 * d_x1, num_heads, scale, eps
        )
        d_x = d_x + (1.0 - m1) * d_x1
        d_dp = (jnp.zeros_like(m1), jnp.zeros_like(m2))
    return (
        _assemble_block_grads(block, attn_pieces, mlp_pieces), d_x, d_dp
    )


_stock_block_op.defvjp(_stock_block_fwd, _stock_block_bwd)


# --------------------------------------------------------------------------
# Pruned block op (scores threaded, reference no_grad semantics)
# --------------------------------------------------------------------------


def _mlp_half(x1, block, eps):
    """MLP half returning ``(y, h)``: the residual-emitting kernel when
    the weights fit VMEM residency, the same math in XLA otherwise
    (ViT-L-class widths — the forward loses fusion but the custom VJP and
    its saved-``h`` backward stay identical)."""
    w1 = block["mlp"]["fc1"]["kernel"]
    if train_mlp_fits(w1.shape[0], w1.shape[1],
                      jnp.dtype(x1.dtype).itemsize):
        return train_ln_mlp(x1, block["norm2"], block["mlp"],
                            block.get("ls2"), eps)
    h = _seg_fc1(block["norm2"], block["mlp"]["fc1"], x1, eps)
    y = _seg_fc2(block["mlp"]["fc2"], block.get("ls2"), x1, h)
    return y, h


def _pruned_fwd_common(static, block, x, scores, dp):
    from ..kernels.block import fused_ln_qkv, fused_gather_sdpa_proj_residual

    num_heads, scale, eps, keep, with_scores = static
    qkv, new_scores = fused_ln_qkv(
        x, block["norm1"], block["attn"]["qkv"], num_heads, eps,
        with_scores,
    )
    scores_used = new_scores if with_scores else scores
    keep_idx, sel = select_tokens_dense(scores_used, keep, x.dtype)
    x1 = fused_gather_sdpa_proj_residual(
        qkv, sel, x, block["attn"]["proj"], block.get("ls1"),
        num_heads, scale,
    )
    if dp is not None:
        # drop-path on the branch only: the kernel returned
        # x_g + branch; re-derive the gathered residual to blend
        x_g = gather_tokens_matmul(x, sel)
        x1 = x_g + dp[0] * (x1 - x_g)
    next_scores = jnp.take_along_axis(scores_used, keep_idx, axis=1)
    return qkv, keep_idx, x1, next_scores


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pruned_block_op(static, block, x, scores, dp):
    eps = static[2]
    _, _, x1, next_scores = _pruned_fwd_common(static, block, x, scores, dp)
    y, _ = _mlp_half(x1, block, eps)
    if dp is not None:
        y = x1 + dp[1] * (y - x1)
    return y, next_scores


def _pruned_block_fwd(static, block, x, scores, dp):
    eps = static[2]
    qkv, keep_idx, x1, next_scores = _pruned_fwd_common(
        static, block, x, scores, dp
    )
    y, h = _mlp_half(x1, block, eps)
    if dp is not None:
        y = x1 + dp[1] * (y - x1)
    return (y, next_scores), (block, x, scores, qkv, keep_idx, x1, h, dp)


def _pruned_block_bwd(static, res, cot):
    num_heads, scale, eps, keep, with_scores = static
    block, x, scores, qkv, keep_idx, x1, h, dp = res
    g_y, _g_scores = cot  # scores carry no gradient (reference no_grad)
    if dp is None:
        d_x1, mlp_pieces = _mlp_bwd(block, x1, h, g_y, eps)
        d_x, attn_pieces = _attn_bwd(
            block, x, qkv, keep_idx, d_x1, num_heads, scale, eps
        )
        d_dp = None
    else:
        m1, m2 = dp
        d_x1, mlp_pieces = _mlp_bwd(block, x1, h, m2 * g_y, eps)
        d_x1 = d_x1 + (1.0 - m2) * g_y
        d_x, attn_pieces = _attn_bwd(
            block, x, qkv, keep_idx, m1 * d_x1, num_heads, scale, eps
        )
        # the gathered-residual identity path saw only the m1-scaled
        # cotangent inside _attn_bwd — scatter the (1−m1) part back
        sel = onehot_matrix(keep_idx, x.shape[1], x.dtype)
        d_x = d_x + jnp.einsum(
            "bkn,bkc->bnc", sel, (1.0 - m1) * d_x1
        )
        d_dp = (jnp.zeros_like(m1), jnp.zeros_like(m2))
    d_scores = None if scores is None else jnp.zeros_like(scores)
    return (
        _assemble_block_grads(block, attn_pieces, mlp_pieces),
        d_x,
        d_scores,
        d_dp,
    )


_pruned_block_op.defvjp(_pruned_block_fwd, _pruned_block_bwd)


# --------------------------------------------------------------------------
# Full forward + support gate
# --------------------------------------------------------------------------


def train_kernels_supported(
    config: ViTConfig, schedule, dtype=jnp.bfloat16
) -> tuple[bool, str]:
    """Whether :func:`vit_forward_train` can route this (config, schedule)
    through the fused kernels. Returns ``(ok, reason)`` — the reason names
    the first failing constraint (for CLI diagnostics)."""
    from ..kernels.block import _gather_fits_fast

    if not (config.kernel_path_supported and pallas_compilable(config)):
        return False, "extended variant or lane-unaligned width"
    itemsize = jnp.dtype(dtype).itemsize
    C = config.embed_dim
    # NOTE: the MLP half needs no gate — _mlp_half falls back to the same
    # math in XLA when the weights exceed VMEM residency (ViT-L-class
    # widths), and stock blocks route native XLA anyway (mixed routing).
    schedule = normalize_schedule(schedule, config.depth)
    n = config.num_tokens
    any_pruned = False
    for spec in schedule:
        if spec is None:
            continue
        any_pruned = True
        keep = keep_count(spec.keep_ratio, n, 1)
        if not _gather_fits_fast(n, keep + 1, C, itemsize):
            return False, f"pruned gather at N={n} exceeds the VMEM budget"
        n = keep + 1
    del any_pruned  # all-stock runs route to XLA under mixed policy
    return True, ""


def vit_forward_train(
    params: Params,
    images: jax.Array,
    config: ViTConfig,
    schedule=None,
    return_dist: bool = False,
    stock_impl: str | None = None,
    remat: bool = False,
    drop_path: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Training forward on the fused-kernel path: ``[B,H,W,3] → logits``,
    differentiable via the residual-fed custom VJPs above.

    ``drop_path`` + ``rng`` enable stochastic depth with the SAME key
    schedule as ``vit_forward`` (fold_in per block, split per branch,
    timm linspace rates): the per-branch masks are drawn outside the
    ops and blended around the fused kernels as ``x + m·(y − x)`` —
    the kernels stay mask-free, the custom backwards apply the exact
    chain-rule corrections. A resumed run replays identical drops.

    ``remat`` wraps each block (kernel op or XLA stock block) in
    ``jax.checkpoint``: the backward re-runs the block's FORWARD RULE —
    i.e. the pallas kernels, not an XLA recompute — then the custom
    backward, so memory drops to remat's O(depth · block-inputs) while
    the recompute runs at fused-kernel speed. This is what makes over-HBM
    configs (ViT-L/256 and up) kernel-trainable at all.

    Drop-in for ``vit_forward(..., impl="xla")`` inside
    ``jax.value_and_grad`` — same semantics (scores/selection/compaction
    per reference attention.py:17-60, model.py:55-63), tolerance-level
    numerics. Callers must pre-check :func:`train_kernels_supported`.

    Routing (v5e, batch-128 ViT-B bf16): pruned blocks always take the
    kernel ops — the fused forward replaces the XLA path's serial token
    gathers and the custom VJP's one-hot matmul transpose replaces its
    backward scatters. STOCK blocks route per-block by ``stock_impl``:

      * ``"auto"`` (default): the kernel stock op wherever the forward
        kernel AND the fused SDPA backward (:func:`rajni_tpu.kernels.
        train.train_sdpa_bwd`) both fit VMEM, XLA otherwise. With the
        pallas backward the kernel stock op WINS (912.8 vs 822.2 img/s
        all-stock); with the XLA einsum backward it loses (691 — the
        relayout copies at the custom-call boundary, the r4 measurement
        that set the old XLA-stock default, now routed around).
      * ``"pallas"`` / ``"xla"`` force one route (A/B instrument;
        ``RAJNI_TRAIN_STOCK`` overrides the default at trace time).

    Measured end-to-end (schedule.json): mixed-with-XLA-stock 1000.1
    img/s (r4) → 1082.0 with the pallas backward on pruned blocks only →
    1127.8 all-kernel (this default). Unpruned: 822.2 XLA → 912.8.
    """
    if stock_impl is None:
        stock_impl = os.environ.get("RAJNI_TRAIN_STOCK", "auto")
    dpr = None
    if drop_path > 0.0:
        if rng is None:
            raise ValueError(
                "drop_path > 0 requires an rng key (train-time only; "
                "pass rng=fold_in(key, step) from the train step)"
            )
        dpr = drop_path_rates(drop_path, config.depth)
    schedule = normalize_schedule(schedule, config.depth)
    x = embed_tokens(params, images, config)
    scores = None

    def stock_kernel_ok(n: int) -> bool:
        """Per-block auto routing: the kernel stock op wins ONLY with the
        fused SDPA backward (912.8 vs 822.2 img/s XLA; with the XLA einsum
        backward it LOSES, 691 — the r4 measurement that set the old
        mixed default). Requires both the forward kernel and the
        SDPA-backward working set to fit VMEM at this block's N."""
        if stock_impl != "auto":
            return stock_impl == "pallas"
        itemsize = jnp.dtype(x.dtype).itemsize
        return (
            os.environ.get("RAJNI_TRAIN_ATTN_BWD", "pallas") == "pallas"
            and train_sdpa_bwd_fits(n, config.embed_dim, itemsize)
            and _train_attn_fits(n, config.embed_dim, itemsize)
        )
    for blk_i, (spec, block) in enumerate(zip(schedule, params["blocks"])):
        keys = None
        if dpr is not None and dpr[blk_i] > 0.0:
            # one fold per block, split into the two branch keys — the
            # exact schedule of vit_forward's XLA drop-path (vit.py)
            keys = jax.random.split(jax.random.fold_in(rng, blk_i))
        if spec is not None:
            dp = None
            if keys is not None:
                dp = (
                    _dp_mask(keys[0], dpr[blk_i], x.shape[0], x.dtype),
                    _dp_mask(keys[1], dpr[blk_i], x.shape[0], x.dtype),
                )
            n = x.shape[1]
            keep = keep_count(spec.keep_ratio, n, 1)
            with_scores = spec.update or scores is None
            static = (
                config.num_heads, config.attn_scale,
                config.layer_norm_eps, keep, with_scores,
            )
            op = functools.partial(_pruned_block_op, static)
            if remat:
                op = jax.checkpoint(op)
            x, scores = op(block, x, scores, dp)
        elif stock_kernel_ok(x.shape[1]):
            dp = None
            if keys is not None:
                dp = (
                    _dp_mask(keys[0], dpr[blk_i], x.shape[0], x.dtype),
                    _dp_mask(keys[1], dpr[blk_i], x.shape[0], x.dtype),
                )
            static = (
                config.num_heads, config.attn_scale, config.layer_norm_eps,
            )
            op = functools.partial(_stock_block_op, static)
            if remat:
                op = jax.checkpoint(op)
            x = op(block, x, dp)
            scores = None  # stock block invalidates (model.py:63)
        else:
            droppath = (
                None if keys is None
                else (keys[0], keys[1], dpr[blk_i])
            )

            def op(block, x, droppath=droppath):
                return stock_block(
                    x, block, config, "xla", droppath=droppath
                )

            if remat:
                op = jax.checkpoint(op)
            x = op(block, x)
            scores = None  # stock block invalidates (model.py:63)
    return classifier_head(
        x, params, config, None, "xla", return_dist=return_dist
    )
