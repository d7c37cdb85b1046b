"""Megatron tensor-parallel TRAINING on the fused-kernel path.

The r4 train-kernel path (:mod:`rajni_tpu.models.train_path`) composed
with plain and ``--data_parallel`` runs only — TP kernel training was
rejected because XLA's SPMD partitioner cannot split a pallas custom
call. This module builds it manually with ``shard_map`` over the same
``(data, model)`` mesh as the inference TP path
(:func:`rajni_tpu.parallel.mesh.tp_pallas_forward`), differentiated
per shard:

  * the per-shard pallas segments (LN+QKV on the head-aligned local
    packing, the gather/SDPA/proj partial tail, the partial MLP) get
    ``jax.custom_vjp`` rules built from the r4 machinery — the fused
    SDPA-backward kernel (:func:`rajni_tpu.kernels.train.train_sdpa_bwd`)
    where it fits, XLA segment vjps otherwise;
  * the two Megatron collectives per block ride custom-vjp identities:
    ``_g_psum`` (forward all-reduce, backward identity — the branch
    output reduction) and ``_f_id`` (forward identity, backward
    all-reduce — the branch *input*, so the residual-stream cotangent
    stays replicated across model shards). These are Megatron's f/g
    conjugate pair expressed as JAX custom vjps — required because
    under ``check_vma=False`` shard_map autodiff cannot see replication
    and would otherwise transpose ``psum`` to ``psum`` (a tp× over- or
    under-count);
  * gradients: sharded leaves (qkv/fc1/fc2/proj kernels + their local
    biases) are complete per shard; leaves consumed INSIDE the branch on
    the replicated activations (norm1/norm2) come out as per-shard
    partials and are psum'd over ``model`` at the end
    (:func:`_psum_partial_leaves`); everything else (embeddings, head,
    post-psum biases, layer-scales) receives replicated cotangents and
    needs no reduction. All leaves pmean over ``data``.

Scores keep the reference ``no_grad`` contract
(`/root/reference/rajni/wrapper/importance.py:4`): the psum'd scorer
partials and the selection matrix are stop-graded, so the raw score
psums never see cotangents.

Scope: bf16/fp32 classic configs (the train-kernel gate plus the TP
divisibility rules); the recipe knobs that act outside the forward
(mixing, smoothing, grad-accum/EMA/LLRD/clip wrapping ``tx``) compose,
and so does ``drop_path`` (the residual adds are outer jax math here, so
the masks differentiate without custom corrections);
``remat``/distillation are CLI-rejected for now.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..kernels.train import (
    train_ln_mlp,
    train_mlp_fits,
    train_sdpa_bwd,
    train_sdpa_bwd_fits,
)
from ..models.train_path import _seg_fc1, _seg_qkv
from ..models.vit import ViTConfig, classifier_head, patch_embed
from ..ops.attention import _sdpa
from ..ops.importance import importance_from_partials, importance_partials
from ..ops.pruning import (
    gather_tokens_matmul,
    keep_count,
    select_tokens_dense,
)
from ..utils.schedule import normalize_schedule

_AXIS = "model"


# --------------------------------------------------------------------------
# Megatron f/g as custom vjps (collective-correct under check_vma=False)
# --------------------------------------------------------------------------


@jax.custom_vjp
def _g_psum(x):
    """Branch-output reduction: forward ``psum`` over ``model``, backward
    identity (the cotangent of a replicated value is replicated)."""
    return jax.lax.psum(x, _AXIS)


def _g_psum_fwd(x):
    return jax.lax.psum(x, _AXIS), None


def _g_psum_bwd(_, d):
    return (d,)


_g_psum.defvjp(_g_psum_fwd, _g_psum_bwd)


@jax.custom_vjp
def _f_id(x):
    """Branch-input marker: forward identity, backward ``psum`` over
    ``model`` — each shard's branch contributes only its heads/hidden
    slice to the input cotangent; the sum restores the replicated
    residual-stream gradient."""
    return x


def _f_id_fwd(x):
    return x, None


def _f_id_bwd(_, d):
    return (jax.lax.psum(d, _AXIS),)


_f_id.defvjp(_f_id_fwd, _f_id_bwd)


# --------------------------------------------------------------------------
# Per-shard custom-vjp ops
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tp_qkv_op(static, ln1, qkvp, x):
    from ..kernels.block import fused_ln_qkv

    heads_l, eps = static
    qkv_l, _ = fused_ln_qkv(x, ln1, qkvp, heads_l, eps, False)
    return qkv_l


def _tp_qkv_fwd(static, ln1, qkvp, x):
    return _tp_qkv_op(static, ln1, qkvp, x), (ln1, qkvp, x)


def _tp_qkv_bwd(static, res, d_qkv):
    _, eps = static
    ln1, qkvp, x = res
    _, vjp = jax.vjp(
        lambda ln, w, x: _seg_qkv(ln, w, x, eps), ln1, qkvp, x
    )
    return vjp(d_qkv)


_tp_qkv_op.defvjp(_tp_qkv_fwd, _tp_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tp_attn_tail_op(static, wproj, qkv_l, sel):
    """Per-shard attention tail PARTIAL: gather (when ``sel`` is given) +
    SDPA over the local heads + the row-parallel proj shard
    ``[C_local, C]``. No residual, bias or layer-scale — those apply
    once after the psum."""
    from ..kernels.attention import fused_sdpa
    from ..kernels.block import fused_gather_sdpa_proj_residual

    heads_l, scale = static
    if sel is None:
        attn_l = fused_sdpa(qkv_l, heads_l, scale)
        return jnp.einsum("bnc,cd->bnd", attn_l, wproj)
    B, N, _ = qkv_l.shape
    C = wproj.shape[1]
    zeros_x = jnp.zeros((B, N, C), qkv_l.dtype)
    proj = {"kernel": wproj, "bias": jnp.zeros((C,), wproj.dtype)}
    return fused_gather_sdpa_proj_residual(
        qkv_l, sel, zeros_x, proj, None, heads_l, scale
    )


def _tp_attn_tail_fwd(static, wproj, qkv_l, sel):
    return _tp_attn_tail_op(static, wproj, qkv_l, sel), (wproj, qkv_l, sel)


def _tp_attn_tail_bwd(static, res, d_part):
    heads_l, scale = static
    wproj, qkv_l, sel = res
    qkv_g = qkv_l if sel is None else gather_tokens_matmul(qkv_l, sel)
    d_part = d_part.astype(qkv_l.dtype)
    d_ao = jnp.einsum("bkc,dc->bkd", d_part, wproj)
    K = qkv_g.shape[1]
    c_loc = wproj.shape[0]
    if train_sdpa_bwd_fits(K, c_loc, jnp.dtype(qkv_l.dtype).itemsize):
        ao, d_qkv_g = train_sdpa_bwd(qkv_g, d_ao, heads_l, scale)
    else:  # long-sequence fallback: XLA einsum vjp
        ao, vjp = jax.vjp(lambda q: _sdpa(q, heads_l, scale), qkv_g)
        (d_qkv_g,) = vjp(d_ao)
    d_w = jnp.einsum("bkd,bkc->dc", ao, d_part)
    if sel is None:
        return d_w, d_qkv_g, None
    d_qkv_l = jnp.einsum("bkn,bkc->bnc", sel, d_qkv_g)
    return d_w, d_qkv_l, jnp.zeros_like(sel)


_tp_attn_tail_op.defvjp(_tp_attn_tail_fwd, _tp_attn_tail_bwd)


def _tp_mlp_partial(ln2, mlp, x, eps):
    """XLA form of the per-shard MLP partial (fallback + backward math):
    ``gelu(fc1_l(ln2(x))) @ fc2_l`` — no bias, residual or scale."""
    h = _seg_fc1(ln2, mlp["fc1"], x, eps)
    return jax.nn.gelu(h, approximate=False) @ mlp["fc2"]["kernel"], h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tp_mlp_op(static, ln2, mlp, x):
    (eps,) = static
    w1 = mlp["fc1"]["kernel"]
    if train_mlp_fits(w1.shape[0], w1.shape[1],
                      jnp.dtype(x.dtype).itemsize):
        mlp_zerob = {
            "fc1": mlp["fc1"],
            "fc2": {
                "kernel": mlp["fc2"]["kernel"],
                "bias": jnp.zeros_like(mlp["fc2"]["bias"]),
            },
        }
        part, _ = train_ln_mlp(x, ln2, mlp_zerob, None, eps,
                               add_residual=False)
        return part
    part, _ = _tp_mlp_partial(ln2, mlp, x, eps)
    return part


def _tp_mlp_fwd(static, ln2, mlp, x):
    (eps,) = static
    w1 = mlp["fc1"]["kernel"]
    if train_mlp_fits(w1.shape[0], w1.shape[1],
                      jnp.dtype(x.dtype).itemsize):
        mlp_zerob = {
            "fc1": mlp["fc1"],
            "fc2": {
                "kernel": mlp["fc2"]["kernel"],
                "bias": jnp.zeros_like(mlp["fc2"]["bias"]),
            },
        }
        part, h = train_ln_mlp(x, ln2, mlp_zerob, None, eps,
                               add_residual=False)
    else:
        part, h = _tp_mlp_partial(ln2, mlp, x, eps)
    return part, (ln2, mlp, x, h)


def _tp_mlp_bwd(static, res, d_part):
    (eps,) = static
    ln2, mlp, x, h = res
    d_part = d_part.astype(x.dtype)
    _, vjp2 = jax.vjp(
        lambda w2, h: jax.nn.gelu(h, approximate=False) @ w2,
        mlp["fc2"]["kernel"], h,
    )
    d_w2, d_h = vjp2(d_part)
    _, vjp1 = jax.vjp(
        lambda ln, fc1, x: _seg_fc1(ln, fc1, x, eps),
        ln2, mlp["fc1"], x,
    )
    d_ln2, d_fc1, d_x = vjp1(d_h)
    d_mlp = {
        "fc1": d_fc1,
        "fc2": {"kernel": d_w2, "bias": jnp.zeros_like(mlp["fc2"]["bias"])},
    }
    return d_ln2, d_mlp, d_x


_tp_mlp_op.defvjp(_tp_mlp_fwd, _tp_mlp_bwd)


# --------------------------------------------------------------------------
# Per-shard forward + the train step
# --------------------------------------------------------------------------


def tp_train_forward(p, images, config: ViTConfig, schedule, tp: int,
                     drop_path: float = 0.0, rng=None):
    """Per-shard training forward (runs INSIDE shard_map): mirrors
    :func:`rajni_tpu.parallel.mesh.tp_pallas_forward`'s ``chip`` with the
    residual-emitting train ops above. ``p`` is the head-aligned repacked
    local tree; returns replicated logits.

    ``drop_path`` + ``rng``: stochastic depth with the standard key
    schedule (fold_in per block, split per branch). Unlike the
    single-device kernel ops, the residual adds here live in OUTER jax
    math (after the psum), so the per-branch masks compose through plain
    autodiff — no custom backward corrections. ``rng`` must already be
    data-shard-decorrelated (the step folds ``axis_index("data")``;
    model peers within a data shard share it, keeping the replicated
    program identical across the model axis)."""
    from ..models.train_path import _dp_mask
    from ..models.vit import drop_path_rates

    heads_l = config.num_heads // tp
    eps = config.layer_norm_eps
    C = config.embed_dim
    dtype = p["cls_token"].dtype
    B = images.shape[0]
    x = patch_embed(images.astype(dtype), p["patch_embed"], config)
    cls = jnp.broadcast_to(p["cls_token"], (B, 1, C))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"][:, : x.shape[1]]

    dpr = None
    if drop_path > 0.0:
        if rng is None:
            raise ValueError("drop_path > 0 requires an rng key")
        dpr = drop_path_rates(drop_path, config.depth)
    scores = None
    for blk_i, (spec, block) in enumerate(zip(schedule, p["blocks"])):
        m1 = m2 = None
        if dpr is not None and dpr[blk_i] > 0.0:
            keys = jax.random.split(jax.random.fold_in(rng, blk_i))
            m1 = _dp_mask(keys[0], dpr[blk_i], B, jnp.float32)
            m2 = _dp_mask(keys[1], dpr[blk_i], B, jnp.float32)
        qkv_loc = block["attn"]["qkv"]
        qkv_flat = {
            "kernel": qkv_loc["kernel"].reshape(C, -1),
            "bias": qkv_loc["bias"].reshape(-1),
        }
        wproj = block["attn"]["proj"]["kernel"]
        bproj = block["attn"]["proj"]["bias"]
        ls1 = block.get("ls1")
        ls2 = block.get("ls2")

        x_b = _f_id(x)
        qkv_l = _tp_qkv_op((heads_l, eps), block["norm1"], qkv_flat, x_b)
        b1term = bproj if ls1 is None else bproj * ls1
        if spec is None:
            part = _tp_attn_tail_op(
                (heads_l, config.attn_scale), wproj, qkv_l, None
            )
            out = _g_psum(part.astype(jnp.float32))
            if ls1 is not None:
                out = out * ls1
            branch = out + b1term
            if m1 is not None:
                branch = m1 * branch
            x = (x.astype(jnp.float32) + branch).astype(dtype)
            scores = None  # stock block invalidates (model.py:63)
        else:
            n = x.shape[1]
            keep = keep_count(spec.keep_ratio, n)
            if spec.update or scores is None:
                # scorer: psum'd cross-head partials, no_grad (the raw
                # psums never see cotangents — everything downstream of
                # the scores is stop-graded)
                a_s, v_s = importance_partials(qkv_l, heads_l)
                a_s = jax.lax.psum(a_s, _AXIS)
                v_s = jax.lax.psum(v_s, _AXIS)
                scores = importance_from_partials(
                    a_s, v_s, config.num_heads
                )
            scores = jax.lax.stop_gradient(scores)
            idx, sel = select_tokens_dense(scores, keep, x.dtype)
            sel = jax.lax.stop_gradient(sel)
            x_g = gather_tokens_matmul(x, sel)
            part = _tp_attn_tail_op(
                (heads_l, config.attn_scale), wproj, qkv_l, sel
            )
            out = _g_psum(part.astype(jnp.float32))
            if ls1 is not None:
                out = out * ls1
            branch = out + b1term
            if m1 is not None:
                branch = m1 * branch
            x = (x_g.astype(jnp.float32) + branch).astype(dtype)
            scores = jnp.take_along_axis(scores, idx, axis=1)

        b2 = block["mlp"]["fc2"]["bias"]
        b2term = b2 if ls2 is None else b2 * ls2
        x1_b = _f_id(x)
        part = _tp_mlp_op((eps,), block["norm2"], block["mlp"], x1_b)
        out = _g_psum(part.astype(jnp.float32))
        if ls2 is not None:
            out = out * ls2
        branch = out + b2term
        if m2 is not None:
            branch = m2 * branch
        x = (x.astype(jnp.float32) + branch).astype(dtype)

    return classifier_head(x, p, config, None, "xla")


def _psum_partial_leaves(grads):
    """Complete the per-shard partial gradients: the block LayerNorms are
    consumed inside the per-shard branch on replicated activations, so
    each shard holds only its slice of their gradient — sum over
    ``model``. Every other leaf is either shard-local (the Megatron
    kernels/biases) or computed from replicated cotangents."""
    psum = functools.partial(jax.lax.psum, axis_name=_AXIS)
    out = dict(grads)
    out["blocks"] = [
        {**blk,
         "norm1": jax.tree_util.tree_map(psum, blk["norm1"]),
         "norm2": jax.tree_util.tree_map(psum, blk["norm2"])}
        for blk in grads["blocks"]
    ]
    return out


def tp_kernels_train_supported(config: ViTConfig, schedule, tp: int,
                               dtype=jnp.bfloat16) -> tuple[bool, str]:
    """Gate for the TP kernel train step: the single-chip train-kernel
    gate plus the Megatron divisibility rules."""
    from ..models.train_path import train_kernels_supported

    ok, why = train_kernels_supported(config, schedule, dtype)
    if not ok:
        return ok, why
    if config.num_heads % tp:
        return False, f"model axis {tp} must divide num_heads"
    if config.mlp_hidden % tp:
        return False, f"model axis {tp} must divide mlp_hidden"
    return True, ""


def make_tp_train_step(
    config: ViTConfig,
    schedule,
    tx: optax.GradientTransformation,
    mesh,
    pspecs,
    label_smoothing: float = 0.0,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    switch_prob: float = 0.5,
    seed: int = 0,
    drop_path: float = 0.0,
):
    """Full TP-kernel train step: shard_mapped per-shard grads over the
    ``(data, model)`` mesh, optimizer applied outside on the sharded
    state (it inherits the param shardings, exactly like the XLA TP
    path). ``pspecs`` is ``param_pspecs`` of the repacked tree the state
    was built from. Batch mixing happens on the global batch before the
    shard split (the mixup pairing reverses the whole batch).
    ``drop_path`` draws per-sample masks from the same
    ``(seed, _DROPPATH_TAG, step)`` stream as every other train step
    (resume-exact), decorrelated per data shard."""
    from ..train import (
        _DROPPATH_TAG,
        TrainState,
        apply_batch_mix,
        cross_entropy,
        mixed_cross_entropy,
    )

    schedule = normalize_schedule(schedule, config.depth)
    tp = mesh.shape["model"]
    mixing = mixup_alpha > 0.0 or cutmix_alpha > 0.0

    def loss_fn(params, images, labels, lam, dp_rng):
        logits = tp_train_forward(params, images, config, schedule, tp,
                                  drop_path=drop_path, rng=dp_rng)
        if mixing:
            loss = mixed_cross_entropy(logits, labels, lam,
                                       label_smoothing)
        else:
            loss = cross_entropy(logits, labels, label_smoothing)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    def shard_grads(params, images, labels, lam, dp_rng):
        if dp_rng is not None:
            # independent per-data-shard mask draws; model peers within a
            # data shard share the key (replicated program invariant)
            dp_rng = jax.random.fold_in(
                dp_rng, jax.lax.axis_index("data")
            )
        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, lam, dp_rng
        )
        pmean = functools.partial(jax.lax.pmean, axis_name="data")
        g = _psum_partial_leaves(jax.tree_util.tree_map(pmean, g))
        return pmean(loss), pmean(acc), g

    def train_step(state: TrainState, images, labels):
        if mixing:
            images, lam = apply_batch_mix(
                images, seed, state.step, mixup_alpha, cutmix_alpha,
                switch_prob,
            )
        else:
            lam = jnp.float32(1.0)
        dp_rng = None
        if drop_path > 0.0:
            dp_rng = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.key(seed), _DROPPATH_TAG
                ),
                state.step,
            )
        loss, acc, grads = jax.shard_map(
            shard_grads,
            mesh=mesh,
            in_specs=(pspecs, P("data"), P("data"), P(), P()),
            out_specs=(P(), P(), pspecs),
            # pallas_call out_shapes carry no varying-mesh-axes metadata
            # (same rule as every pallas shard_map in parallel.mesh)
            check_vma=False,
        )(state.params, images, labels, lam, dp_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return train_step
