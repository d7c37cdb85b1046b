"""Pipeline parallelism (GPipe) over a ``pipe`` mesh axis.

The reference has no distributed code at all (SURVEY.md §2 "Parallelism");
:mod:`rajni_tpu.parallel.mesh` supplies the faithful capability match (DP)
plus Megatron TP. This module adds the third classic axis — **pipeline
parallelism** — for ViTs whose weights exceed one chip's HBM (ViT-22B-class:
48 blocks × C=6144 ≈ 44 GB bf16 vs 16 GB on v5e). It is TPU-native
throughout: a ``(data, pipe)`` :class:`jax.sharding.Mesh`, per-stage block
weights sharded over ``pipe`` (each chip *holds only its stage*),
``lax.ppermute`` ring shifts on ICI, and one ``lax.scan`` over pipeline
ticks so the whole schedule is a single compiled XLA program that
differentiates (GPipe backward falls out of the scan/ppermute transpose —
no hand-written backward schedule).

Design notes
------------
* **Stage programs under SPMD.** Every device runs the same traced function,
  so per-stage computation (different blocks, different token counts under a
  pruning schedule) dispatches through ``lax.switch`` on
  ``lax.axis_index("pipe")``. XLA lowers that to a conditional — each chip
  executes only its own stage's blocks at runtime; the other branches cost
  compile time only.
* **Static shapes across stage boundaries.** RAJNI pruning shrinks the token
  axis mid-network, but the per-block counts are compile-time constants of
  the schedule (SURVEY.md §2 "critical insight"). The inter-stage payload is
  therefore padded to the entry count ``N0`` and each stage *statically*
  slices back to its true entry count from
  :func:`rajni_tpu.utils.schedule.token_count_trace` — no dynamic shapes, no
  masking arithmetic in the hot path.
* **Score threading across stages.** ``update=false`` blocks reuse scores
  from the previous pruned block (reference attention.py:25-28,
  model.py:61-63). Whether scores are *valid* entering a stage is itself
  static — valid iff the previous stage's last block was pruned — so the
  carried score buffer is consumed only where the reference would.
* **Bubble accounting.** GPipe utilization is ``M / (M + S - 1)`` for ``M``
  microbatches over ``S`` stages; :func:`pipeline_forward` defaults to
  ``M = 2·S`` and callers raise ``microbatch`` to amortize further. The
  per-tick payload over ICI is one ``[B_micro, N0, C]`` activation — at
  ViT-22B scale ~1.5 MB per microbatch row, far under ICI bandwidth per
  tick of block compute.

Composition: the ``data`` axis DPs whole pipelines (pure batch sharding, no
extra collectives), and a third ``model`` axis runs **Megatron tensor
parallelism inside every stage** (``make_pipe_mesh(..., model=tp)``): each
chip holds only its stage's blocks *and* only its head/hidden shard of
them, stage programs run on local heads with the Megatron-minimum psums
(attention proj, fc2, plus the scorer's two cross-head partial sums on
rescoring blocks — the same decomposition as
:func:`rajni_tpu.parallel.mesh.tp_pallas_forward`), and the ``pipe``
ppermute shifts the (replicated-over-``model``) activations between
stages. Int8 params are rejected for now — PP exists for models too big
for a chip, where bf16 weights are the first-order concern.

No reference counterpart exists; cited behavior being preserved is the
pruned forward itself (reference model.py:30-69) — the pipelined program
must produce the single-device logits exactly, which
``tests/test_pipeline.py`` pins on the 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import (
    ViTConfig,
    _layer_scale,
    _mlp_branch,
    attention,
    classifier_head,
    drop_path_rates,
    layer_norm,
    mlp,
    patch_embed,
    stock_block,
)
from ..ops.attention import _qkv_projection, _sdpa, pruned_attention
from ..ops.importance import importance_from_partials, importance_partials
from ..ops.pruning import gather_tokens, keep_count, select_tokens
from ..utils.schedule import Schedule, normalize_schedule, token_count_trace


def make_pipe_mesh(
    devices=None, pipe: int = 1, data: int | None = None, model: int = 1
) -> Mesh:
    """Build a ``(data, pipe)`` mesh — or ``(data, pipe, model)`` when
    ``model > 1`` for Megatron TP inside each pipeline stage — over the
    given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % (pipe * model):
            raise ValueError(
                f"{n} devices not divisible by pipe={pipe} * model={model}"
            )
        data = n // (pipe * model)
    if data * pipe * model != n:
        raise ValueError(f"mesh {data}x{pipe}x{model} != {n} devices")
    if model == 1:
        dev_array = np.asarray(devices).reshape(data, pipe)
        return Mesh(dev_array, axis_names=("data", "pipe"))
    dev_array = np.asarray(devices).reshape(data, pipe, model)
    return Mesh(dev_array, axis_names=("data", "pipe", "model"))


def _mesh_tp(mesh: Mesh) -> int:
    return mesh.shape["model"] if "model" in mesh.axis_names else 1


def _check_plain(params: Any) -> None:
    from ..quant import is_quantized

    leaves = [params["blocks"][0]["attn"]["qkv"]["kernel"],
              params["head"]["kernel"]]
    if any(is_quantized(k) for k in leaves):
        raise NotImplementedError(
            "pipeline parallelism supports plain (bf16/f32) params; "
            "int8 records are not wired — PP targets models whose bf16 "
            "weights exceed a chip, use quantization to *avoid* PP instead"
        )


def stack_params(params: Any, n_stages: int, tp: int = 1) -> Any:
    """Re-tree a ViT param pytree for the pipeline: blocks stacked on a
    leading ``depth`` axis (shardable over ``pipe``), embed/head separate.

    Returns ``{"embed": {...}, "blocks": stacked, "head": {...}}`` where
    every ``blocks`` leaf is ``[depth, ...]``. Requires ``depth % n_stages
    == 0`` so the contiguous shard of the leading axis *is* the stage.

    With ``tp > 1`` the packed QKV weights are first re-packed head-aligned
    (``[C, 3, C]`` kernel / ``[3, C]`` bias,
    :func:`rajni_tpu.parallel.mesh.repack_qkv_heads`) so the stacked leaf's
    last axis shards over ``model`` on whole-head boundaries.
    """
    _check_plain(params)
    if tp > 1:
        from .mesh import repack_qkv_heads

        params = repack_qkv_heads(params)
    depth = len(params["blocks"])
    if depth % n_stages:
        raise ValueError(
            f"depth={depth} must be divisible by pipe={n_stages} stages"
        )

    # Host-side stacking when the leaves live on host: a checkpoint for an
    # over-HBM model must never materialize the full [depth, ...] stack on
    # one device — np.stack keeps it in host RAM so place_pipeline_params'
    # device_put ships each chip only its stage's slice.
    def _stack(*xs):
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.stack(xs)
        return jnp.stack(xs)

    blocks = jax.tree_util.tree_map(_stack, *params["blocks"])
    return {
        "embed": {
            "patch_embed": params["patch_embed"],
            "cls_token": params["cls_token"],
            "pos_embed": params["pos_embed"],
        },
        "blocks": blocks,
        "head": {"norm": params["norm"], "head": params["head"]},
    }


def unstack_params(ptree: Any) -> Any:
    """Inverse of :func:`stack_params` (checkpoint interchange)."""
    depth = jax.tree_util.tree_leaves(ptree["blocks"])[0].shape[0]
    blocks = [
        jax.tree_util.tree_map(lambda a, i=i: a[i], ptree["blocks"])
        for i in range(depth)
    ]
    return {
        "patch_embed": ptree["embed"]["patch_embed"],
        "cls_token": ptree["embed"]["cls_token"],
        "pos_embed": ptree["embed"]["pos_embed"],
        "blocks": blocks,
        "norm": ptree["head"]["norm"],
        "head": ptree["head"]["head"],
    }


def _stacked_block_pspecs(blocks: Any, tp: int) -> Any:
    """Specs for the stacked ``blocks`` subtree: every leaf shards its
    leading ``depth`` axis over ``pipe``; with ``tp > 1`` the Megatron
    column/row dimensions additionally shard over ``model`` (mirroring
    :func:`rajni_tpu.parallel.mesh.param_pspecs` one stacking axis up)."""
    if tp == 1:
        return jax.tree_util.tree_map(lambda _: P("pipe"), blocks)
    spec = {
        "norm1": {"scale": P("pipe"), "bias": P("pipe")},
        "norm2": {"scale": P("pipe"), "bias": P("pipe")},
        "attn": {
            # head-aligned [depth, C, 3, C]: column-parallel on heads
            "qkv": {
                "kernel": P("pipe", None, None, "model"),
                "bias": P("pipe", None, "model"),
            },
            # row-parallel: input dim sharded, bias replicated per stage
            "proj": {"kernel": P("pipe", "model", None), "bias": P("pipe")},
        },
        "mlp": {
            "fc1": {
                "kernel": P("pipe", None, "model"),
                "bias": P("pipe", "model"),
            },
            "fc2": {"kernel": P("pipe", "model", None), "bias": P("pipe")},
        },
    }
    if "ls1" in blocks:
        spec["ls1"] = P("pipe")
        spec["ls2"] = P("pipe")
    return spec


def pipeline_pspecs(ptree: Any, tp: int = 1) -> Any:
    """PartitionSpecs for a stacked tree: blocks over ``pipe`` (and, with
    ``tp > 1``, Megatron dims over ``model``), embed/head replicated."""
    return {
        "embed": jax.tree_util.tree_map(lambda _: P(), ptree["embed"]),
        "blocks": _stacked_block_pspecs(ptree["blocks"], tp),
        "head": jax.tree_util.tree_map(lambda _: P(), ptree["head"]),
    }


def place_pipeline_params(ptree: Any, mesh: Mesh) -> Any:
    """Device-put a stacked tree: each chip holds ONLY its stage's blocks
    (and, on a 3-D mesh, only its head/hidden shard of them)."""
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        ptree,
        pipeline_pspecs(ptree, _mesh_tp(mesh)),
    )


def _entry_counts(config: ViTConfig, schedule) -> list[int]:
    """Token count entering each block (only stage-start entries are ever
    indexed — the padded inter-stage payload is sliced back to the true
    count at each stage's first block)."""
    return token_count_trace(config.num_tokens, schedule)


def _tp_block(x, scores, block, spec, config: ViTConfig, tp: int,
              dpm=None):
    """One ViT block with Megatron TP over the ``model`` axis — manual
    XLA-ops collectives, running inside the pipeline's ``shard_map``.

    Same decomposition as :func:`rajni_tpu.parallel.mesh.tp_pallas_forward`
    (head-aligned column-parallel QKV → zero-collective local-head SDPA →
    row-parallel proj psum; column/row-parallel MLP psum; the scorer
    completed from psum'd local-head partial sums), expressed with the
    plain lax ops of :mod:`rajni_tpu.ops`. Reference semantics per block:
    model.py:51-59 (pruned) / model.py:61-63 (stock).
    """
    H_l = config.num_heads // tp
    eps = config.layer_norm_eps
    dtype = x.dtype
    x_norm = layer_norm(x, block["norm1"], eps)
    qkv_l = _qkv_projection(x_norm, block["attn"])  # [B, N, 3, C/tp]
    if spec is not None:
        if spec.update or scores is None:
            a_s, v_s = importance_partials(qkv_l, H_l)
            a_s = jax.lax.psum(a_s, "model")
            v_s = jax.lax.psum(v_s, "model")
            scores = importance_from_partials(a_s, v_s, config.num_heads)
        keep = keep_count(spec.keep_ratio, x.shape[1])
        # scores are psum-completed → identical on every shard, so the
        # replicated selection picks identical indices (no collective)
        keep_idx = select_tokens(scores, keep)
        qkv_l = gather_tokens(qkv_l, keep_idx)
        # residual-stream compaction BEFORE the residual add
        # (reference model.py:55-56)
        x = gather_tokens(x, keep_idx)
        scores = jnp.take_along_axis(scores, keep_idx, axis=1)
    else:
        scores = None  # stock block invalidates (reference model.py:63)
    out_l = _sdpa(qkv_l, H_l, config.attn_scale)  # [B, K, C/tp]
    part = jnp.einsum(
        "bnc,cd->bnd", out_l, block["attn"]["proj"]["kernel"],
        preferred_element_type=jnp.float32,
    )
    out = jax.lax.psum(part, "model") + block["attn"]["proj"]["bias"]
    out = _layer_scale(out, block, "ls1")
    if dpm is not None:
        # scaled stochastic-depth mask (replicated over ``model`` — every
        # shard draws from the same key, so the psum'd branch drops
        # coherently)
        out = out * dpm[0]
    x = (x.astype(jnp.float32) + out).astype(dtype)

    m = block["mlp"]
    h = layer_norm(x, block["norm2"], eps)
    h = h @ m["fc1"]["kernel"] + m["fc1"]["bias"]  # [B, K, hidden/tp]
    h = jax.nn.gelu(h, approximate=False)
    part = jnp.einsum(
        "bnh,hc->bnc", h, m["fc2"]["kernel"],
        preferred_element_type=jnp.float32,
    )
    out = jax.lax.psum(part, "model") + m["fc2"]["bias"]
    out = _layer_scale(out, block, "ls2")
    if dpm is not None:
        out = out * dpm[1]
    x = (x.astype(jnp.float32) + out).astype(dtype)
    return x, scores


def _stage_branch(
    stage: int,
    n_local: int,
    config: ViTConfig,
    schedule,
    entry: list[int],
    scores_valid_in: bool,
    impl: str,
    tp: int = 1,
    dpr: tuple | None = None,
    n_micro: int = 0,
    n_data: int = 1,
):
    """Build stage ``stage``'s program: slice the padded carry to the true
    entry count, run its blocks (exact reference semantics — the same ops
    as ``vit_forward``'s XLA branch), pad back to ``N0``.

    With ``dpr`` (the timm per-block stochastic-depth rates — training
    only) the branch takes two extra operands ``(kd, mb)``: the per-step
    drop-path key (as raw key data, shared across stages) and this tick's
    microbatch index. Masks are drawn for the FULL global batch from
    ``fold_in(key, global_block_index)`` — exactly the single-device
    stream (models/vit.py ``vit_forward``) — then row-sliced to the
    microbatch, so a PP run drops the *same samples at the same blocks*
    as the equivalent single-device run (per-block rates are static per
    branch; VERDICT r3 #5)."""
    n0 = config.num_tokens
    g0 = stage * n_local
    eps = config.layer_norm_eps

    def branch(local_blocks, x_pad, scores_pad, *dp):
        x = x_pad[:, : entry[g0]]
        scores = scores_pad[:, : entry[g0]] if scores_valid_in else None
        b_micro = x_pad.shape[0]
        for j in range(n_local):
            g = g0 + j
            block = jax.tree_util.tree_map(lambda a, j=j: a[j], local_blocks)
            spec = schedule[g]
            dpm = None
            if dpr is not None and dpr[g] > 0.0:
                kd, mb = dp
                keep_p = 1.0 - dpr[g]
                k_attn, k_mlp = jax.random.split(
                    jax.random.fold_in(jax.random.wrap_key_data(kd), g)
                )

                def _mask(k):
                    # full GLOBAL-batch draw, sliced to this device's rows
                    # of this microbatch: the train step's reshape is
                    # microbatch-major and the data axis shards each
                    # microbatch contiguously, so local row i of microbatch
                    # mb on data-shard d is global row mb·Bmg + d·Bloc + i
                    # — the same bernoulli row the single-device step draws
                    full = jax.random.bernoulli(
                        k, keep_p, (n_micro * b_micro * n_data, 1, 1)
                    )
                    start = (
                        mb * (b_micro * n_data)
                        + jax.lax.axis_index("data") * b_micro
                    )
                    rows = jax.lax.dynamic_slice_in_dim(
                        full, start, b_micro, 0
                    )
                    return rows.astype(jnp.float32) / keep_p

                dpm = (_mask(k_attn), _mask(k_mlp))
            if tp > 1:
                x, scores = _tp_block(
                    x, scores, block, spec, config, tp, dpm
                )
            elif spec is not None:
                keep = keep_count(spec.keep_ratio, x.shape[1])
                x_norm = layer_norm(x, block["norm1"], config.layer_norm_eps)
                out, keep_idx, scores = pruned_attention(
                    x_norm,
                    block["attn"],
                    config.num_heads,
                    config.attn_scale,
                    keep,
                    spec.update,
                    scores,
                    impl,
                )
                # residual-stream compaction BEFORE the residual add
                # (reference model.py:55-56)
                x = jnp.take_along_axis(x, keep_idx[..., None], axis=1)
                out = _layer_scale(out, block, "ls1")
                if dpm is not None:
                    out = out * dpm[0].astype(out.dtype)
                x = x + out
                if dpm is None:
                    x = _mlp_branch(x, block, config, impl)
                else:
                    out = _layer_scale(
                        mlp(layer_norm(x, block["norm2"], eps),
                            block["mlp"]),
                        block, "ls2",
                    )
                    x = x + out * dpm[1].astype(out.dtype)
            elif dpm is not None:
                out = _layer_scale(
                    attention(
                        layer_norm(x, block["norm1"], eps), block["attn"],
                        config.num_heads, config.attn_scale, impl,
                        norm_eps=eps,
                    ),
                    block, "ls1",
                )
                x = x + out * dpm[0].astype(out.dtype)
                out = _layer_scale(
                    mlp(layer_norm(x, block["norm2"], eps), block["mlp"]),
                    block, "ls2",
                )
                x = x + out * dpm[1].astype(out.dtype)
                scores = None  # invalidate (reference model.py:63)
            else:
                x = stock_block(x, block, config, impl)
                scores = None  # invalidate (reference model.py:63)
        pad = n0 - x.shape[1]
        x_out = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        if scores is None:
            # zero-of-the-input keeps the varying-manual-axes type equal
            # across switch branches (a fresh constant would be invariant)
            scores_out = scores_pad * 0
        else:
            scores_out = jnp.pad(
                scores.astype(scores_pad.dtype),
                ((0, 0), (0, n0 - scores.shape[1])),
            )
            if tp > 1:
                # psum-completed scores are typed invariant over ``model``;
                # adding a zero of the carry re-varies them so every switch
                # branch returns the same manual-axes type
                scores_out = scores_out + scores_pad * 0
        return x_out, scores_out

    return branch


def _pipeline_logits_fn(
    config: ViTConfig,
    schedule,
    mesh: Mesh,
    n_micro: int,
    impl: str,
    remat: bool,
    stage=None,
    drop_path: float = 0.0,
):
    """The shard_map'd pipeline: ``(stacked_tree, images[M, Bmg, H, W, 3])
    -> logits[M, Bmg, classes]`` (f32, pipe-invariant, data-sharded).

    With ``drop_path > 0`` (training only) the returned function takes a
    third argument — the per-step drop-path key as raw key data — and the
    stage programs apply timm stochastic depth with the single-device mask
    stream (see :func:`_stage_branch`)."""
    n_stages = mesh.shape["pipe"]
    depth = config.depth
    if depth % n_stages:
        raise ValueError(f"depth={depth} % pipe={n_stages} != 0")
    n_local = depth // n_stages
    tp = _mesh_tp(mesh)
    if impl != "xla":
        raise NotImplementedError(
            "the pipeline's lax.switch stage programs are XLA-ops only "
            "(Pallas kernels are per-chip custom calls whose outputs "
            "carry no varying-mesh-axes metadata — they cannot type "
            "against the scan carry / psum chain here); pass impl='xla'"
        )
    if tp > 1:
        if config.num_heads % tp:
            raise ValueError(
                f"model axis {tp} must divide num_heads={config.num_heads}"
            )
        if config.mlp_hidden % tp:
            raise ValueError(
                f"model axis {tp} must divide mlp_hidden={config.mlp_hidden}"
            )
    entry = _entry_counts(config, schedule)
    n0 = config.num_tokens
    n_ticks = n_micro + n_stages - 1

    # scores validity entering stage s: the previous stage's LAST block was
    # pruned (an unpruned block resets scores — reference model.py:63)
    valid_in = [False] + [
        schedule[s * n_local - 1] is not None for s in range(1, n_stages)
    ]
    dpr = drop_path_rates(drop_path, depth) if drop_path > 0.0 else None
    branches = [
        _stage_branch(
            s, n_local, config, schedule, entry, valid_in[s], impl, tp,
            dpr=dpr, n_micro=n_micro, n_data=mesh.shape["data"],
        )
        for s in range(n_stages)
    ]
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def run(ptree, images, *dp_key):
        s_idx = jax.lax.axis_index("pipe")
        dtype = ptree["embed"]["cls_token"].dtype
        b_micro = images.shape[1]

        # Pre-embed every microbatch once (replicated work, one block-scale
        # matmul per microbatch — negligible next to M·depth block ticks).
        def embed(img):
            if stage is not None:
                # in-graph preprocessing (e.g. uint8 H2D + fused normalize,
                # rajni_tpu.data.device.normalize_images) — per-image math,
                # so it shards over ``data`` and replicates over ``pipe``
                # exactly like the embed itself
                img = stage(img)
            e = ptree["embed"]
            x = patch_embed(img.astype(dtype), e["patch_embed"], config)
            cls = jnp.broadcast_to(
                e["cls_token"], (x.shape[0], 1, config.embed_dim)
            )
            x = jnp.concatenate([cls, x], axis=1)
            return x + e["pos_embed"][:, : x.shape[1]]

        embedded = jax.vmap(embed)(images)  # [M, B, N0, C]

        def tick(carry, t):
            buf_x, buf_s, out = carry
            # inject: stage 0 takes microbatch t's embedding
            mb = jnp.clip(t, 0, n_micro - 1)
            x_in = jax.lax.dynamic_index_in_dim(embedded, mb, 0, False)
            buf_x = jnp.where(s_idx == 0, x_in, buf_x)

            if dpr is None:

                def compute(blocks, bx, bs):
                    return jax.lax.switch(s_idx, branches, blocks, bx, bs)

            else:
                # this tick's microbatch index for THIS stage (stage s at
                # tick t processes microbatch t-s; clipped in the bubble
                # ticks, whose outputs are never banked)
                mb_here = jnp.clip(t - s_idx, 0, n_micro - 1)

                def compute(blocks, bx, bs):
                    return jax.lax.switch(
                        s_idx, branches, blocks, bx, bs, dp_key[0], mb_here
                    )

            if remat:
                compute = jax.checkpoint(compute)
            x_out, s_out = compute(ptree["blocks"], buf_x, buf_s)

            # extract: the last stage's output of tick t is microbatch
            # t-(S-1)'s final activations. Only the CLS row is banked —
            # the final norm is per-token and the head reads CLS only, so
            # classifier_head runs ONCE on the banked rows after the scan
            # instead of as a discarded matmul on every stage every tick.
            o_idx = t - (n_stages - 1)
            valid = jnp.logical_and(s_idx == n_stages - 1, o_idx >= 0)
            cls_row = x_out[:, 0, :]
            safe = jnp.maximum(o_idx, 0)
            cur = jax.lax.dynamic_slice_in_dim(out, safe, 1, 0)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, jnp.where(valid, cls_row[None], cur), safe, 0
            )

            # shift stage s → s+1 on the ICI ring (absent sources yield 0)
            if perm:
                x_out = jax.lax.ppermute(x_out, "pipe", perm)
                s_out = jax.lax.ppermute(s_out, "pipe", perm)
            return (x_out, s_out, out), None

        # carries vary over every mesh axis at the first tick's output —
        # promote the zero init so the scan carry type is stable
        carry = jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, tuple(mesh.axis_names), to="varying"),
            (
                jnp.zeros((b_micro, n0, config.embed_dim), dtype),
                jnp.zeros((b_micro, n0), jnp.float32),
                jnp.zeros(
                    (n_micro, b_micro, config.embed_dim), dtype
                ),
            ),
        )
        (_, _, out), _ = jax.lax.scan(
            tick, carry, jnp.arange(n_ticks, dtype=jnp.int32)
        )
        # only the last stage banked CLS rows; everyone else holds zeros,
        # so the psum over ``pipe`` is exact (zeros + the real rows). With
        # TP every model shard of the last stage holds the SAME rows (x is
        # replicated over ``model`` after each psum), so the joint psum
        # overcounts by exactly tp — the 1/tp rescale restores them
        # (linear, so the train step's transpose stays exact), and
        # reducing over ``model`` demotes the manual-axes type so the
        # replicated out_spec holds.
        if tp > 1:
            out = jax.lax.psum(out, ("pipe", "model")) * (1.0 / tp)
        else:
            out = jax.lax.psum(out, "pipe")
        # ONE head pass over all banked CLS rows (replicated compute after
        # the reduction — the same operands as single-device, so the 2-D
        # pipeline stays bit-exact)
        return classifier_head(
            out.reshape(n_micro * b_micro, 1, config.embed_dim),
            ptree["head"], config, None, impl,
        ).astype(jnp.float32).reshape(n_micro, b_micro, -1)

    pspecs = None  # resolved per-call below (tree shape needs the params)

    def logits_fn(ptree, images, *dp_key):
        nonlocal pspecs
        if pspecs is None:
            pspecs = pipeline_pspecs(ptree, tp)
        extra = (P(),) * len(dp_key)  # drop-path key data: replicated
        return jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(pspecs, P(None, "data")) + extra,
            out_specs=P(None, "data"),
        )(ptree, images, *dp_key)

    return logits_fn


def _check_classic(config: ViTConfig) -> None:
    """The pipeline stage programs re-derive the classic block/head
    semantics (lax.switch branches with static per-stage token counts,
    CLS-only head bank) — extended variants (registers / qk-norm / pooled
    heads) are rejected rather than silently mis-run; use DP or XLA TP
    (``sharded_forward``), which route through ``vit_forward`` itself."""
    if (
        config.num_prefix_tokens != 1
        or config.qk_norm
        or config.global_pool != "token"
        or config.fc_norm_resolved
    ):
        raise ValueError(
            "pipeline parallelism supports classic ViT configs only "
            "(no registers / distillation token / qk-norm / pooled "
            "heads) — use data or tensor parallelism for extended "
            "variants"
        )


def pipeline_forward(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh,
    microbatch: int | None = None,
    impl: str = "xla",
    stage=None,
):
    """Jitted pipelined ``images -> logits`` over a ``(data, pipe)`` mesh.

    ``params`` may be the standard tree (stacked + placed here) or an
    already-stacked tree from :func:`stack_params`. The returned callable
    accepts ``[B, H, W, 3]`` (any B — padded to ``microbatch · data`` and
    sliced back) and returns ``[B, num_classes]`` f32 logits identical to
    the single-device :func:`rajni_tpu.models.vit.vit_forward`.

    ``microbatch`` is the number of in-flight microbatches M (default
    ``2 · pipe``); GPipe utilization is ``M / (M + S - 1)``.

    ``stage`` is an optional in-graph per-image preprocessing callable
    (:func:`rajni_tpu.run.make_preprocess_stage`) applied before the patch
    embed, so e.g. uint8 ``--preprocess device`` batches normalize on-chip.
    Array batches only — the ``device-full`` canvas-tuple mode is not wired
    through the pipeline's pad/reshape.
    """
    _check_classic(config)
    schedule = normalize_schedule(schedule, config.depth)
    n_stages = mesh.shape["pipe"]
    tp = _mesh_tp(mesh)
    n_micro = microbatch or 2 * n_stages
    if "blocks" in params and isinstance(params["blocks"], list):
        params = stack_params(params, n_stages, tp)
    elif tp > 1 and params["blocks"]["attn"]["qkv"]["kernel"].ndim != 4:
        raise ValueError(
            "a 3-D (model) mesh needs the head-aligned stacked layout — "
            "re-stack with stack_params(params, n_stages, tp)"
        )
    placed = place_pipeline_params(params, mesh)
    logits_fn = jax.jit(
        _pipeline_logits_fn(
            config, schedule, mesh, n_micro, impl, False, stage=stage
        )
    )

    n_data = mesh.shape["data"]
    group = n_micro * n_data

    def apply(images):
        b = images.shape[0]
        pad = (-b) % group
        if pad:
            # keep device batches on device (the eval harness prefetches
            # H2D in the untimed region; a np round-trip would undo that)
            xp = np if isinstance(images, np.ndarray) else jnp
            images = xp.concatenate(
                [images,
                 xp.zeros((pad,) + tuple(images.shape[1:]), images.dtype)],
                axis=0,
            )
        mb = images.reshape((n_micro, -1) + tuple(images.shape[1:]))
        out = logits_fn(placed, mb)
        return out.reshape(-1, out.shape[-1])[:b]

    apply.n_micro = n_micro
    # advertised so rajni_tpu.eval's prefetcher scatters H2D untimed; the
    # jit reshards rows to the (microbatch, data) layout on-device
    apply.input_sharding = NamedSharding(mesh, P("data"))
    return apply


def make_pipeline_train_step(
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh,
    tx,
    microbatch: int | None = None,
    impl: str = "xla",
    label_smoothing: float = 0.0,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    switch_prob: float = 0.5,
    seed: int = 0,
    drop_path: float = 0.0,
):
    """GPipe train step over the ``(data, pipe)`` mesh.

    ``step(state, images[M·Bd, H, W, 3], labels[M·Bd]) -> (state, metrics)``
    where ``state.params`` is a *stacked* tree (:func:`stack_params`,
    placed with :func:`place_pipeline_params` so each chip's optimizer
    state covers only its stage). The backward pipeline schedule is the
    autodiff transpose of the forward scan — ``ppermute`` reverses
    direction, ``psum`` becomes broadcast — with per-tick rematerialization
    (``jax.checkpoint``) so activation memory is one stage-tick, not the
    whole unrolled pipeline.

    ``drop_path`` enables timm stochastic depth inside the stage programs:
    per-block rates are static per ``lax.switch`` branch (they were never
    blocked by the stacked leaves — VERDICT r3 #5), and masks are drawn
    from the SAME ``(seed, step)``-keyed full-batch stream as the plain
    train step, so a PP run drops the same samples at the same blocks as
    its single-device equivalent.
    """
    import optax

    from ..train import (_DROPPATH_TAG, TrainState, apply_batch_mix,
                         cross_entropy, mixed_cross_entropy)

    _check_classic(config)
    schedule = normalize_schedule(schedule, config.depth)
    n_micro = microbatch or 2 * mesh.shape["pipe"]
    logits_fn = _pipeline_logits_fn(
        config, schedule, mesh, n_micro, impl, remat=True,
        drop_path=drop_path,
    )

    mixing = mixup_alpha > 0.0 or cutmix_alpha > 0.0

    def loss_fn(ptree, images, labels, lam, dp_key):
        mb = images.reshape((n_micro, -1) + tuple(images.shape[1:]))
        logits = logits_fn(
            ptree, mb, *(() if dp_key is None else (dp_key,))
        ).reshape(-1, config.num_classes)
        if mixing:
            loss = mixed_cross_entropy(logits, labels, lam, label_smoothing)
        else:
            loss = cross_entropy(logits, labels, label_smoothing)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    def step(state: TrainState, images, labels):
        if mixing:
            # mix over the FULL global batch before the microbatch split
            # (same pairing as the plain train step: batch vs its reverse)
            images, lam = apply_batch_mix(
                images, seed, state.step, mixup_alpha, cutmix_alpha,
                switch_prob,
            )
        else:
            lam = jnp.float32(1.0)
        dp_key = None
        if drop_path > 0.0:
            # identical stream to the plain step (train.py): resume replays
            # the same drop decisions, and they match single-device runs
            dp_key = jax.random.key_data(jax.random.fold_in(
                jax.random.fold_in(jax.random.key(seed), _DROPPATH_TAG),
                state.step,
            ))
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, labels, lam, dp_key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return step
