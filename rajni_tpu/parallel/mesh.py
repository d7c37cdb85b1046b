"""SPMD parallelism over a TPU device mesh.

The reference has **no** distributed code (SURVEY.md §2 "Parallelism"); this
module is the TPU-native capability equivalent and more: a 2-D
``(data, model)`` :class:`jax.sharding.Mesh` with

  * **data parallelism**: the batch sharded over the ``data`` axis;
    accuracy counters reduce across chips via XLA collectives;
  * **tensor parallelism** (Megatron pattern): QKV/fc1 kernels column-sharded
    and proj/fc2 kernels row-sharded over the ``model`` axis, so each block is
    one column-parallel matmul → local attention/GELU → one row-parallel
    matmul → psum, with XLA's SPMD partitioner inserting the all-reduces on
    ICI automatically.

Everything goes through ``jax.jit`` with sharding annotations — no manual
collectives, no NCCL-style process groups. Multi-host (DCN) lives in
:mod:`rajni_tpu.parallel.multihost`: ``jax.distributed.initialize`` plus
per-process batch assembly; the sharded program itself is unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import (
    ViTConfig,
    pallas_compilable as _pallas_compilable,
    vit_forward,
)
from ..utils.schedule import Schedule


def make_mesh(
    devices=None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def repack_qkv_heads(params: Any) -> Any:
    """Head-aligned TP layout for the packed QKV weights.

    ``qkv.kernel [C, 3C]`` sharded ``P(None, "model")`` splits the packed
    (q|k|v, head, dim) lane order across the q/k/v boundary — correct under
    SPMD but forces an all-gather before the head reshape. Splitting the
    packed axis first — ``[C, 3, C]`` kernel, ``[3, C]`` bias, last axis
    sharded — keeps every shard a whole set of heads (model must divide the
    head count for zero-comm attention), so the only collectives left per
    block are the two row-parallel all-reduces (proj, fc2): the Megatron
    minimum. The forward consumes either layout
    (:func:`rajni_tpu.ops.attention._qkv_projection`); element order is
    unchanged, so this is a pure reshape of the checkpoint, not a permute.
    Int8 quantization records are repacked the same way (int8 ``[C, 3, C]``,
    scale ``[3, C]``).
    """

    def repack_block(block):
        b = dict(block)
        attn = dict(block["attn"])
        qkv = dict(attn["qkv"])
        k = qkv["kernel"]
        if isinstance(k, dict):  # quantized record
            if k["int8"].ndim == 2:
                C = k["int8"].shape[0]
                k = dict(k)
                k["int8"] = k["int8"].reshape(C, 3, C)
                k["scale"] = k["scale"].reshape(3, C)
                qkv["kernel"] = k
        elif k.ndim == 2:
            C = k.shape[0]
            qkv["kernel"] = k.reshape(C, 3, C)
        if qkv["bias"].ndim == 1:
            qkv["bias"] = qkv["bias"].reshape(3, -1)
        attn["qkv"] = qkv
        b["attn"] = attn
        return b

    out = dict(params)
    out["blocks"] = [repack_block(b) for b in params["blocks"]]
    return out


def unrepack_qkv_heads(params: Any) -> Any:
    """Inverse of :func:`repack_qkv_heads`: back to the packed ``[C, 3C]``
    kernel / ``[3C]`` bias checkpoint layout (pure reshape — element order
    is unchanged). The forward consumes either layout, but checkpoints are
    kept canonical so they interchange with the converter and the torch
    oracles."""

    def unrepack_block(block):
        b = dict(block)
        attn = dict(block["attn"])
        qkv = dict(attn["qkv"])
        k = qkv["kernel"]
        if isinstance(k, dict):  # quantized record
            if k["int8"].ndim == 3:
                C = k["int8"].shape[0]
                k = dict(k)
                k["int8"] = k["int8"].reshape(C, 3 * C)
                k["scale"] = k["scale"].reshape(3 * C)
                qkv["kernel"] = k
        elif k.ndim == 3:
            C = k.shape[0]
            qkv["kernel"] = k.reshape(C, 3 * C)
        if qkv["bias"].ndim == 2:
            qkv["bias"] = qkv["bias"].reshape(-1)
        attn["qkv"] = qkv
        b["attn"] = attn
        return b

    out = dict(params)
    out["blocks"] = [unrepack_block(b) for b in params["blocks"]]
    return out


def _maybe_quantized_spec(kernel, spec):
    """Match a PartitionSpec to a plain kernel or an int8 record's leaves.

    A quantized record shards its int8 payload like the plain weight; the
    per-output-channel scale row follows the kernel's *output* axis."""
    if not isinstance(kernel, dict):
        return spec
    out_axis_sharded = len(spec) > 0 and spec[-1] is not None
    ndim = kernel["scale"].ndim
    if out_axis_sharded:
        scale_spec = P(*([None] * (ndim - 1)), "model")
    else:
        scale_spec = P()
    return {"int8": spec, "scale": scale_spec}


def param_pspecs(params: Any) -> Any:
    """PartitionSpecs for a ViT param pytree: Megatron TP over ``model``.

    - ``qkv.kernel`` / ``mlp.fc1.kernel [C, H]``: column-parallel (output
      dim sharded) with matching bias sharding; qkv uses the head-aligned
      ``[C, 3, C]`` layout when present (:func:`repack_qkv_heads`);
    - ``attn.proj.kernel [C, C]`` / ``mlp.fc2.kernel [H, C]``: row-parallel
      (input dim sharded), bias replicated;
    - embeddings, norms, head: replicated (tiny);
    - int8 quantization records shard their payload like the plain weight.
    """

    def block_spec(block):
        qkv_k = block["attn"]["qkv"]["kernel"]
        packed3 = (
            qkv_k["int8"].ndim if isinstance(qkv_k, dict) else qkv_k.ndim
        ) == 3
        qkv_kernel_spec = (
            P(None, None, "model") if packed3 else P(None, "model")
        )
        qkv_bias_spec = (
            P(None, "model")
            if block["attn"]["qkv"]["bias"].ndim == 2
            else P("model")
        )
        spec = {
            "norm1": {"scale": P(), "bias": P()},
            "norm2": {"scale": P(), "bias": P()},
            "attn": {
                "qkv": {
                    "kernel": _maybe_quantized_spec(qkv_k, qkv_kernel_spec),
                    "bias": qkv_bias_spec,
                },
                "proj": {
                    "kernel": _maybe_quantized_spec(
                        block["attn"]["proj"]["kernel"], P("model", None)
                    ),
                    "bias": P(),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": _maybe_quantized_spec(
                        block["mlp"]["fc1"]["kernel"], P(None, "model")
                    ),
                    "bias": P("model"),
                },
                "fc2": {
                    "kernel": _maybe_quantized_spec(
                        block["mlp"]["fc2"]["kernel"], P("model", None)
                    ),
                    "bias": P(),
                },
            },
        }
        if "ls1" in block:
            spec["ls1"] = P()
            spec["ls2"] = P()
        if "q_norm" in block["attn"]:
            # per-head q/k LayerNorms (qk-normed variants): [D] vectors,
            # replicated — every head shard applies the same norm
            spec["attn"]["q_norm"] = {"scale": P(), "bias": P()}
            spec["attn"]["k_norm"] = {"scale": P(), "bias": P()}
        return spec

    head_kernel = params["head"]["kernel"]
    out = {
        "patch_embed": {"kernel": P(), "bias": P()},
        "cls_token": P(),
        "pos_embed": P(),
        "blocks": [block_spec(b) for b in params["blocks"]],
        "head": {
            "kernel": _maybe_quantized_spec(head_kernel, P()),
            "bias": P(),
        },
    }
    # extended-variant leaves (pooled heads / registers / distillation):
    # tiny, replicated
    out["fc_norm" if "fc_norm" in params else "norm"] = {
        "scale": P(), "bias": P()
    }
    if "reg_token" in params:
        out["reg_token"] = P()
    if "dist_token" in params:
        out["dist_token"] = P()
        out["head_dist"] = {
            "kernel": _maybe_quantized_spec(
                params["head_dist"]["kernel"], P()
            ),
            "bias": P(),
        }
    return out


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh with TP shardings.

    With a real ``model`` axis the packed QKV weights are first re-packed
    head-aligned (:func:`repack_qkv_heads`) so TP attention needs no
    all-gather — see ``tests/test_parallel.py``'s compiled-HLO collective
    assertions."""
    if mesh.shape["model"] > 1:
        params = repack_qkv_heads(params)
    specs = param_pspecs(params)
    # quantized records are dicts mirrored by _maybe_quantized_spec, so the
    # two trees always match leaf-for-leaf
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the ``data`` axis (leading dim)."""
    return NamedSharding(mesh, P("data"))


def _pad_batch(images, n_data: int):
    """Zero-pad the batch to a multiple of the data-axis size.

    The eval DataLoader yields a partial final batch (``drop_last=False``,
    reference run.py:75-82) whose size need not divide the mesh — e.g.
    ImageNet-val's trailing 80 images on a 32-chip mesh. Returns
    ``(padded_images, real_batch)``; callers slice the outputs back.
    Tuple batches (the on-device preprocessing ``(canvas, sizes)`` mode,
    :mod:`rajni_tpu.data.device`) pad every leaf along the batch dim.
    """
    if isinstance(images, tuple):
        b = images[0].shape[0]
        return tuple(_pad_batch(e, n_data)[0] for e in images), b
    b = images.shape[0]
    pad = (-b) % n_data
    if pad == 0:
        return images, b  # no copy on the common (full-batch) path
    images = np.concatenate(
        [np.asarray(images),
         np.zeros((pad,) + tuple(images.shape[1:]), np.asarray(images).dtype)],
        axis=0,
    )
    return images, b


def sharded_forward(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh,
    impl: str = "xla",
    stage=None,
    act_scales=None,
):
    """Jitted ``images -> logits`` with DP batch + TP params over ``mesh``.

    The returned callable accepts a host or device batch ``[B, H, W, 3]``
    (B divisible by the ``data`` axis size) and returns replicated logits.

    ``stage`` is an optional in-graph preprocessing callable applied to the
    batch before the forward (e.g. :func:`rajni_tpu.data.device.
    normalize_images` or a ``preprocess_on_device`` partial). Its input may
    be a tuple pytree (``(canvas_u8, sizes)``); every leaf is batch-leading
    and shards over the ``data`` axis — the stage math is per-image, so DP
    composes trivially (VERDICT r2 missing #3; reference equivalence: the
    per-image torchvision transforms at run.py:62-70)."""

    if impl == "auto":
        # resolve by backend here: the per-batch crossover
        # (models.vit.resolve_impl) does not apply — the DP path exists
        # for large serving batches, and "auto" must never silently build
        # interpret-mode Pallas kernels off-TPU
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl != "xla" and not (
        config.kernel_path_supported and _pallas_compilable(config)
    ):
        # extended variants (registers / qk-norm) demote to the XLA path,
        # same rule as vit_forward — in particular this keeps them off the
        # manual per-chip Megatron composition (tp_pallas_forward), which
        # hard-codes the classic semantics; the XLA TP route partitions
        # whatever the forward computes, so it needs no special casing.
        # Lane-unaligned widths (C % 128 != 0) demote too: Mosaic cannot
        # compile them on real TPU (models.vit.pallas_compilable).
        impl = "xla"

    def forward(p, images):
        if stage is not None:
            images = stage(images)
        # act_scales (calibrated static int8 activation scales) is a
        # closure constant — static at trace time, per-chip math only, so
        # it composes with DP shard_map and jit-with-shardings unchanged.
        return vit_forward(p, images, config, schedule, impl, act_scales)

    if impl != "xla":
        # Pallas kernels are single-chip programs: XLA's SPMD partitioner
        # cannot split a custom call, so under jit-with-shardings it would
        # replicate the kernel (correct but wasted work). Instead map the
        # full per-chip forward over the data axis with shard_map — each
        # chip runs its kernels on its local batch shard. A real model axis
        # routes to the MANUAL Megatron composition over per-chip kernels
        # (:func:`tp_pallas_forward` — r2's "TP excludes the kernel path"
        # limitation, closed r3).
        if mesh.shape["model"] > 1:
            return tp_pallas_forward(
                params, config, schedule, mesh, stage=stage,
                act_scales=act_scales,
            )
        mapped = jax.jit(
            jax.shard_map(
                forward,
                mesh=mesh,
                # P("data") is a pytree prefix: tuple batches (canvas mode)
                # shard every leaf on the leading dim
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                # pallas_call outputs carry no varying-mesh-axes metadata
                check_vma=False,
            )
        )
        replicated = jax.device_put(params, NamedSharding(mesh, P()))
        n_data = mesh.shape["data"]

        def apply_pallas(images):
            images, b = _pad_batch(images, n_data)
            images = jax.device_put(images, batch_sharding(mesh))
            return mapped(replicated, images)[:b]

        apply_pallas.input_sharding = batch_sharding(mesh)
        return apply_pallas

    sharded = shard_params(params, mesh)
    fwd = jax.jit(
        forward,
        # params keep their placed (TP) shardings; batch arrives DP-sharded
        # (sharding is a pytree prefix: tuple batches shard every leaf)
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=NamedSharding(mesh, P("data")),
    )

    n_data = mesh.shape["data"]

    def apply(images):
        images, b = _pad_batch(images, n_data)
        images = jax.device_put(images, batch_sharding(mesh))
        return fwd(sharded, images)[:b]

    apply.input_sharding = batch_sharding(mesh)
    return apply


def tp_pallas_forward(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh,
    stage=None,
    act_scales=None,
):
    """DP + tensor-parallel forward on the PALLAS kernel backend.

    XLA's SPMD partitioner cannot split a custom call, so the jit-with-
    shardings TP path is XLA-ops only (r2 limitation). This builds Megatron
    TP for the kernel backend *manually* with ``shard_map``: every chip runs
    the per-chip Pallas kernels on its head/hidden shard and the only
    cross-chip communication is the Megatron minimum — two ``psum``s per
    block (attention proj, fc2) plus, on rescoring blocks, one tiny psum of
    the scorer's cross-head partial sums:

      * LN+QKV kernel per chip on the head-aligned local packing
        ``[C, 3*C_local]`` (:func:`repack_qkv_heads` guarantees whole
        heads per shard);
      * importance = replicated completion of psum'd local-head partials
        (:func:`rajni_tpu.ops.importance.importance_partials` — the CLS
        softmax is per-head-local; only the two head-MEANs couple shards);
      * selection replicated (identical scores everywhere), gather + SDPA +
        row-parallel proj in the fused gather kernel with a zero residual
        and zero bias — its output is this shard's PARTIAL sum; the single
        residual add and ls1·bias happen once after the psum;
      * MLP kernel with ``add_residual=False`` and zero fc2 bias, psum'd
        the same way.

    Int8 quantization records route through the per-op int8 kernels
    (:func:`fused_ln_qkv_int8`, :func:`fused_gather_sdpa_proj_residual_int8`,
    :func:`fused_ln_mlp_residual_int8`) with GROUPED activation scales: the
    column-parallel sites (QKV, fc1) quantize the replicated full-C rows —
    identical on every shard — while the row-parallel sites (proj, fc2)
    quantize each shard's local slice with its own per-row scale before the
    int8 dot, and the psum adds the *dequantized* f32 partials. Per-shard
    groups are a finer quantization grid than the single-chip whole-row
    scale, so TP int8 is at least as accurate but not bit-identical to
    single-chip int8 (tolerance-tested in tests/test_parallel.py).
    ``act_scales`` (:class:`rajni_tpu.quant.ActScales`) switches every
    int8 site to the calibrated static scales — since static quantization
    is an ELEMENTWISE op, each shard's int8 values equal the matching
    slice of the single-chip quantization, so static TP matches
    single-chip static int8 up to f32 psum rounding (much tighter than
    the dynamic grouped-scale case).
    Returns a callable like :func:`sharded_forward`'s.
    """
    from ..kernels.attention import fused_sdpa
    from ..kernels.block import (
        fused_gather_sdpa_proj_residual,
        fused_gather_sdpa_proj_residual_int8,
        fused_ln_qkv,
        fused_ln_qkv_int8,
    )
    from ..kernels.block import _gather_fits_fast
    from ..kernels.math import quantize_rows, quantize_static
    from ..kernels.mlp import fused_ln_mlp_residual, fused_ln_mlp_residual_int8
    from ..models.vit import classifier_head, patch_embed
    from ..quant import dequantize_weight
    from ..ops.importance import (
        importance_from_partials,
        importance_partials,
    )
    from ..ops.pruning import gather_tokens, keep_count, select_tokens_dense
    from ..quant import is_quantized
    from ..utils.schedule import normalize_schedule

    schedule = normalize_schedule(schedule, config.depth)
    tp = mesh.shape["model"]
    if config.num_heads % tp:
        raise ValueError(
            f"model axis {tp} must divide num_heads={config.num_heads}"
        )
    if config.mlp_hidden % tp:
        raise ValueError(
            f"model axis {tp} must divide mlp_hidden={config.mlp_hidden}"
        )
    params = repack_qkv_heads(params)
    pspecs = param_pspecs(params)
    H_l = config.num_heads // tp
    eps = config.layer_norm_eps
    C = config.embed_dim

    def chip(p, images):
        if stage is not None:
            images = stage(images)
        dtype = p["cls_token"].dtype
        B = images.shape[0]
        x = patch_embed(images.astype(dtype), p["patch_embed"], config)
        cls = jnp.broadcast_to(p["cls_token"], (B, 1, C))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["pos_embed"][:, : x.shape[1]]

        scores = None
        for blk_i, (spec, block) in enumerate(zip(schedule, p["blocks"])):
            qkv_loc = block["attn"]["qkv"]
            q_kern = qkv_loc["kernel"]
            quantized = is_quantized(q_kern)
            aq = ap = a1 = a2 = None
            if act_scales is not None:
                # unpack regardless of which sites are quantized: MLP-only
                # quantization (quantize_params(attn=False)) must still
                # consume its calibrated a_fc1/a_fc2, matching single-chip
                # vit_forward
                aq, ap, a1, a2 = act_scales.block(blk_i)
            wproj = block["attn"]["proj"]["kernel"]   # [C_local, C] (record)
            bproj = block["attn"]["proj"]["bias"]     # [C] replicated
            ls1 = block.get("ls1")
            ls2 = block.get("ls2")
            b1term = bproj if ls1 is None else bproj * ls1
            # For pruned blocks, the int8 gather tail must fit VMEM or we
            # fall back to the dequantized bf16 tail (which has its own
            # chunked long-sequence path) — decide BEFORE the qkv
            # producer runs, because the bf16 tail never compensates the
            # V-column fold (same hazard as vit_forward's int8_tail).
            n_in = x.shape[1]
            C_loc = C // tp  # per-shard width (whole heads per shard)
            int8_tail = quantized and (
                spec is None
                or _gather_fits_fast(
                    n_in, keep_count(spec.keep_ratio, n_in) + 1,
                    max(C_loc, C), jnp.dtype(x.dtype).itemsize,
                )
            )
            ap_eff = ap if int8_tail else None
            if quantized:
                qkv_flat = {
                    "kernel": {
                        "int8": q_kern["int8"].reshape(C, -1),
                        "scale": q_kern["scale"].reshape(-1),
                    },
                    "bias": qkv_loc["bias"].reshape(-1),
                }
                qkv_l, _ = fused_ln_qkv_int8(
                    x, block["norm1"], qkv_flat, H_l, eps, False,
                    act_scales=(
                        None if (aq is None or not int8_tail)
                        else (aq, ap)
                    ),
                )
            else:
                qkv_flat = {
                    "kernel": q_kern.reshape(C, -1),
                    "bias": qkv_loc["bias"].reshape(-1),
                }
                qkv_l, _ = fused_ln_qkv(
                    x, block["norm1"], qkv_flat, H_l, eps, False
                )
            if spec is None:
                attn_l = fused_sdpa(qkv_l, H_l, config.attn_scale)
                if quantized:
                    # Row-parallel proj on the int8 MXU: per-row scales over
                    # this shard's local C slice (grouped quantization —
                    # the psum adds dequantized f32 partials); static mode
                    # quantizes with a bare round/clip — the V-column fold
                    # in fused_ln_qkv_int8 pre-scaled attn by 1/a_proj.
                    a32 = attn_l.astype(jnp.float32).reshape(
                        -1, attn_l.shape[-1]
                    )
                    if ap is not None:
                        a_q, a_s = quantize_static(a32), ap
                    else:
                        a_q, a_s = quantize_rows(a32)
                    acc = jax.lax.dot_general(
                        a_q, wproj["int8"], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    part = (acc * a_s * wproj["scale"].reshape(1, -1)
                            ).reshape(attn_l.shape[0], attn_l.shape[1], C)
                else:
                    part = jnp.einsum(
                        "bnc,cd->bnd", attn_l, wproj,
                        preferred_element_type=jnp.float32,
                    )
                out = jax.lax.psum(part, "model")
                if ls1 is not None:
                    out = out * ls1
                x = (x.astype(jnp.float32) + out + b1term).astype(dtype)
                scores = None  # stock block invalidates (model.py:63)
            else:
                n = x.shape[1]
                keep = keep_count(spec.keep_ratio, n)
                if spec.update or scores is None:
                    a_s, v_s = importance_partials(qkv_l, H_l)
                    a_s = jax.lax.psum(a_s, "model")
                    v_s = jax.lax.psum(v_s, "model")
                    scores = importance_from_partials(
                        a_s, v_s, config.num_heads
                    )
                idx, sel = select_tokens_dense(scores, keep, x.dtype)
                x_g = gather_tokens(x, idx)
                if int8_tail:
                    part = fused_gather_sdpa_proj_residual_int8(
                        qkv_l, sel, jnp.zeros_like(x),
                        {"kernel": wproj, "bias": jnp.zeros_like(bproj)},
                        ls1, H_l, config.attn_scale, act_scale=ap_eff,
                    )
                else:
                    # bf16 tail (has a chunked long-sequence path the int8
                    # kernel lacks); dequantize the proj shard if needed
                    wp = (dequantize_weight(wproj).astype(x.dtype)
                          if quantized else wproj)
                    part = fused_gather_sdpa_proj_residual(
                        qkv_l, sel, jnp.zeros_like(x),
                        {"kernel": wp, "bias": jnp.zeros_like(bproj)},
                        ls1, H_l, config.attn_scale,
                    )
                out = jax.lax.psum(part.astype(jnp.float32), "model")
                x = (
                    x_g.astype(jnp.float32) + out + b1term
                ).astype(dtype)
                scores = jnp.take_along_axis(scores, idx, axis=1)

            mlp_l = block["mlp"]
            b2 = mlp_l["fc2"]["bias"]
            b2term = b2 if ls2 is None else b2 * ls2
            mlp_zerob = {
                "fc1": mlp_l["fc1"],
                "fc2": {
                    "kernel": mlp_l["fc2"]["kernel"],
                    "bias": jnp.zeros_like(b2),
                },
            }
            if is_quantized(mlp_l["fc1"]["kernel"]):
                part = fused_ln_mlp_residual_int8(
                    x, block["norm2"], mlp_zerob, ls2, eps,
                    add_residual=False,
                    act_scales=None if a1 is None else (a1, a2),
                )
            else:
                part = fused_ln_mlp_residual(
                    x, block["norm2"], mlp_zerob, ls2, eps,
                    add_residual=False,
                )
            out = jax.lax.psum(part.astype(jnp.float32), "model")
            x = (x.astype(jnp.float32) + out + b2term).astype(dtype)

        # shared head: CLS-only final norm + (static-)int8/linear head —
        # one implementation with vit_forward so the semantics (impl gate,
        # output dtype) cannot drift between the entry points
        return classifier_head(x, p, config, act_scales, "pallas")

    mapped = jax.jit(
        jax.shard_map(
            chip,
            mesh=mesh,
            in_specs=(pspecs, P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )
    placed = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, pspecs,
    )
    n_data = mesh.shape["data"]

    def apply(images):
        images, b = _pad_batch(images, n_data)
        images = jax.device_put(images, batch_sharding(mesh))
        return mapped(placed, images)[:b]

    apply.input_sharding = batch_sharding(mesh)
    return apply


def data_parallel_forward(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh | None = None,
    impl: str = "xla",
    stage=None,
    act_scales=None,
):
    """Convenience: shard over all local devices (1-D data mesh by default)."""
    if mesh is None:
        mesh = make_mesh()
    return sharded_forward(params, config, schedule, mesh, impl, stage=stage,
                           act_scales=act_scales)


def eval_step_fn(config: ViTConfig, schedule: Schedule | None, mesh: Mesh):
    """Jitted ``(params, images, labels) -> (correct, total)`` counters.

    The batch-sharded argmax/compare reduces to replicated scalars — the
    TPU-native equivalent of the reference's per-batch host-side accumulation
    (eval.py:61-64), with XLA emitting the cross-chip psum.
    """

    def step(params, images, labels):
        import jax.numpy as jnp

        logits = vit_forward(params, images, config, schedule)
        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((preds == labels).astype(jnp.int32))
        total = jnp.asarray(labels.shape[0], jnp.int32)
        return correct, total

    return jax.jit(
        step,
        in_shardings=(
            None,
            batch_sharding(mesh),
            NamedSharding(mesh, P("data")),
        ),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
