"""Int8 weight quantization for TPU inference (opt-in extension).

The v5e MXU runs int8×int8 at twice its bf16 rate, so the matmul-bound
majority of the forward (the MLP is ~2/3 of a block's FLOPs) can trade a
controlled amount of precision for throughput. This module implements the
standard dynamic-quantization recipe:

  * **Weights**: symmetric per-output-channel int8
    (``scale[j] = absmax(W[:, j]) / 127``), quantized once offline.
  * **Activations**: symmetric per-row (per-token) int8, computed on the fly
    inside the kernel from the tile it already holds — no calibration data
    needed, no HBM cost. Alternatively, :func:`calibrate_act_scales`
    produces CALIBRATED static per-tensor scales (standard PTQ): the
    ``1/a`` quantize factors fold into the LayerNorm affines and the ``a``
    dequant factors into the weight-scale vectors at trace time, so the
    per-row absmax passes vanish from the kernels. Measured (v5e-1,
    batch-256 ViT-B schedule.json, BENCH_SUITE.json): static 6405 img/s
    pruned vs 6267 dynamic (+2.2%, 89% of the bf16 roofline) but 5426 vs
    5635 stock (−3.7%) — per-architecture routing advice in
    docs/QUANTIZATION.md (small-C models win most from static).
  * Accumulation in int32 on the MXU, dequantized as
    ``acc · a_scale[i] · w_scale[j]`` before bias/activation.

Quantization is a *params-level transform*: :func:`quantize_params` rewrites
the MLP weight leaves into ``{"int8": ..., "scale": ...}`` records, and the
forward (``impl="pallas"``) automatically routes such blocks through the
int8 kernel (:func:`rajni_tpu.kernels.mlp.fused_ln_mlp_residual_int8`).
This is an accuracy-affecting extension — the reference semantics are the
bf16/fp32 path; expect ImageNet top-1 within a few tenths of a point, and
validate on your task before deploying.

The reference has no quantization (pure fp32 torch); this is TPU-native
surface beyond parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .models.vit import Params


def quantize_weight(w: jax.Array) -> dict:
    """Symmetric per-output-channel int8 quantization of ``[in, out]``.

    Returns ``{"int8": int8 [in, out], "scale": f32 [1, out]}`` with
    ``w ≈ int8 * scale``.
    """
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)  # [1, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"int8": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(q: dict, dtype=jnp.float32) -> jax.Array:
    """Inverse of :func:`quantize_weight` (for reference paths and tests)."""
    return (q["int8"].astype(jnp.float32) * q["scale"]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and "int8" in leaf


def quantize_params(
    params: Params, attn: bool = True, head: bool = True
) -> Params:
    """Quantize every block's MLP (fc1 + fc2) — and, with ``attn=True``,
    the QKV/output-projection, and with ``head=True``, the classifier
    head — weights to int8.

    Embeddings and norms stay in the original dtype. With the full set of
    flags (the default) the projections and MLP run on the int8 MXU via
    :mod:`rajni_tpu.kernels`' ``*_int8`` kernels, and the head as a plain
    XLA int8 dot. The SDPA inside those kernels stays bf16 by DEFAULT —
    an int8 SDPA exists (:func:`rajni_tpu.kernels.block._mha_int8`:
    per-token q/k rows, per-channel v columns, fp32 softmax with the
    normalizer folded into the dequant; enable with the kernels'
    ``int8_sdpa=True``) but measured 0.17 ms/block slower at ViT shapes:
    the SDPA is ~2% of a block's MACs, so its quantize overhead outweighs
    the 2× MXU rate. Importance scoring operates on the dequantized QKV,
    so the RAJNI scoring semantics are unchanged up to weight-quantization
    error.
    """
    if params["blocks"] and is_quantized(
        params["blocks"][0]["mlp"]["fc1"]["kernel"]
    ):
        raise ValueError("params are already quantized")
    out = dict(params)
    blocks = []
    for block in params["blocks"]:
        b = dict(block)
        mlp = {}
        for name in ("fc1", "fc2"):
            layer = dict(block["mlp"][name])
            layer["kernel"] = quantize_weight(layer["kernel"])
            mlp[name] = layer
        b["mlp"] = mlp
        if attn:
            # dict-copy keeps non-projection leaves (q_norm/k_norm of
            # qk-normed variants) un-quantized and present
            a = dict(block["attn"])
            for name in ("qkv", "proj"):
                layer = dict(block["attn"][name])
                layer["kernel"] = quantize_weight(layer["kernel"])
                a[name] = layer
            b["attn"] = a
        blocks.append(b)
    out["blocks"] = blocks
    if head:
        hd = dict(params["head"])
        hd["kernel"] = quantize_weight(hd["kernel"])
        out["head"] = hd
        if "head_dist" in params:
            # DeiT distillation head: same int8 treatment as the CLS head
            hdd = dict(params["head_dist"])
            hdd["kernel"] = quantize_weight(hdd["kernel"])
            out["head_dist"] = hdd
    return out


# --------------------------------------------------------------------------
# Calibrated static activation scales (PTQ calibration)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ActScales:
    """Calibrated static int8 activation scales for the forward's quantize
    sites — nested tuples of plain Python floats so the whole object is
    hashable and travels as a *static* jit argument (the kernels fold the
    scales into their LayerNorm/weight-scale operands at trace time; a
    recalibration therefore recompiles, which is the intended deployment
    model — scales change once per checkpoint, not per batch).

    ``blocks[i] = (a_qkv, a_proj, a_fc1, a_fc2)`` — the per-block scales of
    the four activation-quantize sites (post-LN1 QKV input, SDPA output,
    post-LN2 fc1 input, post-GELU fc2 input); ``head`` is the classifier
    input (post-final-norm CLS row). Each ``a`` is ``absmax·margin/127``
    with ``y ≈ int8·a``.
    """

    blocks: tuple[tuple[float, float, float, float], ...]
    head: float

    def block(self, i: int) -> tuple[float, float, float, float]:
        return self.blocks[i]

    def save(self, path: str) -> None:
        """Serialize to JSON (calibrate once, export/serve anywhere —
        the scales are plain floats, so the file is toolchain-free)."""
        import json

        with open(path, "w") as f:
            json.dump(
                {"blocks": [list(row) for row in self.blocks],
                 "head": self.head},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "ActScales":
        import json

        with open(path) as f:
            d = json.load(f)
        blocks = tuple(tuple(float(v) for v in row) for row in d["blocks"])
        head = float(d["head"])
        for i, row in enumerate(blocks):
            if len(row) != 4:
                raise ValueError(
                    f"{path}: block {i} has {len(row)} scales, expected 4 "
                    "(a_qkv, a_proj, a_fc1, a_fc2)"
                )
        import math

        flat = [v for row in blocks for v in row] + [head]
        if any(not math.isfinite(v) or v <= 0.0 for v in flat):
            raise ValueError(
                f"{path}: activation scales must be finite and positive"
            )
        return cls(blocks=blocks, head=head)


def _calibration_forward(params, images, config, schedule):
    """XLA-semantics forward that also returns the per-site activation
    absmax values the int8 kernels quantize over.

    Mirrors ``vit_forward``'s lax branch (models/vit.py — reference
    model.py:30-69 / attention.py:17-60 semantics) but exposes the two
    intra-attention activations (post-LN1 ``y``, pre-projection SDPA
    output) that no public hook reaches. Returns
    ``(block_amax [depth × 4], head_amax, logits)`` — the logits let
    tests pin this re-derivation against ``vit_forward`` itself, so the
    calibration path cannot drift from the real forward.
    """
    from .models.vit import _layer_scale, layer_norm, patch_embed
    from .ops.attention import _qkv_projection, _sdpa
    from .ops.importance import compute_importance
    from .ops.pruning import gather_tokens, keep_count, select_tokens
    from .utils.schedule import normalize_schedule

    schedule = normalize_schedule(schedule, config.depth)
    eps = config.layer_norm_eps
    B = images.shape[0]
    dtype = params["cls_token"].dtype
    x = patch_embed(images.astype(dtype), params["patch_embed"], config)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, config.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:, : x.shape[1]]
    # Extended variants (registers / qk-norm) never reach this path:
    # calibrate_act_scales rejects them up front (the fused int8 kernels
    # the scales feed demote to XLA for those configs). Pooled heads ARE
    # kernel-supported — mirrored below.

    amax = lambda v: jnp.max(jnp.abs(v.astype(jnp.float32)))  # noqa: E731
    scores = None
    block_amax = []
    for spec, block in zip(schedule, params["blocks"]):
        y = layer_norm(x, block["norm1"], eps)
        a_qkv = amax(y)
        qkv = _qkv_projection(y, block["attn"])
        if spec is not None:
            keep = keep_count(spec.keep_ratio, x.shape[1])
            if spec.update or scores is None:
                scores = compute_importance(qkv, config.num_heads)
            keep_idx = select_tokens(scores, keep)
            qkv = gather_tokens(qkv, keep_idx)
            # Residual compaction BEFORE the residual add (model.py:55-56).
            x = gather_tokens(x, keep_idx)
            scores = jnp.take_along_axis(scores, keep_idx, axis=1)
        else:
            scores = None
        attn = _sdpa(qkv, config.num_heads, config.attn_scale)
        a_proj = amax(attn)
        proj = block["attn"]["proj"]
        out = attn @ proj["kernel"] + proj["bias"]
        x = x + _layer_scale(out, block, "ls1")

        y2 = layer_norm(x, block["norm2"], eps)
        a_fc1 = amax(y2)
        mlp_p = block["mlp"]
        h = y2 @ mlp_p["fc1"]["kernel"] + mlp_p["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        a_fc2 = amax(h)
        out2 = h @ mlp_p["fc2"]["kernel"] + mlp_p["fc2"]["bias"]
        x = x + _layer_scale(out2, block, "ls2")
        block_amax.append((a_qkv, a_proj, a_fc1, a_fc2))

    if config.fc_norm_resolved:
        if config.global_pool == "avg":
            pooled = jnp.mean(x[:, 1:], axis=1, dtype=jnp.float32).astype(
                x.dtype
            )
        else:
            pooled = x[:, 0]
        cls_out = layer_norm(pooled, params["fc_norm"], eps)
    elif config.global_pool == "avg":
        y = layer_norm(x, params["norm"], eps)
        cls_out = jnp.mean(y[:, 1:], axis=1, dtype=jnp.float32).astype(
            x.dtype
        )
    else:
        cls_out = layer_norm(x[:, 0:1], params["norm"], eps)[:, 0]
    head_amax = amax(cls_out)
    logits = cls_out @ params["head"]["kernel"] + params["head"]["bias"]
    return block_amax, head_amax, logits


def calibrate_act_scales(
    params: Params,
    batches,
    config,
    schedule=None,
    margin: float = 1.0,
) -> ActScales:
    """Run calibration batches through the (unquantized) forward and return
    the static int8 activation scales for :func:`rajni_tpu.models.vit.
    vit_forward`'s ``act_scales`` argument.

    The dynamic per-row quantization needs no calibration but pays absmax
    reductions plus per-row scale multiplies inside every int8 kernel
    invocation; this is the standard PTQ alternative — measure activation
    ranges offline on representative data, then quantize with compile-time
    constants. Out-of-range rows at inference saturate at ±127, so choose
    ``batches`` representative of deployment data (and/or raise
    ``margin``). Accuracy-affecting: validate top-1 on your task exactly as
    with dynamic int8 (see :func:`quantize_params`).

    Args:
      params: UNQUANTIZED parameter pytree (calibrate first, then
        :func:`quantize_params`).
      batches: one ``[B, H, W, 3]`` array or an iterable of them.
      config/schedule: as for ``vit_forward`` — calibrate with the
        schedule you will serve with (token mixes differ).
      margin: multiplier on the observed absmax (headroom for data drift).
    """
    if is_quantized(params["blocks"][0]["mlp"]["fc1"]["kernel"]):
        raise ValueError(
            "calibrate on unquantized params (before quantize_params)"
        )
    if not config.kernel_path_supported:
        raise ValueError(
            "static activation scales feed the fused int8 kernels, which "
            "this config (registers / qk-norm) demotes to the XLA path — "
            "use dynamic int8 (quantize_params without calibration)"
        )
    if hasattr(batches, "ndim"):
        batches = [batches]
    run = jax.jit(
        lambda p, im: _calibration_forward(p, im, config, schedule)[:2]
    )
    block_amax = None
    head_amax = None
    for images in batches:
        b_amax, h_amax, = run(params, images)
        if block_amax is None:
            block_amax, head_amax = b_amax, h_amax
        else:
            block_amax = [
                tuple(jnp.maximum(a, b) for a, b in zip(row, prev))
                for row, prev in zip(b_amax, block_amax)
            ]
            head_amax = jnp.maximum(h_amax, head_amax)
    if block_amax is None:
        raise ValueError(
            "calibrate_act_scales received no batches (empty iterable, or "
            "an already-consumed generator)"
        )
    scale = lambda m: float(  # noqa: E731
        jnp.maximum(m, 1e-8) * (margin / 127.0)
    )
    return ActScales(
        blocks=tuple(tuple(scale(m) for m in row) for row in block_amax),
        head=scale(head_amax),
    )
