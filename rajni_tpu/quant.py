"""Int8 weight quantization for TPU inference (opt-in extension).

The v5e MXU runs int8×int8 at twice its bf16 rate, so the matmul-bound
majority of the forward (the MLP is ~2/3 of a block's FLOPs) can trade a
controlled amount of precision for throughput. This module implements the
standard dynamic-quantization recipe:

  * **Weights**: symmetric per-output-channel int8
    (``scale[j] = absmax(W[:, j]) / 127``), quantized once offline.
  * **Activations**: symmetric per-row (per-token) int8, computed on the fly
    inside the kernel from the tile it already holds — no calibration data
    needed, no HBM cost.
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
            a = {}
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
    return out
