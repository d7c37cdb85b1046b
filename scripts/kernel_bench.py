"""Per-kernel time budget on the real chip (dev tool).

Times each fused kernel at the headline bench shapes by chaining ``iters``
dependent invocations inside ONE jit (a 0-valued scalar from the previous
output is added to the next input, so XLA cannot CSE or reorder the chain,
and the ~1 ms/dispatch tunnel overhead amortizes away — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_bench.py
Env: KB_BATCH (256), KB_ITERS (30), KB_MODEL (vit_base_patch16_224),
     KB_N (197), KB_KEEP (186)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import get_config, init_params
from rajni_tpu.quant import quantize_params
from rajni_tpu.utils.timing import fence


def chain_time(fn, x, iters, label, per_img_divisor):
    """fn: x -> (out, feedback_scalar); returns ms per call."""

    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            out, fb = fn(x * (1.0 + 0.0 * acc).astype(x.dtype))
            return x, 0.0 * fb
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))

    fence(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fence(run(x))
        best = min(best, (time.time() - t0) / iters)
    ms = best * 1e3
    print(f"{label:42s} {ms:7.3f} ms  ({ms * 1e3 / per_img_divisor:6.2f} us/img)")
    return ms


def main():
    batch = int(os.environ.get("KB_BATCH", "256"))
    iters = int(os.environ.get("KB_ITERS", "30"))
    model = os.environ.get("KB_MODEL", "vit_base_patch16_224")
    N = int(os.environ.get("KB_N", "197"))
    keep = int(os.environ.get("KB_KEEP", "186"))

    cfg = get_config(model)
    C = cfg.embed_dim
    H = cfg.num_heads
    K = keep + 1
    params = init_params(jax.random.key(0), cfg, jnp.bfloat16)
    qparams = quantize_params(params)
    blk = params["blocks"][0]
    qblk = qparams["blocks"][0]

    x = jax.random.normal(jax.random.key(1), (batch, N, C), jnp.bfloat16)
    xk = jax.random.normal(jax.random.key(2), (batch, K, C), jnp.bfloat16)
    print(f"{model} B={batch} N={N} K={K} C={C}", file=sys.stderr)

    from rajni_tpu.kernels.block import (
        fused_attn_block,
        fused_attn_block_int8,
        fused_ln_qkv,
        fused_pruned_attn_block,
        fused_pruned_attn_block_int8,
    )
    from rajni_tpu.kernels.mlp import (
        fused_ln_mlp_residual,
        fused_ln_mlp_residual_int8,
    )

    def t(fn, inp, label):
        return chain_time(fn, inp, iters, label, batch)

    # NOTE: the chained fori_loop harness itself costs ~4.7 ms/iteration at
    # these carry shapes on the axon relay (measured 2026-08-16: a noop body
    # reports 4.71 ms; selection kernels 4.78-5.27 ms). Treat every number
    # below as (reported − noop): only DIFFERENCES are meaningful, absolute
    # per-kernel times are dominated by the harness floor.
    noop = t(lambda x: (x, jnp.float32(0)), x, "noop (loop overhead)")
    print(f"(subtract {noop:.3f} ms harness floor from every row below)",
          file=sys.stderr)

    t(lambda x: (lambda o: (o, o[:, 0, 0].astype(jnp.float32).mean()))(
        fused_attn_block(x, blk["norm1"], blk["attn"], None, H,
                         cfg.attn_scale)),
      x, "stock attn half bf16 (N)")

    t(lambda x: (lambda o: (o, o[:, 0, 0].astype(jnp.float32).mean()))(
        fused_attn_block_int8(x, blk["norm1"], qblk["attn"], None, H,
                              cfg.attn_scale)),
      x, "stock attn half int8 (N)")

    t(lambda x: (lambda o: (o, o[:, 0, 0].astype(jnp.float32).mean()))(
        fused_ln_mlp_residual(x, blk["norm2"], blk["mlp"], None)),
      x, "mlp half bf16 (N rows)")

    t(lambda x: (lambda o: (o, o[:, 0, 0].astype(jnp.float32).mean()))(
        fused_ln_mlp_residual(x, blk["norm2"], blk["mlp"], None)),
      xk, "mlp half bf16 (K rows)")

    t(lambda x: (lambda o: (o, o[:, 0, 0].astype(jnp.float32).mean()))(
        fused_ln_mlp_residual_int8(x, blk["norm2"], qblk["mlp"], None)),
      xk, "mlp half int8 (K rows)")

    t(lambda x: (lambda o: (o[0], o[0][:, 0, 0].astype(jnp.float32).mean()))(
        fused_pruned_attn_block(x, blk["norm1"], blk["attn"], None, None,
                                H, keep, cfg.attn_scale)),
      x, "pruned mega attn bf16 (N->K, scored)")

    t(lambda x: (lambda o: (o[0], o[0][:, 0, 0].astype(jnp.float32).mean()))(
        fused_pruned_attn_block_int8(x, blk["norm1"], qblk["attn"], None,
                                     None, H, keep, cfg.attn_scale)),
      x, "pruned mega attn int8 (N->K, scored)")

    t(lambda x: (lambda o: (o[0], o[0][:, 0, 0].astype(jnp.float32).mean()))(
        fused_ln_qkv(x, blk["norm1"], blk["attn"]["qkv"], H)),
      x, "ln+qkv(+score) bf16 (N)")

    from rajni_tpu.kernels.block import (
        fused_block_full_int8,
        fused_pruned_block_full_int8,
    )

    t(lambda x: (lambda o: (o, o[:, 0, 0].astype(jnp.float32).mean()))(
        fused_block_full_int8(x, qblk, H, cfg.attn_scale)),
      x, "FULL stock block int8 (N)")

    t(lambda x: (lambda o: (o[0], o[0][:, 0, 0].astype(jnp.float32).mean()))(
        fused_pruned_block_full_int8(x, qblk, None, H, keep,
                                     cfg.attn_scale)),
      x, "FULL pruned block int8 (N->K, scored)")


if __name__ == "__main__":
    main()
