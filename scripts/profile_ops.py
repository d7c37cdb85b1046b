"""Isolated op timings at ViT-B/224 batch-256 shapes (dev tool).

Times each component of the forward on the real chip to direct kernel work.
Run:  python scripts/profile_ops.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rajni_tpu.kernels.attention import fused_sdpa
from rajni_tpu.models.vit import ViTConfig, layer_norm, mlp
from rajni_tpu.ops.attention import _sdpa
from rajni_tpu.ops.importance import compute_importance
from rajni_tpu.ops.pruning import gather_tokens, select_tokens
from rajni_tpu.utils.timing import fence

B, N, C, H = 256, 197, 768, 12
D = C // H
cfg = ViTConfig()
key = jax.random.key(0)
dt = jnp.bfloat16

x = jax.random.normal(key, (B, N, C), dt)
qkv_w = jax.random.normal(key, (C, 3 * C), dt) * 0.02
qkv_full = jax.random.normal(key, (B, N, 3 * C), dt)
mlp_p = {
    "fc1": {"kernel": jax.random.normal(key, (C, 4 * C), dt) * 0.02,
            "bias": jnp.zeros((4 * C,), dt)},
    "fc2": {"kernel": jax.random.normal(key, (4 * C, C), dt) * 0.02,
            "bias": jnp.zeros((C,), dt)},
}
ln_p = {"scale": jnp.ones((C,), dt), "bias": jnp.zeros((C,), dt)}
scores = jax.random.uniform(key, (B, N), jnp.float32)


def bench(name, fn, *args, iters=50):
    f = jax.jit(fn)
    fence(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    fence(out)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:34s} {ms:8.3f} ms")
    return ms


print(f"shapes: B={B} N={N} C={C} H={H} dtype={dt.__name__}")
bench("qkv matmul [B,N,C]@[C,3C]", lambda a, w: a @ w, x, qkv_w)
bench("sdpa XLA", functools.partial(_sdpa, num_heads=H, scale=D**-0.5), qkv_full)
bench("sdpa pallas", lambda q: fused_sdpa(q, H, D**-0.5), qkv_full)
bench("proj matmul [B,N,C]@[C,C]", lambda a, w: a @ w, x, qkv_w[:, :C])
bench("mlp (fc1+gelu+fc2)", lambda a: mlp(a, mlp_p), x)
bench("layer_norm", lambda a: layer_norm(a, ln_p, 1e-6), x)
bench("importance", lambda q: compute_importance(q, H), qkv_full)
bench("select_tokens (topk+sort)", lambda s: select_tokens(s, 167), scores)
idx = select_tokens(scores, 167)
bench("gather qkv [B,N,3C]->[B,168,3C]", gather_tokens, qkv_full, idx)
bench("gather x [B,N,C]->[B,168,C]", gather_tokens, x, idx)

# one full stock block for reference
def block(a):
    y = layer_norm(a, ln_p, 1e-6)
    qkv = y @ qkv_w
    o = fused_sdpa(qkv, H, D**-0.5)
    a = a + o @ qkv_w[:, :C]
    return a + mlp(layer_norm(a, ln_p, 1e-6), mlp_p)

bench("full stock block (pallas sdpa)", block, x)
