"""Prototype: scalar-prefetch DMA row-copy gather vs one-hot matmul gather.

Target: the N=577 pruned path where gathering K~0.95N rows of [N, 3C] QKV
via a [K, N] one-hot matmul costs ~6 K N C FLOPs/block (VERDICT r2 #4 —
the last unproven idea for the ViT-B/384 1.145x-vs-1.2x-ceiling gap).

Formulations measured on [B, N, 3C] -> [B, K, 3C] with sorted indices
(B=64, N=577, K=548, C=768):
  a) onehot  : standalone kernel doing the [K, N] @ [N, 3C] matmul
               (the production approach, here paying this harness's
               per-instance overhead).
  b) dmarow  : grid (B, K); the input BlockSpec's index_map reads the
               prefetched scalar index, so each grid step's DMA fetches
               exactly row idx[b, k] from HBM - zero FLOPs, pure DMA.
               Rows are viewed [18, 128] to satisfy Mosaic's
               last-two-dims tiling rule.

MEASURED (v5e via axon, 2026-08-17): onehot 63.7 ms, dmarow 72.4 ms —
the DMA formulation LOSES even against the overhead-laden standalone
matmul baseline. B*K = 35k grid steps of one 4.6 KB row-DMA each are
latency-bound (~2 us/step of grid+DMA-issue overhead vs ~7 us/image for
the whole one-hot matmul at MXU rate); non-contiguous rows forbid
batching steps. In production the one-hot matmul is additionally FUSED
into the pruned-block kernel (qkv never round-trips HBM), so the real
gap is larger still. CONCLUSION: per-row DMA gather is a measured
negative; the one-hot MXU gather stays. This closes the "cheaper gathers
via DMA row copies" idea from CLAUDE.md "Known future work" — at
K ~ 0.95N the gather tax is intrinsic.
"""
import sys
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from rajni_tpu.utils.timing import fence

B, N, C = 64, 577, 768
K = 548  # keep 0.95 -> 548 rows
threeC = 3 * C


def onehot_kernel(idx_ref, x_ref, o_ref):
    # build [K, N] one-hot from idx (SMEM scalars) via iota compare
    idx_col = idx_ref[...]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (K, N), 1)
    # gather idx values into a [K, N] compare: idx[k] == n
    # SMEM scalar loop would be slow; emulate with the [N,1] score-ish way:
    # load idx as a [K, 1] vmem value instead
    sel = (idx_col == n_iota).astype(x_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        sel, x_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def build_onehot():
    return jax.jit(pl.pallas_call(
        onehot_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((K, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, threeC), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, threeC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, threeC), jnp.bfloat16),
    ))


def copy_kernel(idx_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...]


def build_dmarow():
    # grid (B, K): input block = row idx[b*K + k] of image b, straight DMA.
    # Rows are viewed as [18, 128] so the (sublane, lane) block dims equal
    # the full array dims (Mosaic's last-two-dims tiling rule).
    S, L = 18, 128
    assert S * L == threeC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, S, L),
                         lambda b, k, idx: (b, idx[b, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, S, L),
                               lambda b, k, idx: (b, k, 0, 0)),
    )
    inner = pl.pallas_call(
        copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, S, L), jnp.bfloat16),
    )

    def run(idx, x):
        return inner(idx, x.reshape(B, N, S, L)).reshape(B, K, threeC)

    return jax.jit(run)


def measure(fn, args, iters=20):
    fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, threeC)), jnp.bfloat16)
    idx = np.sort(
        rng.permuted(np.tile(np.arange(1, N), (B, 1)), axis=1)[:, :K - 1],
        axis=1,
    )
    idx = np.concatenate([np.zeros((B, 1), np.int32), idx + 0], axis=1)
    idx = idx.astype(np.int32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    ref = np.stack([np.asarray(x[b])[idx[b]] for b in range(B)])

    if which in ("all", "onehot"):
        # one-hot wants a [K, 1]-style vmem idx; pass as [K, N]-broadcastable
        # per-image idx differs; for the probe use ONE shared idx set
        f = build_onehot()
        try:
            out = f(jnp.asarray(idx[0][:, None]), x)
            err = float(np.abs(np.asarray(out[0], np.float32) -
                               ref[0].astype(np.float32)).max())
            t = measure(f, (jnp.asarray(idx[0][:, None]), x))
            print(f"onehot: {t:.3f} ms  err={err}")
        except Exception as e:
            print("onehot FAIL:", str(e)[:200])

    if which in ("all", "dmarow"):
        f = build_dmarow()
        try:
            out = f(jnp.asarray(idx), x)
            err = float(np.abs(np.asarray(out, np.float32) -
                               ref.astype(np.float32)).max())
            t = measure(f, (jnp.asarray(idx), x))
            print(f"dmarow: {t:.3f} ms  err={err}")
        except Exception as e:
            print("dmarow FAIL:", str(e)[:300])
