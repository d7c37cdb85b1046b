"""Seeded geometry/schedule fuzz: the Pallas kernel ladder must agree with
the lax reference path everywhere, not just at the benchmarked geometries.

Each case draws a random (but seed-pinned, so CI-stable) ViT geometry and
pruning schedule — including the edge cases the reference semantics make
interesting (keep_ratio flooring to 1 token, near-1.0 ratios, update=False
chains, layer-scale, single-block depth) — and asserts logits parity
between ``impl="xla"`` and ``impl="pallas"`` plus the static token-count
trace. This is the breadth counterpart to the depth-wise oracle tests
(tests/test_golden_pruned.py pins xla against torch; this pins pallas
against xla across the routing ladder's branches).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import ViTConfig, init_params, model_stats, vit_forward
from rajni_tpu.utils.schedule import normalize_schedule


def _random_case(rng: np.random.Generator):
    heads = int(rng.choice([2, 4]))
    head_dim = int(rng.choice([8, 16]))
    depth = int(rng.integers(1, 5))
    patch = int(rng.choice([4, 8]))
    grid = int(rng.integers(2, 5))
    cfg = ViTConfig(
        img_size=patch * grid,
        patch_size=patch,
        embed_dim=heads * head_dim,
        depth=depth,
        num_heads=heads,
        num_classes=int(rng.integers(2, 9)),
        use_layer_scale=bool(rng.integers(0, 2)),
    )
    schedule = {}
    for i in range(depth):
        if rng.random() < 0.6:
            ratio = float(rng.choice([0.01, 0.3, 0.5, 0.8, 0.99]))
            schedule[i] = {
                "keep_ratio": ratio,
                "update": bool(rng.integers(0, 2)),
            }
    return cfg, schedule


@pytest.mark.parametrize("seed", range(8))
def test_pallas_matches_xla_random_geometry(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg, schedule = _random_case(rng)
    sched = normalize_schedule(schedule, cfg.depth)
    params = init_params(jax.random.key(seed), cfg, jnp.float32)
    batch = int(rng.integers(1, 4))
    imgs = jnp.asarray(
        rng.standard_normal((batch, cfg.img_size, cfg.img_size, 3)),
        jnp.float32,
    )

    fwd = jax.jit(vit_forward, static_argnums=(2, 3, 4))
    want = np.asarray(fwd(params, imgs, cfg, sched, "xla"))
    got = np.asarray(fwd(params, imgs, cfg, sched, "pallas"))
    assert np.isfinite(want).all(), (cfg, schedule)
    np.testing.assert_allclose(
        got, want, rtol=2e-4, atol=2e-4,
        err_msg=f"{cfg} schedule={schedule}",
    )

    counts = model_stats(cfg, sched)["token_counts"]
    assert len(counts) == cfg.depth
    # reference keep arithmetic: max(1, floor(r*(N-1))) + CLS
    n = cfg.num_tokens
    for i in range(cfg.depth):
        assert counts[i] == n
        if sched[i] is not None:
            n = max(1, int(sched[i].keep_ratio * (n - 1))) + 1


@pytest.mark.parametrize("seed", range(4))
def test_int8_path_random_geometry(seed):
    """Quantized routing across random geometries: finite logits, same
    token trace, and agreement with the fp32 path at int8-level tolerance
    (weight quantization error dominates)."""
    from rajni_tpu.quant import quantize_params

    rng = np.random.default_rng(2000 + seed)
    cfg, schedule = _random_case(rng)
    sched = normalize_schedule(schedule, cfg.depth)
    params = init_params(jax.random.key(seed), cfg, jnp.float32)
    qparams = quantize_params(params)
    imgs = jnp.asarray(
        rng.standard_normal((2, cfg.img_size, cfg.img_size, 3)),
        jnp.float32,
    )
    fwd = jax.jit(vit_forward, static_argnums=(2, 3, 4))
    ref = np.asarray(fwd(params, imgs, cfg, sched, "xla"))
    for impl in ("xla", "pallas"):
        got = np.asarray(fwd(qparams, imgs, cfg, sched, impl))
        assert np.isfinite(got).all(), (impl, cfg, schedule)
        scale = max(float(np.abs(ref).max()), 1e-3)
        assert float(np.abs(got - ref).max()) / scale < 0.12, (
            impl, cfg, schedule,
        )
