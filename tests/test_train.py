"""Training-step tests: gradients flow through the pruning schedule and the
optimizer loop actually learns (capability extension over the inference-only
reference — SURVEY.md §5)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import ViTConfig, init_params
from rajni_tpu.train import create_train_state, make_train_step
from rajni_tpu.utils.schedule import normalize_schedule

CFG = ViTConfig(
    img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
    num_classes=4,
)
SCHED = normalize_schedule({1: {"keep_ratio": 0.6}}, CFG.depth)


def _batch(rng, n=16):
    x = rng.standard_normal((n, 16, 16, 3)).astype(np.float32)
    y = (rng.integers(0, 4, n)).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_loss_decreases_through_pruned_forward(rng):
    params = init_params(jax.random.key(0), CFG)
    state, tx = create_train_state(params, learning_rate=3e-3)
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)

    _, first = step(state, x, y)
    for _ in range(30):
        state, metrics = step(state, x, y)
    assert float(metrics["loss"]) < float(first["loss"])
    assert int(state.step) == 30
    assert np.isfinite(float(metrics["loss"]))


def test_gradients_nonzero_for_all_blocks(rng):
    """Pruning drops tokens, not parameters: every block (including the
    pruned one) must receive gradient signal through the kept tokens."""
    from rajni_tpu.models.vit import vit_forward
    from rajni_tpu.train import cross_entropy

    params = init_params(jax.random.key(1), CFG)
    x, y = _batch(rng)

    def loss_fn(p):
        return cross_entropy(vit_forward(p, x, CFG, SCHED), y)

    grads = jax.grad(loss_fn)(params)
    for i, blk in enumerate(grads["blocks"]):
        g = np.abs(np.asarray(blk["attn"]["qkv"]["kernel"])).max()
        assert g > 0, f"block {i} got zero gradient"
    assert np.abs(np.asarray(grads["patch_embed"]["kernel"])).max() > 0


def test_train_step_deterministic(rng):
    params = init_params(jax.random.key(2), CFG)
    state, tx = create_train_state(params)
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)
    s1, m1 = step(state, x, y)
    s2, m2 = step(state, x, y)
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(
        np.asarray(s1.params["head"]["kernel"]),
        np.asarray(s2.params["head"]["kernel"]),
    )


def test_train_cli_synthetic(tmp_path, capsys):
    """End-to-end: train a tiny model through a schedule, save, reload."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    out = tmp_path / "ft.msgpack"
    state = main([
        "--synthetic", "--model", "vit_tiny_patch16_224",
        "--schedule", str(sched), "--steps", "3", "--batch_size", "2",
        "--output", str(out), "--log_every", "1",
    ])
    assert int(state.step) == 3
    assert "loss" in capsys.readouterr().out
    reloaded = load_params(str(out))
    assert len(reloaded["blocks"]) == 12
