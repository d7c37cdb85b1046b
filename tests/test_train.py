"""Training-step tests: gradients flow through the pruning schedule and the
optimizer loop actually learns (capability extension over the inference-only
reference — SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

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


def test_remat_matches_plain_step(rng):
    """--remat is a pure memory/time trade: per-block jax.checkpoint
    recomputes the same math, so the loss trajectory must track the
    un-rematerialized step to fp32 noise (pruned AND stock blocks both
    take the wrapped path). Blanket param allclose is deliberately NOT
    asserted — recomputation reorders fp, and Adam turns sub-1e-7
    gradient noise on near-zero-gradient leaves into lr-scale updates
    (same effect the multihost parity test documents); the strict
    gradient-level check is test_remat_grads_match_plain."""
    params = init_params(jax.random.key(7), CFG)
    x, y = _batch(rng)

    trajectories = []
    for remat in (False, True):
        state, tx = create_train_state(params, learning_rate=1e-3)
        step = jax.jit(make_train_step(CFG, SCHED, tx, remat=remat))
        losses = []
        for _ in range(3):
            state, metrics = step(state, x, y)
            losses.append(float(metrics["loss"]))
        trajectories.append(losses)
    np.testing.assert_allclose(
        trajectories[0], trajectories[1], rtol=1e-4, atol=1e-6
    )


def test_remat_grads_match_plain(rng):
    """Gradient-level parity (tighter than the optimizer-smoothed check
    above): jax.grad through the rematerialized forward equals the plain
    one for a schedule mixing pruned and stock blocks."""
    from rajni_tpu.models.vit import vit_forward
    from rajni_tpu.train import cross_entropy

    params = init_params(jax.random.key(8), CFG)
    x, y = _batch(rng)

    def loss(p, remat):
        return cross_entropy(
            vit_forward(p, x, CFG, SCHED, remat=remat), y
        )

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g_plain, g_remat,
    )


def test_grad_clip(rng):
    """--grad_clip semantics: a generous threshold is a no-op (update
    identical to the unclipped optimizer); a tiny threshold rescales the
    whole gradient tree to the target global norm before AdamW sees it."""
    import optax

    from rajni_tpu.train import TrainState, build_optimizer

    params = init_params(jax.random.key(9), CFG)
    x, y = _batch(rng)

    def one_step(grad_clip):
        tx = build_optimizer(1e-3, total_steps=10, grad_clip=grad_clip)
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(CFG, SCHED, tx))
        state, metrics = step(state, x, y)
        return state, metrics

    s_off, _ = one_step(0.0)
    s_loose, _ = one_step(1e9)  # never binds
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s_off.params, s_loose.params,
    )

    # a binding clip changes the update but still moves the params
    s_tight, m = one_step(1e-4)
    head_off = np.asarray(s_off.params["head"]["kernel"])
    head_tight = np.asarray(s_tight.params["head"]["kernel"])
    assert not np.array_equal(head_off, head_tight)
    assert not np.array_equal(
        head_tight, np.asarray(params["head"]["kernel"])
    )
    assert np.isfinite(float(m["loss"]))

    # the clip composes INSIDE MultiSteps: params only move on the K-th
    # micro-step, and the clipped mean-gradient update is finite
    tx = build_optimizer(1e-3, total_steps=10, grad_accum=2, grad_clip=1.0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    mid, _ = step(state, x, y)
    np.testing.assert_array_equal(
        np.asarray(mid.params["head"]["kernel"]),
        np.asarray(params["head"]["kernel"]),
    )
    done, _ = step(mid, x, y)
    moved = np.asarray(done.params["head"]["kernel"])
    assert not np.array_equal(moved, np.asarray(params["head"]["kernel"]))
    assert np.isfinite(moved).all()


def test_ema_tracker_math(rng):
    """EMA semantics: ema_t = d·ema_{t-1} + (1−d)·params_t with ema_0 =
    the initial params, advanced once per parameter update. Verified by
    recomputing the recurrence from the observed param trajectory."""
    from rajni_tpu.train import TrainState, build_optimizer, get_ema_params

    d = 0.5
    params = init_params(jax.random.key(10), CFG)
    tx = build_optimizer(1e-3, total_steps=10, ema=d)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)

    expect = np.asarray(params["head"]["kernel"], np.float32)
    for _ in range(3):
        state, _ = step(state, x, y)
        p = np.asarray(state.params["head"]["kernel"], np.float32)
        expect = d * expect + (1 - d) * p
    ema = get_ema_params(state.opt_state)
    assert ema is not None
    np.testing.assert_allclose(
        np.asarray(ema["head"]["kernel"]), expect, rtol=1e-6, atol=1e-7
    )

    # without ema the extractor reports absence (the CLI's guard)
    tx0 = build_optimizer(1e-3, total_steps=10)
    assert get_ema_params(tx0.init(params)) is None

    # nested inside MultiSteps: found, and only advances on commit ticks
    txk = build_optimizer(1e-3, total_steps=10, grad_accum=2, ema=d)
    sk = TrainState(params, txk.init(params), jnp.zeros((), jnp.int32))
    stepk = jax.jit(make_train_step(CFG, SCHED, txk))
    sk, _ = stepk(sk, x, y)  # micro-step: no update, EMA frozen at init
    np.testing.assert_array_equal(
        np.asarray(get_ema_params(sk.opt_state)["head"]["kernel"]),
        np.asarray(params["head"]["kernel"]),
    )
    sk, _ = stepk(sk, x, y)  # commit tick: params move, EMA advances
    assert not np.array_equal(
        np.asarray(get_ema_params(sk.opt_state)["head"]["kernel"]),
        np.asarray(params["head"]["kernel"]),
    )


def test_ema_advances_in_bf16(rng):
    """Regression: the EMA accumulator must be fp32 even when the params
    are bfloat16. With decay=0.9999 the per-update increment is below half
    a bf16 ulp of the accumulator, so a bf16-stored EMA rounds every
    update away and silently freezes at the initial params — the bug this
    pins. Also checks the ``like=`` cast-back used by eval/checkpointing."""
    from rajni_tpu.train import TrainState, build_optimizer, get_ema_params

    d = 0.9999
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), init_params(jax.random.key(11), CFG)
    )
    tx = build_optimizer(1e-2, total_steps=10, ema=d)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)
    x = x.astype(jnp.bfloat16)
    for _ in range(3):
        state, _ = step(state, x, y)

    ema = get_ema_params(state.opt_state)
    assert ema["head"]["kernel"].dtype == jnp.float32
    # params moved, and the fp32 accumulator recorded the motion: the EMA
    # is no longer bit-equal to the initial params (a bf16 accumulator
    # keeps it frozen exactly)
    p0 = np.asarray(params["head"]["kernel"], np.float32)
    assert not np.array_equal(
        np.asarray(state.params["head"]["kernel"], np.float32), p0
    )
    assert not np.array_equal(np.asarray(ema["head"]["kernel"]), p0)

    # like= casts back to the live param dtypes for eval/checkpointing
    cast = get_ema_params(state.opt_state, like=state.params)
    assert cast["head"]["kernel"].dtype == jnp.bfloat16


def test_layer_decay(rng):
    """LLRD semantics: post-AdamW scaling means the step-1 update of each
    leaf is EXACTLY factor × the unscaled update (the moment estimates
    feed from the same raw gradient). Head trains at full LR (bit-equal
    to the plain run); block i at d^(depth−i); embeddings at d^(depth+1)."""
    from rajni_tpu.train import (
        TrainState,
        build_optimizer,
        layer_decay_factors,
    )

    d = 0.5
    params = init_params(jax.random.key(13), CFG)
    depth = len(params["blocks"])
    x, y = _batch(rng)

    factors = layer_decay_factors(params, d)
    assert factors["head"]["kernel"] == 1.0
    assert factors["patch_embed"]["kernel"] == d ** (depth + 1)
    assert factors["blocks"][0]["attn"]["qkv"]["kernel"] == d ** depth
    assert factors["blocks"][depth - 1]["norm1"]["scale"] == d

    def one_step(layer_decay):
        tx = build_optimizer(1e-3, total_steps=10, layer_decay=layer_decay,
                             params=params)
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(CFG, SCHED, tx))
        state, _ = step(state, x, y)
        return state.params

    plain = one_step(0.0)
    lld = one_step(d)

    np.testing.assert_array_equal(
        np.asarray(lld["head"]["kernel"]), np.asarray(plain["head"]["kernel"])
    )
    for leaf in ("patch_embed",):
        old = np.asarray(params[leaf]["kernel"], np.float64)
        du_plain = np.asarray(plain[leaf]["kernel"], np.float64) - old
        du_lld = np.asarray(lld[leaf]["kernel"], np.float64) - old
        np.testing.assert_allclose(
            du_lld, d ** (depth + 1) * du_plain, rtol=1e-4, atol=1e-12
        )
    old = np.asarray(params["blocks"][0]["mlp"]["fc1"]["kernel"], np.float64)
    du_plain = (
        np.asarray(plain["blocks"][0]["mlp"]["fc1"]["kernel"], np.float64)
        - old
    )
    du_lld = (
        np.asarray(lld["blocks"][0]["mlp"]["fc1"]["kernel"], np.float64) - old
    )
    np.testing.assert_allclose(
        du_lld, d ** depth * du_plain, rtol=1e-4, atol=1e-12
    )


def test_train_cli_ema(tmp_path):
    """--ema end-to-end: <output>.ema is written, loads as a canonical
    checkpoint, differs from the raw final params, and --resume continues
    the EMA trajectory exactly (it lives in the saved optimizer state)."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "4",
            "--log_every", "1", "--lr", "1e-3", "--ema", "0.9"]

    out = tmp_path / "ft.msgpack"
    main(base + ["--steps", "2", "--output", str(out)])
    raw = load_params(str(out))
    ema = load_params(str(out) + ".ema")
    assert len(ema["blocks"]) == len(raw["blocks"])
    a = np.asarray(raw["head"]["kernel"])
    b = np.asarray(ema["head"]["kernel"])
    assert np.isfinite(b).all() and not np.array_equal(a, b)

    # interrupted-and-resumed run reproduces the same EMA bit-exactly
    out2 = tmp_path / "ft2.msgpack"
    st = tmp_path / "ft2.state"
    main(base + ["--steps", "1", "--output", str(out2),
                 "--save_state_every", "1", "--state_path", str(st)])
    main(base + ["--steps", "2", "--output", str(out2),
                 "--resume", str(st)])
    ema2 = load_params(str(out2) + ".ema")
    np.testing.assert_array_equal(
        b, np.asarray(ema2["head"]["kernel"])
    )


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


def test_train_cli_pipeline_parallel(tmp_path, capsys):
    """--pipeline_parallel (+ --tensor_parallel) on the train CLI: GPipe
    training over the 8-device CPU mesh; the saved checkpoint comes back
    in the canonical (unstacked, packed-QKV) layout and loads into the
    plain eval forward."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rajni_tpu.models.vit import get_config, vit_forward
    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))

    out = tmp_path / "pp.msgpack"
    state = main([
        "--synthetic", "--model", "vit_tiny_patch16_224",
        "--schedule", str(sched), "--steps", "2", "--batch_size", "16",
        "--output", str(out), "--log_every", "1",
        "--pipeline_parallel", "2",
    ])
    assert int(state.step) == 2
    assert "Pipeline training" in capsys.readouterr().out
    p = load_params(str(out))
    assert len(p["blocks"]) == 12
    assert p["blocks"][0]["attn"]["qkv"]["kernel"].ndim == 2  # canonical
    cfg = get_config("vit_tiny_patch16_224")
    logits = vit_forward(
        p, jnp.zeros((1, 224, 224, 3), jnp.float32), cfg, None
    )
    assert np.isfinite(np.asarray(logits)).all()

    # 3-D: TP inside each stage; saved checkpoint un-repacks the QKV
    out3 = tmp_path / "pp_tp.msgpack"
    main([
        "--synthetic", "--model", "vit_small_patch16_224",
        "--schedule", str(sched), "--steps", "1", "--batch_size", "8",
        "--output", str(out3), "--log_every", "1",
        "--pipeline_parallel", "2", "--tensor_parallel", "2",
        "--microbatch", "4",
    ])
    p3 = load_params(str(out3))
    assert p3["blocks"][0]["attn"]["qkv"]["kernel"].ndim == 2
    assert p3["blocks"][0]["attn"]["qkv"]["bias"].ndim == 1


def test_train_cli_pipeline_flag_validation(tmp_path):
    import json as _json

    import pytest

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_224",
            "--schedule", str(sched), "--steps", "1"]
    with pytest.raises(ValueError, match="not supported"):
        main(base + ["--distributed", "--pipeline_parallel", "2"])
    with pytest.raises(ValueError, match="ICI"):
        main(base + ["--tensor_parallel", "2", "--distributed"])
    with pytest.raises(ValueError, match="multiple of"):
        main(base + ["--pipeline_parallel", "2", "--batch_size", "6"])


def test_save_load_train_state_roundtrip(tmp_path, rng):
    """Full-state persistence: the optimizer moments survive, so a restored
    state continues the EXACT trajectory of the live one (capability
    extension — the reference persists nothing, SURVEY.md §5)."""
    from rajni_tpu.train import load_train_state, save_train_state

    params = init_params(jax.random.key(3), CFG)
    state, tx = create_train_state(params, learning_rate=3e-3)
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)
    for _ in range(2):
        state, _ = step(state, x, y)

    path = tmp_path / "t.state"
    save_train_state(str(path), state)

    # template with DIFFERENT values (seed 9) — restore must overwrite all
    template, _ = create_train_state(
        init_params(jax.random.key(9), CFG), learning_rate=3e-3
    )
    restored = load_train_state(str(path), template)
    assert int(restored.step) == 2

    s_live, m_live = step(state, x, y)
    s_rest, m_rest = step(restored, x, y)
    assert float(m_live["loss"]) == float(m_rest["loss"])
    np.testing.assert_array_equal(
        np.asarray(s_live.params["head"]["kernel"]),
        np.asarray(s_rest.params["head"]["kernel"]),
    )
    # Adam moments came back too (not re-zeroed)
    mu = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in mu
               if hasattr(leaf, "shape") and np.ndim(leaf) > 0)


def test_load_train_state_shape_mismatch(tmp_path):
    """Resuming with different model flags must fail loudly, not reshape."""
    import pytest

    from rajni_tpu.train import load_train_state, save_train_state

    state, _ = create_train_state(init_params(jax.random.key(0), CFG))
    path = tmp_path / "t.state"
    save_train_state(str(path), state)

    other_cfg = ViTConfig(
        img_size=16, patch_size=8, embed_dim=48, depth=2, num_heads=4,
        num_classes=4,
    )
    template, _ = create_train_state(
        init_params(jax.random.key(0), other_cfg)
    )
    with pytest.raises(ValueError, match="does not match the template"):
        load_train_state(str(path), template)


def test_train_cli_resume(tmp_path):
    """An interrupted run resumed from its saved state reproduces the
    uninterrupted run exactly (same synthetic batch, same optimizer
    trajectory — Adam moments included)."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "2",
            "--log_every", "1"]

    # uninterrupted: 3 steps
    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "3", "--output", str(out_a)])

    # interrupted at step 1, resumed to 3
    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "1", "--output", str(out_b),
                 "--save_state_every", "1", "--state_path", str(st)])
    assert st.exists() and not (tmp_path / "b.state.tmp").exists()
    state = main(base + ["--steps", "3", "--output", str(out_b),
                         "--resume", str(st)])
    assert int(state.step) == 3

    a = load_params(str(out_a))
    b = load_params(str(out_b))
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_cli_resume_pipeline(tmp_path):
    """Resume restores onto a pipeline-stacked, pipe-sharded template: the
    saved host tree device_puts back through the template's shardings."""
    import json as _json

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "16",
            "--log_every", "1", "--pipeline_parallel", "2",
            "--output", str(tmp_path / "pp.msgpack")]

    st = tmp_path / "pp.state"
    main(base + ["--steps", "1", "--save_state_every", "1",
                 "--state_path", str(st)])
    state = main(base + ["--steps", "2", "--resume", str(st)])
    assert int(jax.device_get(state.step)) == 2


def test_cosine_schedule_resume_mid_schedule(tmp_path, rng):
    """The LR-schedule step lives in the optimizer state, so a resumed run
    continues the cosine decay exactly where it left off."""
    from rajni_tpu.train import (
        TrainState, build_optimizer, load_train_state, save_train_state,
    )

    params = init_params(jax.random.key(4), CFG)
    tx = build_optimizer(3e-3, total_steps=6, lr_schedule="cosine",
                         warmup_steps=2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)

    # uninterrupted: 4 steps
    live = state
    for _ in range(4):
        live, _ = step(live, x, y)

    # interrupted at 2, saved, restored, continued to 4
    half = state
    for _ in range(2):
        half, _ = step(half, x, y)
    path = tmp_path / "c.state"
    save_train_state(str(path), half)
    template = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    resumed = load_train_state(str(path), template)
    for _ in range(2):
        resumed, _ = step(resumed, x, y)

    np.testing.assert_array_equal(
        np.asarray(live.params["head"]["kernel"]),
        np.asarray(resumed.params["head"]["kernel"]),
    )


def test_grad_accum_matches_single_step(rng):
    """K identical micro-batches under --grad_accum K produce exactly one
    optimizer update equal to the plain single step (mean of K identical
    gradients is the gradient); params must not move mid-accumulation."""
    from rajni_tpu.train import TrainState, build_optimizer

    params = init_params(jax.random.key(5), CFG)
    x, y = _batch(rng)

    tx_plain = build_optimizer(1e-3, total_steps=4)
    s_plain = TrainState(params, tx_plain.init(params),
                         jnp.zeros((), jnp.int32))
    step_plain = jax.jit(make_train_step(CFG, SCHED, tx_plain))
    s_plain, _ = step_plain(s_plain, x, y)

    tx_acc = build_optimizer(1e-3, total_steps=4, grad_accum=2)
    s_acc = TrainState(params, tx_acc.init(params), jnp.zeros((), jnp.int32))
    step_acc = jax.jit(make_train_step(CFG, SCHED, tx_acc))

    s_mid, _ = step_acc(s_acc, x, y)
    np.testing.assert_array_equal(  # update deferred: params unchanged
        np.asarray(s_mid.params["head"]["kernel"]),
        np.asarray(params["head"]["kernel"]),
    )
    s_done, _ = step_acc(s_mid, x, y)
    np.testing.assert_allclose(
        np.asarray(s_done.params["head"]["kernel"]),
        np.asarray(s_plain.params["head"]["kernel"]),
        rtol=0, atol=1e-7,
    )


def test_train_cli_lr_schedule_flags(tmp_path):
    """CLI smoke: cosine + warmup + grad_accum train end-to-end."""
    import json as _json

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    state = main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--schedule", str(sched), "--steps", "4", "--batch_size", "2",
        "--output", str(tmp_path / "ft.msgpack"), "--log_every", "2",
        "--lr_schedule", "cosine", "--warmup_steps", "1",
        "--grad_accum", "2",
    ])
    assert int(state.step) == 4


def test_train_cli_eval_during_training(tmp_path, capsys):
    """--eval_data/--eval_every: periodic top-1 validation (ragged final
    batch padded to one static shape) and best-checkpoint tracking."""
    import json as _json

    from PIL import Image

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "val"
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 256, (240, 240, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))

    out = tmp_path / "ft.msgpack"
    main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--schedule", str(sched), "--steps", "2", "--batch_size", "2",
        "--output", str(out), "--log_every", "1",
        "--eval_data", str(data), "--eval_every", "2",
        "--eval_batch_size", "3",  # 4 images -> batches of 3 + 1 (pad path)
    ])
    printed = capsys.readouterr().out
    assert "val_top1" in printed
    best = tmp_path / "ft.msgpack.best"
    assert best.exists()
    assert len(load_params(str(best))["blocks"]) == 12

    # with --ema the EMA weights are scored alongside the raw ones and
    # .best may come from either tree
    out2 = tmp_path / "ft_ema.msgpack"
    main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--schedule", str(sched), "--steps", "2", "--batch_size", "2",
        "--output", str(out2), "--log_every", "1", "--ema", "0.9",
        "--eval_data", str(data), "--eval_every", "2",
    ])
    printed = capsys.readouterr().out
    assert "val_top1 (ema)" in printed
    assert (tmp_path / "ft_ema.msgpack.best").exists()


def test_train_cli_eval_during_tp_training(tmp_path, capsys):
    """--eval_data under --tensor_parallel (VERDICT r3 #6): the eval
    canonicalizes the head-aligned QKV repack per checkpoint, scores the
    same top-1 as an identically-seeded single-device run, and .best is
    saved in the canonical layout."""
    import json as _json
    import re

    from PIL import Image

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "val"
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))

    accs = {}
    for mode, extra in (("plain", []), ("tp", ["--tensor_parallel", "2"])):
        out = tmp_path / f"{mode}.msgpack"
        main([
            "--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--steps", "2", "--batch_size", "8",
            "--seed", "0", "--output", str(out), "--log_every", "1",
            "--eval_data", str(data), "--eval_every", "1",
        ] + extra)
        printed = capsys.readouterr().out
        accs[mode] = re.findall(r"val_top1 ([\d.]+)%", printed)
        assert accs[mode], printed
        best = load_params(str(tmp_path / f"{mode}.msgpack.best"))
        assert best["blocks"][0]["attn"]["qkv"]["kernel"].ndim == 2
    # same data, same seed: TP tracks single-device to psum tolerance,
    # and on a 4-image val set the top-1 decisions are identical
    assert accs["tp"] == accs["plain"], accs


def test_train_cli_eval_flag_validation(tmp_path):
    import json as _json

    import pytest

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_224",
            "--schedule", str(sched), "--steps", "1"]
    with pytest.raises(ValueError, match="requires --eval_data"):
        main(base + ["--eval_every", "5"])
    with pytest.raises(ValueError, match="single-controller"):
        main(base + ["--eval_data", str(tmp_path), "--distributed"])
    with pytest.raises(ValueError, match="single-controller"):
        main(base + ["--eval_data", str(tmp_path),
                     "--pipeline_parallel", "2", "--batch_size", "8"])


def test_schedule_ticks_grad_accum_conversion():
    """LR-schedule horizons are micro-step-denominated flags but MultiSteps
    advances the inner schedule once per K micro-steps — the conversion must
    land the cosine's end exactly at the last real update."""
    from rajni_tpu.train import _schedule_ticks

    assert _schedule_ticks(1000, 200, 1) == (1000, 200)
    assert _schedule_ticks(1000, 200, 4) == (250, 50)
    assert _schedule_ticks(10, 0, 4) == (2, 0)
    assert _schedule_ticks(3, 2, 4) == (1, 1)  # floors keep a ramp


def test_cosine_grad_accum_decays_to_zero():
    """With --grad_accum, the cosine must still reach ~0 LR by the last
    update (the bug this pins: micro-step horizons fed to an update-tick
    schedule left the LR at ~0.9·peak)."""
    import optax

    from rajni_tpu.train import build_optimizer

    peak = 3e-3
    tx = build_optimizer(peak, total_steps=40, lr_schedule="cosine",
                         warmup_steps=8, grad_accum=4)
    # MultiSteps commits the inner (chained) state once per 4 micro-steps:
    # 40 micro-steps = 10 updates. Inspect the schedule via the inner
    # optimizer's injected hyperparams by stepping a scalar problem.
    params = {"w": jnp.ones(())}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(())}
    moved = []
    for _ in range(40):
        updates, opt_state = tx.update(grads, opt_state, params)
        moved.append(abs(float(updates["w"])))
        params = optax.apply_updates(params, updates)
    # the final committed update must be ~LR 0 (cosine fully decayed):
    # compare the last real update's magnitude to the mid-schedule one
    real = [m for m in moved if m > 0]
    assert real, "no updates committed"
    assert real[-1] < 0.05 * max(real), (
        f"cosine did not decay: last real update {real[-1]:.2e} vs "
        f"max {max(real):.2e}"
    )


def test_train_cli_resume_real_data_exact(tmp_path):
    """Resume on a REAL dataset reproduces the uninterrupted run exactly:
    the optimizer state restores and the data stream fast-forwards to the
    interruption point (decode-only)."""
    import json as _json

    from PIL import Image

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "train"
    rng = np.random.default_rng(1)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    # 6 images, batch 2 -> 3 full batches/pass; 4 steps wraps the epoch
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "2", "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "4", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "2", "--output", str(out_b),
                 "--save_state_every", "2", "--state_path", str(st)])
    main(base + ["--steps", "4", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_cli_resume_seeds_best_from_disk(tmp_path, capsys):
    """A resumed run must not clobber a pre-interruption .best with worse
    params: the existing .best is re-scored to seed the bar."""
    import json as _json

    from PIL import Image

    from rajni_tpu.train import main

    data = tmp_path / "val"
    rng = np.random.default_rng(2)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(d / "0.png")
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    out = tmp_path / "ft.msgpack"
    st = tmp_path / "ft.state"
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "2", "--log_every", "1",
            "--output", str(out), "--eval_data", str(data),
            "--eval_batch_size", "2"]

    main(base + ["--steps", "1", "--save_state_every", "1",
                 "--state_path", str(st)])
    assert (tmp_path / "ft.msgpack.best").exists()
    main(base + ["--steps", "2", "--resume", str(st)])
    assert "seeded best val_top1" in capsys.readouterr().out


def test_train_cli_tensor_parallel(tmp_path, capsys):
    """TP-only training on the CLI: (data, model) mesh over the 8-device
    CPU mesh; the loss trajectory matches the plain single-jit run
    (tolerance — psum reduction order) and the saved checkpoint comes back
    canonical (un-repacked QKV) and loads into the plain eval forward."""
    import json as _json
    import re

    from rajni_tpu.models.vit import get_config, vit_forward
    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    # deit_small: 6 heads / 1536 hidden — model=2 divides both
    base = ["--synthetic", "--model", "deit_small_patch16_64",
            "--schedule", str(sched), "--steps", "2", "--batch_size", "8",
            "--log_every", "1", "--lr", "1e-3"]

    def losses(text):
        return [float(m) for m in re.findall(r"loss (\d+\.\d+)", text)]

    out_plain = tmp_path / "plain.msgpack"
    main(base + ["--output", str(out_plain)])
    plain = losses(capsys.readouterr().out)

    out_tp = tmp_path / "tp.msgpack"
    state = main(base + ["--output", str(out_tp), "--tensor_parallel", "2"])
    printed = capsys.readouterr().out
    assert "TP training" in printed
    tp = losses(printed)
    assert int(state.step) == 2

    assert len(plain) == len(tp) == 2
    for a, b in zip(plain, tp):
        assert abs(a - b) < 5e-3 * max(1.0, abs(a)), (plain, tp)

    p = load_params(str(out_tp))
    assert p["blocks"][0]["attn"]["qkv"]["kernel"].ndim == 2  # canonical
    cfg = get_config("deit_small_patch16_64")
    logits = vit_forward(
        p, jnp.zeros((1, 64, 64, 3), jnp.float32), cfg, None
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_train_cli_data_parallel(tmp_path, capsys):
    """--data_parallel (plain single-host DP): batch sharded over all 8
    CPU-mesh devices, params replicated, gradients all-reduced by XLA.
    The loss trajectory matches the plain single-jit run (tolerance —
    the sharded mean reduces in a different order) and the checkpoint is
    canonical; also composes with --remat. Redundant parallel-flag
    combinations are rejected."""
    import json as _json
    import re

    import pytest

    from rajni_tpu.models.vit import get_config, vit_forward
    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--steps", "2", "--batch_size", "8",
            "--log_every", "1", "--lr", "1e-3"]

    def losses(text):
        return [float(m) for m in re.findall(r"loss (\d+\.\d+)", text)]

    out_plain = tmp_path / "plain.msgpack"
    main(base + ["--output", str(out_plain)])
    plain = losses(capsys.readouterr().out)

    out_dp = tmp_path / "dp.msgpack"
    state = main(base + ["--output", str(out_dp), "--data_parallel",
                         "--remat"])
    printed = capsys.readouterr().out
    assert "DP training: batch sharded over 8 devices" in printed
    dp = losses(printed)
    assert int(state.step) == 2

    assert len(plain) == len(dp) == 2
    for a, b in zip(plain, dp):
        assert abs(a - b) < 5e-3 * max(1.0, abs(a)), (plain, dp)

    p = load_params(str(out_dp))
    assert p["blocks"][0]["attn"]["qkv"]["kernel"].ndim == 2  # canonical
    cfg = get_config("vit_tiny_patch16_64")
    logits = vit_forward(
        p, jnp.zeros((1, 64, 64, 3), jnp.float32), cfg, None
    )
    assert np.isfinite(np.asarray(logits)).all()

    for extra in (["--tensor_parallel", "2"],
                  ["--pipeline_parallel", "2"],
                  ["--distributed"]):
        with pytest.raises(ValueError, match="redundant"):
            main(base + ["--data_parallel"] + extra)


def test_train_cli_tensor_parallel_resume(tmp_path):
    """Resume restores onto the TP-sharded template (committed NamedSharding
    leaves place back onto the (data, model) mesh)."""
    import json as _json

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "deit_small_patch16_64",
            "--schedule", str(sched), "--batch_size", "8",
            "--log_every", "1", "--tensor_parallel", "2",
            "--output", str(tmp_path / "tp.msgpack")]

    st = tmp_path / "tp.state"
    main(base + ["--steps", "1", "--save_state_every", "1",
                 "--state_path", str(st)])
    state = main(base + ["--steps", "2", "--resume", str(st)])
    assert int(jax.device_get(state.step)) == 2


def test_save_load_train_state_orbax(tmp_path, rng):
    """Orbax backend: per-array streaming directory checkpoint; restore
    continues the exact trajectory like the msgpack path."""
    from rajni_tpu.train import load_train_state, save_train_state

    params = init_params(jax.random.key(11), CFG)
    state, tx = create_train_state(params, learning_rate=3e-3)
    step = jax.jit(make_train_step(CFG, SCHED, tx))
    x, y = _batch(rng)
    for _ in range(2):
        state, _ = step(state, x, y)

    path = tmp_path / "orbax_state"
    save_train_state(str(path), state, backend="orbax")
    assert path.is_dir()

    template, _ = create_train_state(
        init_params(jax.random.key(12), CFG), learning_rate=3e-3
    )
    restored = load_train_state(str(path), template)  # auto-detects orbax
    assert int(jax.device_get(restored.step)) == 2
    s_live, m_live = step(state, x, y)
    s_rest, m_rest = step(restored, x, y)
    assert float(m_live["loss"]) == float(m_rest["loss"])
    np.testing.assert_array_equal(
        np.asarray(s_live.params["head"]["kernel"]),
        np.asarray(s_rest.params["head"]["kernel"]),
    )


def test_train_cli_resume_orbax_pipeline(tmp_path):
    """--state_backend orbax under pipeline training: the sharded stacked
    state streams per-array, and resume places leaves by the pipe-mesh
    template (committed) while the step counter stays uncommitted."""
    import json as _json

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "16",
            "--log_every", "1", "--pipeline_parallel", "2",
            "--output", str(tmp_path / "pp.msgpack")]

    st = tmp_path / "pp_state_orbax"
    main(base + ["--steps", "1", "--save_state_every", "1",
                 "--state_path", str(st), "--state_backend", "orbax"])
    assert st.is_dir()
    state = main(base + ["--steps", "2", "--resume", str(st)])
    assert int(jax.device_get(state.step)) == 2


def test_train_cli_orbax_distributed_rejected(tmp_path):
    import json as _json

    import pytest

    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    with pytest.raises(ValueError, match="orbax is single-controller"):
        main(["--synthetic", "--model", "vit_tiny_patch16_64",
              "--schedule", str(sched), "--steps", "1",
              "--distributed", "--state_backend", "orbax"])

def _write_image_folder(root, rng, classes=("a", "b"), per_class=3,
                        size=80):
    from PIL import Image

    for cls in classes:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")


def test_train_cli_shuffle_changes_the_stream(tmp_path):
    """--shuffle must actually reorder the data: same seed, same steps,
    shuffled vs unshuffled runs land on different params (the ImageFolder
    is class-sorted, so unshuffled batches are class-homogeneous)."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "train"
    _write_image_folder(data, np.random.default_rng(2))
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "2", "--steps", "3",
            "--log_every", "1", "--seed", "0"]

    out_plain = tmp_path / "plain.msgpack"
    main(base + ["--output", str(out_plain)])
    out_shuf = tmp_path / "shuf.msgpack"
    main(base + ["--output", str(out_shuf), "--shuffle"])

    la = jax.tree_util.tree_leaves(load_params(str(out_plain)))
    lb = jax.tree_util.tree_leaves(load_params(str(out_shuf)))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(la, lb)
    ), "--shuffle did not change the training stream"


def test_train_cli_resume_shuffle_exact(tmp_path):
    """--resume under --shuffle reproduces the uninterrupted run exactly,
    including across a PASS boundary: the per-pass permutation is keyed on
    (seed, pass index), and the fast-forward restarts at the interrupted
    pass (start_pass = step // batches_per_pass)."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    data = tmp_path / "train"
    _write_image_folder(data, np.random.default_rng(3))
    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    # 6 images, batch 2 -> 3 full batches/pass; interrupt at step 4 so the
    # resume restarts INSIDE pass 1 (start_pass=1, skip=1)
    base = ["--model", "vit_tiny_patch16_64", "--data_path", str(data),
            "--schedule", str(sched), "--batch_size", "2",
            "--log_every", "1", "--seed", "0", "--shuffle"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "6", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "4", "--output", str(out_b),
                 "--save_state_every", "4", "--state_path", str(st)])
    main(base + ["--steps", "6", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_mixup_step_matches_manual(rng):
    """The mixup train step's loss equals the hand-computed
    ``lam·CE(y) + (1−lam)·CE(flip(y))`` on the lam that ``mixup_lam``
    derives from (seed, step) — and two identical states take the
    identical step (lam is a pure function of the state)."""
    from rajni_tpu.models.vit import vit_forward
    from rajni_tpu.train import cross_entropy, mixup_lam

    params = init_params(jax.random.key(0), CFG)
    state, tx = create_train_state(params, learning_rate=1e-3)
    step = jax.jit(make_train_step(CFG, SCHED, tx, mixup_alpha=0.2, seed=5))
    x, y = _batch(rng)

    s1, m1 = step(state, x, y)
    lam = mixup_lam(5, jnp.int32(0), 0.2)
    assert 0.0 < float(lam) < 1.0
    mixed = lam.astype(x.dtype) * x + (1.0 - lam.astype(x.dtype)) * x[::-1]
    logits = vit_forward(params, mixed, CFG, SCHED)
    want = float(
        lam * cross_entropy(logits, y)
        + (1.0 - lam) * cross_entropy(logits, y[::-1])
    )
    assert abs(float(m1["loss"]) - want) < 1e-5

    state2, _ = create_train_state(params, learning_rate=1e-3)
    s2, m2 = step(state2, x, y)
    assert float(m1["loss"]) == float(m2["loss"])
    for la, lb in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # the next step draws a DIFFERENT lam (keyed on state.step)
    lam1 = mixup_lam(5, jnp.int32(1), 0.2)
    assert float(lam1) != float(lam)


def test_train_cli_mixup_resume(tmp_path):
    """--mixup composes with crash-safe resume: lam is a pure function of
    (seed, step), so the resumed trajectory is bit-identical."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "4",
            "--mixup", "0.2", "--label_smoothing", "0.1",
            "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "3", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "1", "--output", str(out_b),
                 "--save_state_every", "1", "--state_path", str(st)])
    main(base + ["--steps", "3", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    from rajni_tpu.train import main as _m
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mixup"):
        _m(base + ["--steps", "1", "--mixup", "-1",
                   "--output", str(tmp_path / "x.msgpack")])


def test_cutmix_matches_timm_box_math():
    """cutmix_mask_and_lam reproduces timm's rand_bbox + correct_lam
    arithmetic exactly: given the key's (lam_raw, cy, cx) draws, the box
    is int(dim·sqrt(1−lam)) truncated, cy±cut//2 clipped to the image,
    and lam is the area-corrected 1 − box/(H·W). Re-derived in pure
    Python/NumPy from the same draws and compared bit-exactly."""
    from rajni_tpu.train import cutmix_mask_and_lam

    H = W = 32
    for seed in range(6):
        key = jax.random.key(seed)
        mask, lam = cutmix_mask_and_lam(key, H, W, 1.0)
        mask = np.asarray(mask)

        # the same draws the function makes, re-derived here
        k_lam, k_cy, k_cx = jax.random.split(key, 3)
        lam_raw = float(jax.random.beta(k_lam, 1.0, 1.0))
        cy = int(jax.random.randint(k_cy, (), 0, H))
        cx = int(jax.random.randint(k_cx, (), 0, W))
        # timm/data/mixup.py rand_bbox, margin=0
        ratio = np.sqrt(1.0 - lam_raw)
        cut_h, cut_w = int(H * ratio), int(W * ratio)
        yl = min(max(cy - cut_h // 2, 0), H)
        yh = min(max(cy + cut_h // 2, 0), H)
        xl = min(max(cx - cut_w // 2, 0), W)
        xh = min(max(cx + cut_w // 2, 0), W)
        want = np.zeros((H, W), bool)
        want[yl:yh, xl:xh] = True

        np.testing.assert_array_equal(mask, want)
        assert float(lam) == pytest.approx(
            1.0 - (yh - yl) * (xh - xl) / (H * W), abs=1e-7
        )


def test_cutmix_step_matches_manual(rng):
    """The CutMix train step's loss equals the hand-computed
    lam·CE(y) + (1−lam)·CE(flip(y)) on the box-pasted batch, with lam the
    area-corrected value from the (seed, step)-derived key."""
    from rajni_tpu.models.vit import vit_forward
    from rajni_tpu.train import (_CUTMIX_TAG, apply_batch_mix,
                                 cross_entropy, cutmix_mask_and_lam)

    params = init_params(jax.random.key(0), CFG)
    state, tx = create_train_state(params, learning_rate=1e-3)
    step = jax.jit(make_train_step(CFG, SCHED, tx, cutmix_alpha=1.0,
                                   seed=5))
    x, y = _batch(rng)
    _, m1 = step(state, x, y)

    k = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(5), _CUTMIX_TAG), jnp.int32(0)
    )
    mask, lam = cutmix_mask_and_lam(k, x.shape[1], x.shape[2], 1.0)
    assert 0.0 < float(lam) <= 1.0
    mixed = jnp.where(np.asarray(mask)[None, :, :, None], x[::-1], x)
    mix2, lam2 = apply_batch_mix(x, 5, jnp.int32(0), cutmix_alpha=1.0)
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(mix2))
    assert float(lam) == float(lam2)

    logits = vit_forward(params, mixed, CFG, SCHED)
    want = float(
        lam * cross_entropy(logits, y)
        + (1.0 - lam) * cross_entropy(logits, y[::-1])
    )
    assert abs(float(m1["loss"]) - want) < 1e-5


def test_mixup_cutmix_switch(rng):
    """With BOTH alphas the per-step switch picks CutMix at switch_prob:
    apply_batch_mix's output is bit-equal to exactly the construction the
    (seed, step)-derived uniform selects — and different steps can pick
    different modes (streams are domain-separated)."""
    from rajni_tpu.train import (_SWITCH_TAG, apply_batch_mix, mix_images,
                                 mixup_lam)

    x, _ = _batch(rng)
    picked = set()
    for step_i in range(8):
        s = jnp.int32(step_i)
        mixed, lam = apply_batch_mix(x, 5, s, mixup_alpha=0.2,
                                     cutmix_alpha=1.0, switch_prob=0.5)
        u = float(jax.random.uniform(jax.random.fold_in(
            jax.random.fold_in(jax.random.key(5), _SWITCH_TAG), s)))
        if u < 0.5:
            want, wlam = apply_batch_mix(x, 5, s, cutmix_alpha=1.0)
            picked.add("cutmix")
        else:
            wlam = mixup_lam(5, s, 0.2)
            want = mix_images(x, wlam)
            picked.add("mixup")
        np.testing.assert_array_equal(np.asarray(mixed), np.asarray(want))
        assert float(lam) == pytest.approx(float(wlam), abs=1e-7)
    assert picked == {"mixup", "cutmix"}  # 8 fair flips: P(miss) ~ 2^-7


def test_train_cli_cutmix_resume(tmp_path):
    """--cutmix (incl. alongside --mixup) composes with crash-safe resume:
    every mixing draw is a pure function of (seed, step), so the resumed
    trajectory is bit-identical. Also pins the negative-alpha guard."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "4",
            "--cutmix", "1.0", "--mixup", "0.2", "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "3", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "1", "--output", str(out_b),
                 "--save_state_every", "1", "--state_path", str(st)])
    main(base + ["--steps", "3", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cutmix"):
        main(base + ["--steps", "1", "--cutmix", "-1",
                     "--output", str(tmp_path / "x.msgpack")])
    with _pytest.raises(ValueError, match="switch_prob"):
        main(base + ["--steps", "1", "--mixup_switch_prob", "1.5",
                     "--output", str(tmp_path / "x.msgpack")])


# --------------------------------------------------------------------------
# Stochastic depth (--drop_path, timm DropPath semantics)
# --------------------------------------------------------------------------


def test_drop_path_rates_linspace():
    """timm builds dpr = linspace(0, rate, depth): block 0 never drops,
    the last block drops at the full rate."""
    from rajni_tpu.models.vit import drop_path_rates

    r = drop_path_rates(0.3, 4)
    np.testing.assert_allclose(r, [0.0, 0.1, 0.2, 0.3], atol=1e-12)
    # torch.linspace(0, rate, 1) == [0.0]: a depth-1 model never drops.
    assert drop_path_rates(0.3, 1) == (0.0,)


def test_stochastic_depth_mask_semantics():
    """Per-sample masks take exactly {0, 1/keep_prob}; the branch
    expectation is preserved (scale_by_keep=True, timm default)."""
    from rajni_tpu.models.vit import _stochastic_depth

    out = jnp.ones((4096, 3, 5), jnp.float32)
    rate = 0.25
    y = np.asarray(_stochastic_depth(out, jax.random.key(0), rate))
    per_sample = y[:, 0, 0]
    vals = np.unique(per_sample)
    np.testing.assert_allclose(
        vals, [0.0, 1.0 / (1.0 - rate)], rtol=1e-6
    )
    # whole samples drop together
    assert (y == per_sample[:, None, None]).all()
    # expectation ~ 1 (binomial std at n=4096, p=.25 is ~0.009)
    assert abs(per_sample.mean() - 1.0) < 0.05


def test_vit_forward_drop_path_zero_is_baseline(rng):
    """drop_path=0.0 takes the identical code path whether or not an rng
    key is supplied — eval numerics are untouched."""
    from rajni_tpu.models.vit import vit_forward

    params = init_params(jax.random.key(2), CFG)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    base = vit_forward(params, x, CFG, SCHED)
    with_key = vit_forward(
        params, x, CFG, SCHED, drop_path=0.0, rng=jax.random.key(7)
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_key))


def test_vit_forward_drop_path_validation(rng):
    from rajni_tpu.models.vit import vit_forward

    params = init_params(jax.random.key(2), CFG)
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="rng"):
        vit_forward(params, x, CFG, SCHED, drop_path=0.1)
    with pytest.raises(ValueError, match="XLA"):
        vit_forward(params, x, CFG, SCHED, impl="pallas",
                    drop_path=0.1, rng=jax.random.key(0))


def test_vit_forward_drop_path_deterministic_in_key(rng):
    """Same key -> identical output (resume-exactness at the forward
    level); different keys -> different drop decisions. Block 0's rate is
    0 by the linspace schedule, so with depth=2 only block 1 drops —
    a high rate guarantees the batch sees at least one dropped branch."""
    from rajni_tpu.models.vit import vit_forward

    params = init_params(jax.random.key(2), CFG)
    x = jnp.asarray(rng.standard_normal((64, 16, 16, 3)).astype(np.float32))
    a = vit_forward(params, x, CFG, SCHED, drop_path=0.8,
                    rng=jax.random.key(3))
    b = vit_forward(params, x, CFG, SCHED, drop_path=0.8,
                    rng=jax.random.key(3))
    c = vit_forward(params, x, CFG, SCHED, drop_path=0.8,
                    rng=jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # samples whose blocks ALL survived must equal the no-drop forward
    # up to the 1/keep_prob scaling of surviving branches — i.e. differ;
    # but drop_path must change SOME rows vs baseline
    base = vit_forward(params, x, CFG, SCHED)
    assert not np.array_equal(np.asarray(a), np.asarray(base))


def test_drop_path_composes_with_remat(rng):
    """jax.checkpoint recomputes the SAME masks (keys are closed-over
    constants of the block closure): remat + drop_path must match the
    un-rematerialized loss exactly at the forward level."""
    from rajni_tpu.models.vit import vit_forward

    params = init_params(jax.random.key(5), CFG)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))

    def loss(p, remat):
        y = vit_forward(p, x, CFG, SCHED, remat=remat, drop_path=0.5,
                        rng=jax.random.key(11))
        return jnp.sum(y ** 2)

    va, ga = jax.value_and_grad(lambda p: loss(p, False))(params)
    vb, gb = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)


def test_train_cli_drop_path_resume(tmp_path):
    """--drop_path composes with crash-safe resume: the mask stream is a
    pure function of (seed, step) under its domain tag, so the resumed
    trajectory is bit-identical. Also pins the PP rejection and range
    guard."""
    import json as _json

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "vit_tiny_patch16_64",
            "--schedule", str(sched), "--batch_size", "4",
            "--drop_path", "0.5", "--log_every", "1"]

    out_a = tmp_path / "a.msgpack"
    main(base + ["--steps", "3", "--output", str(out_a)])

    out_b = tmp_path / "b.msgpack"
    st = tmp_path / "b.state"
    main(base + ["--steps", "1", "--output", str(out_b),
                 "--save_state_every", "1", "--state_path", str(st)])
    main(base + ["--steps", "3", "--output", str(out_b),
                 "--resume", str(st)])

    for la, lb in zip(
        jax.tree_util.tree_leaves(load_params(str(out_a))),
        jax.tree_util.tree_leaves(load_params(str(out_b))),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    with pytest.raises(ValueError, match="drop_path"):
        main(base + ["--steps", "1", "--drop_path", "1.0",
                     "--output", str(tmp_path / "x.msgpack")])
    # PP composes with --drop_path AND --layer_decay since r4 (the old
    # stacked-leaves rejections are gone): stage branches draw the
    # single-device mask stream, factors map as stacked columns
    out_pp = tmp_path / "pp_dp.msgpack"
    state = main(base + ["--steps", "2", "--pipeline_parallel", "2",
                         "--batch_size", "16", "--layer_decay", "0.65",
                         "--output", str(out_pp)])
    assert int(state.step) == 2
    assert load_params(str(out_pp))["blocks"][0]["attn"]["qkv"][
        "kernel"
    ].ndim == 2


# --------------------------------------------------------------------------
# Knowledge distillation (--distill_teacher, DeiT recipe)
# --------------------------------------------------------------------------


def test_distillation_loss_hard_and_soft(rng):
    """hard = CE against the teacher argmax; soft = tau^2-scaled KL with
    the DeiT repo's /numel normalization (losses.py) — zero when the
    student matches the teacher exactly."""
    from rajni_tpu.train import cross_entropy, distillation_loss

    t = jnp.asarray(rng.standard_normal((8, 10)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((8, 10)).astype(np.float32))

    hard = distillation_loss(s, t, "hard")
    np.testing.assert_allclose(
        float(hard), float(cross_entropy(s, jnp.argmax(t, -1))), rtol=1e-6
    )

    # soft self-distillation is exactly zero
    np.testing.assert_allclose(
        float(distillation_loss(t, t, "soft", tau=3.0)), 0.0, atol=1e-7
    )

    # NumPy re-derivation of the DeiT normalization
    tau = 2.0
    tl = np.asarray(t, np.float64) / tau
    sl = np.asarray(s, np.float64) / tau
    tl = tl - np.log(np.exp(tl - tl.max(-1, keepdims=True)).sum(-1, keepdims=True)) - tl.max(-1, keepdims=True)
    sl = sl - np.log(np.exp(sl - sl.max(-1, keepdims=True)).sum(-1, keepdims=True)) - sl.max(-1, keepdims=True)
    want = (tau * tau) * float((np.exp(tl) * (tl - sl)).sum()) / t.size
    np.testing.assert_allclose(
        float(distillation_loss(s, t, "soft", tau=tau)), want, rtol=1e-5
    )


def test_distill_step_trains_dist_head(rng):
    """With distillation on, gradient reaches the dist head (it is
    otherwise dead weight: inference averages it but labels never touch
    it), and the combined loss actually depends on the teacher."""
    import dataclasses

    from rajni_tpu.train import create_train_state, make_train_step

    student_cfg = dataclasses.replace(CFG, distilled=True)
    sparams = init_params(jax.random.key(0), student_cfg)
    tparams = init_params(jax.random.key(9), CFG)
    state, tx = create_train_state(sparams, learning_rate=1e-3)
    x, y = _batch(rng, 8)

    step = jax.jit(make_train_step(
        student_cfg, SCHED, tx,
        distill=("hard", 0.5, 1.0, CFG), teacher_params=tparams,
    ))
    new_state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))
    delta = np.abs(
        np.asarray(new_state.params["head_dist"]["kernel"])
        - np.asarray(state.params["head_dist"]["kernel"])
    ).max()
    assert delta > 0, "dist head got no distillation gradient"

    # teacher dependence: a different teacher changes the loss
    step2 = jax.jit(make_train_step(
        student_cfg, SCHED, tx,
        distill=("hard", 0.5, 1.0, CFG),
        teacher_params=init_params(jax.random.key(10), CFG),
    ))
    _, m2 = step2(state, x, y)
    assert float(m2["loss"]) != float(metrics["loss"])


def test_train_cli_distill(tmp_path):
    """End-to-end: train a distilled DeiT student against a frozen ViT
    teacher checkpoint; plain students fall back to single-head
    distillation; flag validation fails fast."""
    import json as _json

    from rajni_tpu.models.vit import get_config
    from rajni_tpu.params.io import save_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    teacher = tmp_path / "teacher.msgpack"
    save_params(str(teacher),
                init_params(jax.random.key(1),
                            get_config("vit_tiny_patch16_64")))

    base = ["--synthetic", "--schedule", str(sched), "--batch_size", "4",
            "--steps", "2", "--log_every", "1",
            "--distill_teacher", str(teacher),
            "--distill_model", "vit_tiny_patch16_64"]

    # distilled student (dist token + dual head)
    state = main(base + ["--model", "deit_tiny_distilled_patch16_64",
                         "--output", str(tmp_path / "st.msgpack")])
    assert int(state.step) == 2
    # plain student (single-head fallback), soft variant
    main(base + ["--model", "vit_tiny_patch16_64",
                 "--distill_type", "soft", "--distill_tau", "3.0",
                 "--output", str(tmp_path / "st2.msgpack")])

    with pytest.raises(ValueError, match="distill_model"):
        main(base[:-2] + ["--model", "vit_tiny_patch16_64",
                          "--output", str(tmp_path / "x.msgpack")])
    with pytest.raises(ValueError, match="alpha"):
        main(base + ["--model", "vit_tiny_patch16_64",
                     "--distill_alpha", "1.5",
                     "--output", str(tmp_path / "x.msgpack")])


def test_train_cli_dp_drop_path_distill_compose(tmp_path):
    """The regularizers compose with single-host DP: one CLI run with
    --data_parallel, --drop_path and --distill_teacher together (the
    realistic recipe) runs on the 8-device mesh and checkpoints."""
    import json as _json

    from rajni_tpu.models.vit import get_config
    from rajni_tpu.params.io import load_params, save_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(_json.dumps({"1": {"keep_ratio": 0.6}}))
    teacher = tmp_path / "teacher.msgpack"
    save_params(str(teacher),
                init_params(jax.random.key(1),
                            get_config("vit_tiny_patch16_64")))
    out = tmp_path / "st.msgpack"
    state = main([
        "--synthetic", "--model", "deit_tiny_distilled_patch16_64",
        "--schedule", str(sched), "--batch_size", "8", "--steps", "2",
        "--data_parallel", "--drop_path", "0.2",
        "--distill_teacher", str(teacher),
        "--distill_model", "vit_tiny_patch16_64",
        "--log_every", "1", "--output", str(out),
    ])
    assert int(jax.device_get(state.step)) == 2
    assert load_params(str(out))["head_dist"] is not None
