"""Fused-kernel training path (models/train_path.py, kernels/train.py).

Pins the custom-VJP contract: the pallas forward + residual-fed XLA
backward must match ``vit_forward(impl="xla")`` under ``jax.value_and_grad``
to fp32 tolerance — same selection, same compaction, same gradients
(reference semantics: attention.py:17-60, model.py:55-63; scores carry no
gradient, importance.py:4 ``no_grad``).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rajni_tpu.models.train_path import (
    train_kernels_supported,
    vit_forward_train,
)
from rajni_tpu.models.vit import ViTConfig, get_config, init_params, vit_forward
from rajni_tpu.utils.schedule import normalize_schedule

SCHED = {"3": {"keep_ratio": 0.7, "update": True},
         "4": {"keep_ratio": 0.7, "update": False},
         "5": {"keep_ratio": 0.6, "update": True}}


def _loss_pair(cfg, sched, params, x, labels, stock_impl="pallas"):
    def loss(fwd):
        def f(p):
            lg = fwd(p).astype(jnp.float32)
            return -jnp.mean(
                jax.nn.log_softmax(lg)[jnp.arange(lg.shape[0]), labels]
            )
        return f

    l_x, g_x = jax.jit(jax.value_and_grad(
        loss(lambda p: vit_forward(p, x, cfg, sched, "xla"))
    ))(params)
    l_k, g_k = jax.jit(jax.value_and_grad(
        loss(lambda p: vit_forward_train(p, x, cfg, sched,
                                         stock_impl=stock_impl))
    ))(params)
    return (l_x, g_x), (l_k, g_k)


def _worst_rel(g1, g2):
    def rel(a, b):
        return float(
            jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12)
        )
    return max(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(rel, g1, g2)
    ))


@pytest.mark.parametrize("sched_dict,stock_impl", [
    (None, "pallas"), (SCHED, "xla"), (SCHED, "pallas"),
], ids=["stock-kernel", "pruned-mixed", "pruned-allkernel"])
def test_grad_parity_fp32(sched_dict, stock_impl):
    """Gradient parity vs the XLA path for every routing: the kernel
    stock op (stock_impl='pallas' — not the default route, but its VJP
    must stay correct), the default mixed route (pruned kernels + XLA
    stock blocks), and the all-kernel route."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(sched_dict, cfg.depth)
    ok, why = train_kernels_supported(cfg, sched, jnp.float32)
    assert ok, why
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 2, 3])
    (l_x, g_x), (l_k, g_k) = _loss_pair(
        cfg, sched, params, x, labels, stock_impl=stock_impl
    )
    assert abs(float(l_x - l_k)) < 1e-4
    assert _worst_rel(g_x, g_k) < 1e-3


def test_grad_parity_layer_scale():
    """Blocks carrying ls1/ls2 produce matching grads for them too (the
    cotangent tree must mirror the optional keys)."""
    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=64, depth=3,
                    num_heads=4, num_classes=8, use_layer_scale=True,
                    layer_scale_init=0.5)
    sched = normalize_schedule({"1": {"keep_ratio": 0.7, "update": True}},
                               cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    assert "ls1" in params["blocks"][0]
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1])
    (l_x, g_x), (l_k, g_k) = _loss_pair(cfg, sched, params, x, labels)
    assert abs(float(l_x - l_k)) < 1e-4
    assert _worst_rel(g_x, g_k) < 1e-3
    ls_grad = g_k["blocks"][0]["ls1"]
    assert float(jnp.max(jnp.abs(ls_grad))) > 0.0


def test_grad_parity_bf16():
    """bf16 training numerics: the kernel path tracks XLA within the
    rounding noise of the saved boundaries."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(SCHED, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.bfloat16)
    labels = jnp.array([0, 1, 2, 3])
    (l_x, g_x), (l_k, g_k) = _loss_pair(cfg, sched, params, x, labels)
    assert abs(float(l_x) - float(l_k)) < 0.05
    assert _worst_rel(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), g_x),
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), g_k),
    ) < 0.1


def test_scores_carry_no_gradient():
    """The pruned op's backward returns a zero cotangent for the score
    thread (reference importance.py:4 no_grad): training through an
    update=False chain must still produce finite, parity-level grads."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(
        {"2": {"keep_ratio": 0.8, "update": True},
         "3": {"keep_ratio": 0.8, "update": False},
         "4": {"keep_ratio": 0.8, "update": False}}, cfg.depth
    )
    params = init_params(jax.random.key(2), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(3), (2, 64, 64, 3), jnp.float32)
    labels = jnp.array([1, 5])
    (_, g_x), (_, g_k) = _loss_pair(cfg, sched, params, x, labels)
    assert _worst_rel(g_x, g_k) < 1e-3
    finite = jax.tree_util.tree_map(
        lambda a: bool(jnp.all(jnp.isfinite(a))), g_k
    )
    assert all(jax.tree_util.tree_leaves(finite))


def test_supported_gate_rejects():
    # extended variant: registers break the classic-prefix kernels
    reg = get_config("vit_base_patch14_reg4_dinov2")
    ok, why = train_kernels_supported(reg, None, jnp.bfloat16)
    assert not ok and "variant" in why
    # N=577 at keep 0.95: the pruned gather kernel exceeds VMEM
    b384 = get_config("vit_base_patch16_384")
    ok, why = train_kernels_supported(
        b384, {"1": {"keep_ratio": 0.95, "update": True}}, jnp.bfloat16
    )
    assert not ok and "VMEM" in why
    # ViT-L IS supported since the MLP half grew an XLA fallback
    # (the _mlp_half residency routing, r4)
    large = get_config("vit_large_patch16_224")
    ok, why = train_kernels_supported(large, SCHED, jnp.bfloat16)
    assert ok, why
    # the flagship config is supported
    base = get_config("vit_base_patch16_224")
    ok, why = train_kernels_supported(base, SCHED, jnp.bfloat16)
    assert ok, why


def test_grad_parity_remat():
    """--kernels pallas + --remat: jax.checkpoint over the custom-VJP
    block ops (the recompute re-runs the pallas forward rule) — grads
    identical to the non-remat kernel path."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(SCHED, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 2, 3])

    def loss(remat):
        def f(p):
            lg = vit_forward_train(
                p, x, cfg, sched, remat=remat
            ).astype(jnp.float32)
            return -jnp.mean(
                jax.nn.log_softmax(lg)[jnp.arange(4), labels]
            )
        return f

    l_a, g_a = jax.jit(jax.value_and_grad(loss(False)))(params)
    l_b, g_b = jax.jit(jax.value_and_grad(loss(True)))(params)
    assert abs(float(l_a - l_b)) < 1e-6
    assert _worst_rel(g_a, g_b) < 1e-5


def test_grad_parity_mlp_xla_fallback(monkeypatch):
    """ViT-L-class routing: when the MLP weights exceed VMEM residency,
    _mlp_half runs the same math in XLA (h still saved) — gradients stay
    at parity with the full XLA path."""
    import rajni_tpu.models.train_path as tp

    monkeypatch.setattr(tp, "train_mlp_fits", lambda *a, **k: False)
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(SCHED, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 2, 3])
    (l_x, g_x), (l_k, g_k) = _loss_pair(cfg, sched, params, x, labels)
    assert abs(float(l_x - l_k)) < 1e-4
    assert _worst_rel(g_x, g_k) < 1e-3


def test_train_cli_kernels_pallas(tmp_path):
    """End-to-end: --kernels pallas trains (loss drops) and tracks the
    XLA path's loss trajectory on identical synthetic batches."""
    from rajni_tpu import train as train_cli

    outs = {}
    for impl in ("xla", "pallas"):
        out = tmp_path / f"{impl}.msgpack"
        train_cli.main([
            "--synthetic", "--model", "vit_tiny_patch16_64",
            "--steps", "6", "--batch_size", "8", "--lr", "1e-3",
            "--seed", "0", "--output", str(out), "--log_every", "2",
            "--kernels", impl,
        ])
        assert out.exists()
        outs[impl] = out
    from rajni_tpu.params.io import load_params

    p_x = load_params(str(outs["xla"]))
    p_k = load_params(str(outs["pallas"]))
    # same data, same seed, tolerance-level numerics → params land close
    for a, b in zip(jax.tree_util.tree_leaves(p_x),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-3,
        )


def test_train_cli_kernels_pallas_with_schedule_and_distill(tmp_path):
    """The kernel path composes with pruning schedules and the DeiT
    distillation loss (return_dist through classifier_head)."""
    from rajni_tpu import train as train_cli

    sched = tmp_path / "sched.json"
    sched.write_text(json.dumps(
        {"3": {"keep_ratio": 0.7, "update": True}}
    ))
    teacher = tmp_path / "teacher.msgpack"
    train_cli.main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--steps", "2", "--batch_size", "8",
        "--output", str(teacher),
    ])
    out = tmp_path / "student.msgpack"
    train_cli.main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--schedule", str(sched), "--steps", "3", "--batch_size", "8",
        "--kernels", "pallas",
        "--distill_teacher", str(teacher),
        "--distill_model", "vit_tiny_patch16_64",
        "--output", str(out),
    ])
    assert out.exists()


def test_train_cli_kernels_pallas_data_parallel(tmp_path, capsys):
    """--kernels pallas + --data_parallel: the grad computation shard_maps
    over the data mesh (pallas custom calls need manual sharding) and the
    loss trajectory matches the unsharded kernel run on the same batches
    (pmean of equal shards = the global mean)."""
    import re

    from rajni_tpu import train as train_cli

    losses = {}
    for mode, extra in (("plain", []), ("dp", ["--data_parallel"])):
        out = tmp_path / f"{mode}.msgpack"
        train_cli.main([
            "--synthetic", "--model", "vit_tiny_patch16_64",
            "--steps", "3", "--batch_size", "16", "--lr", "1e-3",
            "--seed", "0", "--output", str(out), "--log_every", "1",
            "--kernels", "pallas", *extra,
        ])
        losses[mode] = [
            float(m) for m in re.findall(
                r"loss (\d+\.\d+)", capsys.readouterr().out
            )
        ]
    assert losses["plain"] and len(losses["plain"]) == len(losses["dp"])
    np.testing.assert_allclose(losses["dp"], losses["plain"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("extra", [
    ["--pipeline_parallel", "2"],
    ["--tensor_parallel", "2"],            # heads=3 not divisible by 2
    ["--tensor_parallel", "2", "--remat"],
], ids=["pp", "tp-indivisible", "tp-remat"])
def test_train_cli_kernels_pallas_rejections(extra):
    from rajni_tpu import train as train_cli

    with pytest.raises(ValueError):
        train_cli.main([
            "--synthetic", "--model", "vit_tiny_patch16_64",
            "--steps", "1", "--batch_size", "8",
            "--kernels", "pallas", *extra,
        ])


def test_train_cli_kernels_pallas_unsupported_config(tmp_path):
    import json

    from rajni_tpu import train as train_cli

    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"1": {"keep_ratio": 0.95}}))
    with pytest.raises(ValueError, match="unsupported"):
        train_cli.main([
            "--synthetic", "--model", "vit_base_patch16_384",
            "--schedule", str(sched),
            "--steps", "1", "--batch_size", "2", "--dtype", "bfloat16",
            "--kernels", "pallas",
        ])


def test_train_cli_kernels_pallas_regularizer_stack(tmp_path):
    """--kernels pallas composes with the recipe knobs that live outside
    the forward: mixup/CutMix + label smoothing (mixing happens on the
    global batch before the step), grad clip, LLRD, EMA, grad accum."""
    from rajni_tpu import train as train_cli

    out = tmp_path / "k.msgpack"
    state = train_cli.main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--steps", "4", "--batch_size", "8", "--kernels", "pallas",
        "--mixup", "0.3", "--cutmix", "1.0", "--label_smoothing", "0.1",
        "--grad_clip", "1.0", "--layer_decay", "0.65", "--ema", "0.9",
        "--grad_accum", "2", "--lr_schedule", "cosine",
        "--warmup_steps", "2", "--output", str(out), "--log_every", "1",
    ])
    assert int(state.step) == 4
    assert out.exists() and (tmp_path / "k.msgpack.ema").exists()


def test_attn_bwd_route_parity(monkeypatch):
    """The fused pallas SDPA-backward kernel (kernels/train.py
    train_sdpa_bwd, the default attention-half backward) matches the XLA
    einsum vjp route gradient-for-gradient — same saved boundaries, same
    math, only the relayout copies differ (profile_train.py attribution:
    ~13 ms/step of [B,K,3,H,D] data-formatting on the XLA route)."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(SCHED, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 2, 3])

    def grads(route, stock_impl):
        monkeypatch.setenv("RAJNI_TRAIN_ATTN_BWD", route)

        def loss(p):
            lg = vit_forward_train(
                p, x, cfg, sched, stock_impl=stock_impl
            ).astype(jnp.float32)
            return -jnp.mean(
                jax.nn.log_softmax(lg)[jnp.arange(lg.shape[0]), labels]
            )

        # fresh jit per route: the env var is read at trace time
        return jax.jit(jax.value_and_grad(loss))(params)

    for stock_impl in ("xla", "pallas"):
        l_p, g_p = grads("pallas", stock_impl)
        l_x, g_x = grads("xla", stock_impl)
        assert abs(float(l_p - l_x)) < 1e-6  # same primal either way
        assert _worst_rel(g_x, g_p) < 1e-4


def test_attn_bwd_fits_gate():
    """Long sequences (N=577 ViT-B/384 class) exceed the SDPA-backward
    kernel's VMEM estimate and must route the XLA fallback."""
    from rajni_tpu.kernels.train import train_sdpa_bwd_fits

    assert train_sdpa_bwd_fits(197, 768, 2)       # ViT-B/224 stock
    assert train_sdpa_bwd_fits(150, 768, 2)       # pruned widths
    assert not train_sdpa_bwd_fits(577, 768, 2)   # ViT-B/384


def test_grad_parity_drop_path():
    """--kernels pallas + --drop_path: the per-branch masks blended
    around the fused ops (x + m*(y - x), backward corrections in
    _pruned_block_bwd/_stock_block_bwd) match the XLA path's stochastic
    depth gradient-for-gradient — same fold_in/split key schedule, so
    the drop decisions are identical across engines."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(SCHED, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 2, 3])
    rng = jax.random.fold_in(jax.random.key(7), 3)

    def loss(fwd):
        def f(p):
            lg = fwd(p).astype(jnp.float32)
            return -jnp.mean(
                jax.nn.log_softmax(lg)[jnp.arange(4), labels]
            )
        return f

    l_x, g_x = jax.jit(jax.value_and_grad(loss(
        lambda p: vit_forward(p, x, cfg, sched, "xla",
                              drop_path=0.3, rng=rng)
    )))(params)
    # both stock routes: the kernel stock op and the XLA stock_block
    for stock_impl in ("pallas", "xla"):
        l_k, g_k = jax.jit(jax.value_and_grad(loss(
            lambda p: vit_forward_train(p, x, cfg, sched,
                                        stock_impl=stock_impl,
                                        drop_path=0.3, rng=rng)
        )))(params)
        assert abs(float(l_x - l_k)) < 1e-4
        assert _worst_rel(g_x, g_k) < 1e-3


def test_grad_parity_drop_path_remat():
    """drop_path + remat on the kernel path: the checkpoint recompute
    reuses the mask INPUTS (drawn outside the ops), so grads are
    identical to the non-remat kernel run."""
    cfg = get_config("vit_tiny_patch16_64")
    sched = normalize_schedule(SCHED, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 2, 3])
    rng = jax.random.key(11)

    def loss(remat):
        def f(p):
            lg = vit_forward_train(
                p, x, cfg, sched, remat=remat, drop_path=0.2, rng=rng
            ).astype(jnp.float32)
            return -jnp.mean(
                jax.nn.log_softmax(lg)[jnp.arange(4), labels]
            )
        return f

    l_a, g_a = jax.jit(jax.value_and_grad(loss(False)))(params)
    l_b, g_b = jax.jit(jax.value_and_grad(loss(True)))(params)
    assert abs(float(l_a - l_b)) < 1e-6
    assert _worst_rel(g_a, g_b) < 1e-5


def test_train_cli_kernels_pallas_drop_path(tmp_path):
    """The CLI rejection is lifted: --kernels pallas --drop_path trains
    (composed with --remat to cover the checkpoint route too)."""
    from rajni_tpu import train as train_cli

    out = tmp_path / "k.msgpack"
    state = train_cli.main([
        "--synthetic", "--model", "vit_tiny_patch16_64",
        "--steps", "2", "--batch_size", "8", "--kernels", "pallas",
        "--drop_path", "0.1", "--remat",
        "--output", str(out), "--log_every", "1",
    ])
    assert int(state.step) == 2
    assert out.exists()


def test_tp_kernels_grad_parity():
    """Megatron TP over the train kernels (parallel/tp_train.py): the
    shard_mapped (data, model) step — custom-vjp pallas segments, f/g
    psum pairs, norm-leaf gradient completion — tracks the single-device
    kernel path's loss trajectory (tolerance: psum reduction order)."""
    from rajni_tpu.parallel.mesh import (
        make_mesh,
        param_pspecs,
        shard_params,
    )
    from rajni_tpu.parallel.tp_train import (
        make_tp_train_step,
        tp_kernels_train_supported,
    )
    from rajni_tpu.train import TrainState, build_optimizer, make_train_step

    cfg = get_config("deit_small_patch16_64")
    sched = normalize_schedule(
        {"1": {"keep_ratio": 0.6, "update": True},
         "2": {"keep_ratio": 0.9, "update": False}}, cfg.depth
    )
    ok, why = tp_kernels_train_supported(cfg, sched, 2, jnp.float32)
    assert ok, why
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (8, 64, 64, 3), jnp.float32)
    labels = jnp.arange(8) % cfg.num_classes

    tx = build_optimizer(1e-3, total_steps=10)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(cfg, sched, tx, impl="pallas"))
    ref_losses = []
    for _ in range(3):
        state, m = step(state, x, labels)
        ref_losses.append(float(m["loss"]))

    mesh = make_mesh(model=2)
    sharded = shard_params(params, mesh)
    tstate = TrainState(sharded, tx.init(sharded), jnp.zeros((), jnp.int32))
    tp_step = jax.jit(
        make_tp_train_step(cfg, sched, tx, mesh, param_pspecs(sharded))
    )
    tp_losses = []
    for _ in range(3):
        tstate, m = tp_step(tstate, x, labels)
        tp_losses.append(float(m["loss"]))
    np.testing.assert_allclose(tp_losses, ref_losses, rtol=2e-3, atol=1e-4)


def test_train_cli_kernels_tensor_parallel(tmp_path, capsys):
    """--kernels pallas --tensor_parallel on the CLI: trajectory matches
    the plain kernel run and the checkpoint saves canonical."""
    import re

    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import main

    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"1": {"keep_ratio": 0.6}}))
    base = ["--synthetic", "--model", "deit_small_patch16_64",
            "--schedule", str(sched), "--steps", "2", "--batch_size", "8",
            "--log_every", "1", "--lr", "1e-3", "--kernels", "pallas"]

    def losses(text):
        return [float(m) for m in re.findall(r"loss (\d+\.\d+)", text)]

    out_plain = tmp_path / "plain.msgpack"
    main(base + ["--output", str(out_plain)])
    plain = losses(capsys.readouterr().out)

    out_tp = tmp_path / "tp.msgpack"
    state = main(base + ["--output", str(out_tp),
                         "--tensor_parallel", "2"])
    printed = capsys.readouterr().out
    tp = losses(printed)
    assert int(state.step) == 2
    assert len(plain) == len(tp) == 2
    for a, b in zip(plain, tp):
        assert abs(a - b) < 5e-3 * max(1.0, abs(a)), (plain, tp)

    p = load_params(str(out_tp))
    assert p["blocks"][0]["attn"]["qkv"]["kernel"].ndim == 2  # canonical


def test_tp_kernels_drop_path():
    """drop_path composes with TP kernel training: masks apply in the
    outer (post-psum) residual adds, so gradients need no corrections.
    rate=0 is bit-identical to no-drop-path; a high rate changes the
    trajectory; a fixed (seed, step) replays the same masks."""
    from rajni_tpu.parallel.mesh import (
        make_mesh,
        param_pspecs,
        shard_params,
    )
    from rajni_tpu.parallel.tp_train import make_tp_train_step
    from rajni_tpu.train import TrainState, build_optimizer

    cfg = get_config("deit_small_patch16_64")
    sched = normalize_schedule({"1": {"keep_ratio": 0.6}}, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (8, 64, 64, 3), jnp.float32)
    labels = jnp.arange(8) % cfg.num_classes
    mesh = make_mesh(model=2)
    sharded = shard_params(params, mesh)
    tx = build_optimizer(1e-3, total_steps=10)
    pspecs = param_pspecs(sharded)

    def run(drop_path):
        st = TrainState(sharded, tx.init(sharded),
                        jnp.zeros((), jnp.int32))
        step = jax.jit(make_tp_train_step(
            cfg, sched, tx, mesh, pspecs, drop_path=drop_path
        ))
        out = []
        for _ in range(2):
            st, m = step(st, x, labels)
            out.append(float(m["loss"]))
        return out

    base = run(0.0)
    dropped = run(0.9)
    replay = run(0.9)
    assert all(np.isfinite(base)) and all(np.isfinite(dropped))
    assert dropped == replay                 # same (seed, step) stream
    assert abs(dropped[1] - base[1]) > 1e-6  # masks actually bite
