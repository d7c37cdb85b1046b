"""Pipeline parallelism (GPipe) on the simulated 8-device CPU mesh.

The pipelined program must reproduce the single-device pruned forward
EXACTLY (same ops per block, zero-padding never enters the compute), and
the pipelined train step must track the single-device loss trajectory —
the backward schedule is the autodiff transpose of the forward scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.parallel.pipeline import (
    make_pipe_mesh,
    make_pipeline_train_step,
    pipeline_forward,
    place_pipeline_params,
    stack_params,
    unstack_params,
)
from rajni_tpu.train import TrainState, make_train_step
from rajni_tpu.utils.schedule import normalize_schedule

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=4,
    num_classes=16,
)
# update=False on block 2 REUSES block 1's (gathered) scores across the
# stage boundary at pipe=4 (1 block/stage) and pipe=2 (2 blocks/stage):
# the cross-stage score-threading contract (reference attention.py:25-28).
SCHED = normalize_schedule(
    {1: {"keep_ratio": 0.6, "update": True},
     2: {"keep_ratio": 0.8, "update": False}},
    TINY.depth,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    params = init_params(jax.random.key(0), TINY)
    x = np.asarray(
        jax.random.normal(jax.random.key(1), (16, 32, 32, 3)), np.float32
    )
    return params, x


@pytest.mark.parametrize("data,pipe,micro", [(2, 4, 4), (4, 2, 2), (2, 4, 8)])
def test_pipeline_matches_single_device(setup, data, pipe, micro):
    params, x = setup
    want = np.asarray(vit_forward(params, jnp.asarray(x), TINY, SCHED))
    mesh = make_pipe_mesh(data=data, pipe=pipe)
    apply = pipeline_forward(params, TINY, SCHED, mesh, microbatch=micro)
    got = np.asarray(apply(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pipeline_unpruned_and_scores_invalidation(setup):
    """No schedule at all, and a schedule where an unpruned block sits
    between two pruned ones (scores must invalidate — model.py:63)."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    for sched in (
        None,
        normalize_schedule(
            {0: {"keep_ratio": 0.8},
             2: {"keep_ratio": 0.7, "update": False}},  # enters invalid →
            TINY.depth,                                  # recomputes
        ),
    ):
        want = np.asarray(vit_forward(params, jnp.asarray(x), TINY, sched))
        got = np.asarray(
            pipeline_forward(params, TINY, sched, mesh, microbatch=4)(x)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pipeline_pads_odd_batch(setup):
    """B=10 with M·D=8 microbatch grid: padded to 16, sliced back."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    apply = pipeline_forward(params, TINY, SCHED, mesh, microbatch=4)
    want = np.asarray(vit_forward(params, jnp.asarray(x[:10]), TINY, SCHED))
    got = np.asarray(apply(x[:10]))
    assert got.shape == (10, TINY.num_classes)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_stage_weight_placement(setup):
    """Each chip holds ONLY its stage's blocks — the point of PP."""
    params, _ = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    placed = place_pipeline_params(stack_params(params, 4), mesh)
    fc1 = placed["blocks"]["mlp"]["fc1"]["kernel"]  # [depth, C, 4C]
    shapes = {s.data.shape for s in fc1.addressable_shards}
    assert shapes == {(1, 64, 256)}  # depth/pipe = 1 block per chip
    # embed/head replicated
    assert placed["embed"]["cls_token"].addressable_shards[0].data.shape == (
        1, 1, 64,
    )


def test_pipeline_uses_collective_permute(setup):
    """The inter-stage shift must be a collective-permute on the ICI ring,
    not an all-gather of activations."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    from rajni_tpu.parallel.pipeline import _pipeline_logits_fn

    stacked = place_pipeline_params(stack_params(params, 4), mesh)
    fn = jax.jit(_pipeline_logits_fn(TINY, SCHED, mesh, 4, "xla", False))
    mb = jnp.asarray(x).reshape(4, 4, 32, 32, 3)
    hlo = fn.lower(stacked, mb).compile().as_text()
    assert "collective-permute" in hlo
    # no activation-sized all-gather: the only gathers allowed are tiny
    # (none expected at all on this program)
    assert " all-gather(" not in hlo


def test_rejects_bad_configs(setup):
    params, _ = setup
    with pytest.raises(ValueError, match="divisible"):
        stack_params(params, 3)  # depth=4 % 3
    from rajni_tpu.quant import quantize_params

    with pytest.raises(NotImplementedError, match="int8"):
        stack_params(quantize_params(params), 2)


def test_stack_unstack_roundtrip(setup):
    params, x = setup
    rt = unstack_params(stack_params(params, 2))
    want = np.asarray(vit_forward(params, jnp.asarray(x), TINY, SCHED))
    got = np.asarray(vit_forward(rt, jnp.asarray(x), TINY, SCHED))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("data,pipe,tp", [(2, 2, 2), (1, 4, 2), (1, 2, 4)])
def test_pipeline_tp_matches_single_device(setup, data, pipe, tp):
    """3-D (data, pipe, model) mesh: Megatron TP inside every pipeline
    stage. psum partial-sum order differs from the single-chip reduce, so
    tolerance- rather than bit-parity (same contract as the DP+TP tests)."""
    params, x = setup
    want = np.asarray(vit_forward(params, jnp.asarray(x), TINY, SCHED))
    mesh = make_pipe_mesh(data=data, pipe=pipe, model=tp)
    apply = pipeline_forward(params, TINY, SCHED, mesh, microbatch=2 * pipe)
    got = np.asarray(apply(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pipeline_tp_weight_placement(setup):
    """Each chip holds only its stage's blocks AND only its head/hidden
    shard of them — PP memory × TP memory compose."""
    params, _ = setup
    mesh = make_pipe_mesh(data=2, pipe=2, model=2)
    placed = place_pipeline_params(stack_params(params, 2, tp=2), mesh)
    fc1 = placed["blocks"]["mlp"]["fc1"]["kernel"]  # [depth, C, 4C]
    assert {s.data.shape for s in fc1.addressable_shards} == {(2, 64, 128)}
    qkv = placed["blocks"]["attn"]["qkv"]["kernel"]  # [depth, C, 3, C]
    assert {s.data.shape for s in qkv.addressable_shards} == {(2, 64, 3, 32)}
    proj = placed["blocks"]["attn"]["proj"]["kernel"]  # [depth, C, C]
    assert {s.data.shape for s in proj.addressable_shards} == {(2, 32, 64)}


def test_pipeline_tp_rejects_bad_heads(setup):
    params, _ = setup
    mesh = make_pipe_mesh(data=1, pipe=2, model=4)
    bad = ViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=2,
        num_classes=16,
    )
    with pytest.raises(ValueError, match="num_heads"):
        pipeline_forward(params, bad, SCHED, mesh, microbatch=4)


def test_pipeline_tp_train_matches_single_device(setup):
    """GPipe + in-stage TP train step tracks the single-device trajectory
    (psum rounding → tolerance)."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=2, model=2)
    tx = optax.adamw(1e-3, weight_decay=0.0)

    stacked = place_pipeline_params(stack_params(params, 2, tp=2), mesh)
    pstate = TrainState(stacked, tx.init(stacked), jnp.zeros((), jnp.int32))
    pstep = jax.jit(
        make_pipeline_train_step(TINY, SCHED, mesh, tx, microbatch=4)
    )

    sstate = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    sstep = jax.jit(make_train_step(TINY, SCHED, tx))

    xb, yb = jnp.asarray(x[:8]), jnp.asarray(np.arange(8, dtype=np.int32) % 16)
    for _ in range(3):
        pstate, pm = pstep(pstate, xb, yb)
        sstate, sm = sstep(sstate, xb, yb)
        assert abs(float(pm["loss"]) - float(sm["loss"])) < 1e-4, (
            float(pm["loss"]), float(sm["loss"]),
        )
    pu = unstack_params(jax.device_get(pstate.params))
    su = jax.device_get(sstate.params)
    # the TP qkv stays head-aligned [C, 3, C] — flatten for comparison
    got = np.asarray(pu["blocks"][1]["attn"]["qkv"]["kernel"]).reshape(64, -1)
    want = np.asarray(su["blocks"][1]["attn"]["qkv"]["kernel"])
    assert np.abs(got - want).max() < 5e-4
    for leaf in ("fc1", "fc2"):
        d = np.abs(
            np.asarray(pu["blocks"][1]["mlp"][leaf]["kernel"])
            - np.asarray(su["blocks"][1]["mlp"][leaf]["kernel"])
        ).max()
        assert d < 5e-4, (leaf, d)


def test_pipeline_train_matches_single_device(setup):
    """3 GPipe steps track the single-device trajectory on the same union
    batch: equal losses and matching strong-gradient leaves (the K-bias
    caveat from the multihost parity test doesn't bite here — reduction
    order inside one program is deterministic)."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    tx = optax.adamw(1e-3, weight_decay=0.0)

    stacked = place_pipeline_params(stack_params(params, 4), mesh)
    pstate = TrainState(stacked, tx.init(stacked), jnp.zeros((), jnp.int32))
    pstep = jax.jit(
        make_pipeline_train_step(TINY, SCHED, mesh, tx, microbatch=4)
    )

    sstate = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    sstep = jax.jit(make_train_step(TINY, SCHED, tx))

    xb, yb = jnp.asarray(x[:8]), jnp.asarray(np.arange(8, dtype=np.int32) % 16)
    for _ in range(3):
        pstate, pm = pstep(pstate, xb, yb)
        sstate, sm = sstep(sstate, xb, yb)
        assert abs(float(pm["loss"]) - float(sm["loss"])) < 1e-5, (
            float(pm["loss"]), float(sm["loss"]),
        )
    pu = unstack_params(jax.device_get(pstate.params))
    su = jax.device_get(sstate.params)
    for leaf in ("fc1", "fc2"):
        d = np.abs(
            np.asarray(pu["blocks"][1]["mlp"][leaf]["kernel"])
            - np.asarray(su["blocks"][1]["mlp"][leaf]["kernel"])
        ).max()
        assert d < 5e-5, (leaf, d)


def test_pipeline_mixup_matches_single_device(setup):
    """Mixup/CutMix in the GPipe step mix the FULL batch before the
    microbatch split with the same (seed, step)-derived draws as the plain
    step (shared apply_batch_mix) — the losses must track the
    single-device trajectory across steps that switch modes."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    tx = optax.adamw(1e-3, weight_decay=0.0)

    stacked = place_pipeline_params(stack_params(params, 4), mesh)
    pstate = TrainState(stacked, tx.init(stacked), jnp.zeros((), jnp.int32))
    pstep = jax.jit(
        make_pipeline_train_step(TINY, SCHED, mesh, tx, microbatch=4,
                                 mixup_alpha=0.3, cutmix_alpha=1.0, seed=7,
                                 label_smoothing=0.1)
    )

    sstate = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    sstep = jax.jit(make_train_step(TINY, SCHED, tx, mixup_alpha=0.3,
                                    cutmix_alpha=1.0, seed=7,
                                    label_smoothing=0.1))

    xb = jnp.asarray(x[:8])
    yb = jnp.asarray(np.arange(8, dtype=np.int32) % 16)
    for _ in range(2):
        pstate, pm = pstep(pstate, xb, yb)
        sstate, sm = sstep(sstate, xb, yb)
        assert abs(float(pm["loss"]) - float(sm["loss"])) < 1e-5, (
            float(pm["loss"]), float(sm["loss"]),
        )


def test_pipeline_drop_path_matches_single_device(setup):
    """--drop_path under PP (VERDICT r3 #5): the stage branches draw the
    SAME (seed, step)-keyed full-batch bernoulli rows as the plain step
    (sliced per microbatch and data shard), so the loss trajectory tracks
    single-device bit-for-mask."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    tx = optax.adamw(1e-3, weight_decay=0.0)

    stacked = place_pipeline_params(stack_params(params, 4), mesh)
    pstate = TrainState(stacked, tx.init(stacked), jnp.zeros((), jnp.int32))
    pstep = jax.jit(
        make_pipeline_train_step(TINY, SCHED, mesh, tx, microbatch=4,
                                 drop_path=0.3, seed=11)
    )

    sstate = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    sstep = jax.jit(make_train_step(TINY, SCHED, tx, drop_path=0.3,
                                    seed=11))

    xb = jnp.asarray(x[:8])
    yb = jnp.asarray(np.arange(8, dtype=np.int32) % 16)
    for _ in range(3):
        pstate, pm = pstep(pstate, xb, yb)
        sstate, sm = sstep(sstate, xb, yb)
        assert abs(float(pm["loss"]) - float(sm["loss"])) < 1e-5, (
            float(pm["loss"]), float(sm["loss"]),
        )


def test_pipeline_drop_path_actually_drops(setup):
    """Sanity against a silently-inert flag: with rate ~1 the later
    blocks' branches are almost always dropped, so the loss must differ
    from the rate-0 run at step 1."""
    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)
    tx = optax.adamw(1e-3, weight_decay=0.0)
    xb = jnp.asarray(x[:8])
    yb = jnp.asarray(np.arange(8, dtype=np.int32) % 16)
    losses = {}
    for rate in (0.0, 0.9):
        stacked = place_pipeline_params(stack_params(params, 4), mesh)
        st = TrainState(stacked, tx.init(stacked), jnp.zeros((), jnp.int32))
        step = jax.jit(make_pipeline_train_step(
            TINY, SCHED, mesh, tx, microbatch=4, drop_path=rate, seed=3
        ))
        _, m = step(st, xb, yb)
        losses[rate] = float(m["loss"])
    assert abs(losses[0.0] - losses[0.9]) > 1e-6, losses


def test_pipeline_layer_decay_matches_single_device(setup):
    """--layer_decay under PP: the stacked factor columns
    (layer_decay_factors_stacked) reproduce the canonical per-block LLRD
    — loss trajectory AND the per-block update scaling match the
    single-device run."""
    from rajni_tpu.train import (build_optimizer,
                                 layer_decay_factors,
                                 layer_decay_factors_stacked)

    params, x = setup
    mesh = make_pipe_mesh(data=2, pipe=4)

    stacked_raw = stack_params(params, 4)
    # factor parity: the stacked column at depth i equals the canonical
    # per-block scalar
    fc = layer_decay_factors(params, 0.65)
    fs = layer_decay_factors_stacked(stacked_raw, 0.65)
    col = np.asarray(
        fs["blocks"]["mlp"]["fc1"]["kernel"]
    ).reshape(-1)
    want = [fc["blocks"][i]["mlp"]["fc1"]["kernel"]
            for i in range(TINY.depth)]
    np.testing.assert_allclose(col, want, rtol=1e-6)
    assert float(np.asarray(fs["embed"]["cls_token"])) == pytest.approx(
        0.65 ** (TINY.depth + 1)
    )

    ptx = build_optimizer(1e-3, total_steps=100, layer_decay=0.65,
                          params=stacked_raw, pp_stacked=True)
    stx = build_optimizer(1e-3, total_steps=100, layer_decay=0.65,
                          params=params)

    stacked = place_pipeline_params(stacked_raw, mesh)
    pstate = TrainState(stacked, ptx.init(stacked),
                        jnp.zeros((), jnp.int32))
    pstep = jax.jit(
        make_pipeline_train_step(TINY, SCHED, mesh, ptx, microbatch=4)
    )
    sstate = TrainState(params, stx.init(params), jnp.zeros((), jnp.int32))
    sstep = jax.jit(make_train_step(TINY, SCHED, stx))

    xb = jnp.asarray(x[:8])
    yb = jnp.asarray(np.arange(8, dtype=np.int32) % 16)
    for _ in range(3):
        pstate, pm = pstep(pstate, xb, yb)
        sstate, sm = sstep(sstate, xb, yb)
        assert abs(float(pm["loss"]) - float(sm["loss"])) < 1e-5, (
            float(pm["loss"]), float(sm["loss"]),
        )
    pu = unstack_params(jax.device_get(pstate.params))
    su = jax.device_get(sstate.params)
    for blk in (0, 3):  # most- and least-decayed blocks
        d = np.abs(
            np.asarray(pu["blocks"][blk]["mlp"]["fc1"]["kernel"])
            - np.asarray(su["blocks"][blk]["mlp"]["fc1"]["kernel"])
        ).max()
        assert d < 5e-5, (blk, d)
