"""Multi-host (DCN) data parallelism: rajni_tpu.parallel.multihost.

Two layers of coverage:

  * in-process: the multihost API degrades gracefully on a single
    process — ``multihost_eval_step`` / ``evaluate_model_multihost`` on
    the conftest 8-device CPU mesh must reproduce the plain eval's
    accounting exactly (both backends);
  * cross-process: REAL multi-controller runs — two subprocesses, two
    virtual CPU devices each, gloo collectives over localhost
    (tests/multihost_worker.py) — every process must report the same
    global accuracy, and it must match a single-process reference on the
    union of both hosts' data. This is SURVEY.md §4's
    multi-chip-without-a-cluster trick, extended to multi-host.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.parallel import multihost
from rajni_tpu.parallel.mesh import make_mesh
from rajni_tpu.utils.schedule import normalize_schedule

CFG = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=3,
                num_heads=4, mlp_ratio=2.0, num_classes=13)
SCHED = normalize_schedule({1: {"keep_ratio": 0.7}}, CFG.depth)


def _params():
    return init_params(jax.random.key(0), CFG, jnp.float32)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_multihost_eval_step_single_process(rng, impl):
    """Counters from the (mesh-sharded) step equal host-side accounting;
    label -1 rows count toward neither numerator nor denominator."""
    params = _params()
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    step = multihost.multihost_eval_step(CFG, SCHED, mesh, impl)
    gparams = multihost.replicate_to_global(params, mesh)

    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 13, size=(16,)).astype(np.int32)
    labels[13:] = -1  # padding rows

    gx, gy = multihost.host_to_global((x, labels), mesh)
    c, t = step(gparams, gx, gy)

    ref_logits = np.asarray(vit_forward(params, jnp.asarray(x), CFG, SCHED))
    preds = ref_logits.argmax(axis=1)
    want_c = int(((preds == labels) & (labels >= 0)).sum())
    assert int(t) == 13
    assert int(c) == want_c


def test_evaluate_model_multihost_single_process(rng):
    """The full eval loop (warmup, padding, timing) on one process."""
    params = _params()
    batches = [
        (rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
         rng.integers(0, 13, size=(8,)).astype(np.int32))
        for _ in range(3)
    ]
    # partial final batch exercises _pad_local
    batches.append(
        (rng.standard_normal((5, 32, 32, 3)).astype(np.float32),
         rng.integers(0, 13, size=(5,)).astype(np.int32))
    )
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    acc, thr = multihost.evaluate_model_multihost(
        params, CFG, SCHED, batches, mesh=mesh, warmup=1
    )

    correct = total = 0
    for x, y in batches:
        logits = np.asarray(vit_forward(params, jnp.asarray(x), CFG, SCHED))
        correct += int((logits.argmax(axis=1) == y).sum())
        total += len(y)
    assert acc == pytest.approx(100.0 * correct / total)
    assert thr > 0


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_evaluate_model_multihost_device_preprocess_stage(rng):
    """The in-graph preprocessing stage (--preprocess device: uint8 H2D +
    on-chip normalize) composes with the multihost eval step — uint8
    batches shard and pad like float ones, and the result matches the
    host-normalized forward exactly (the normalize is bit-exact)."""
    from rajni_tpu.data.device import normalize_images

    params = _params()
    u8 = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 13, size=(8,)).astype(np.int32)
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)

    acc, thr = multihost.evaluate_model_multihost(
        params, CFG, SCHED, [(u8, labels)], mesh=mesh, warmup=1,
        stage=lambda x: normalize_images(x, jnp.float32),
    )
    host = np.asarray(normalize_images(jnp.asarray(u8), jnp.float32))
    logits = np.asarray(vit_forward(params, jnp.asarray(host), CFG, SCHED))
    want = 100.0 * int((logits.argmax(axis=1) == labels).sum()) / 8
    assert acc == pytest.approx(want)
    assert thr > 0


def test_multihost_eval_static_int8(rng):
    """Static int8 activation scales (trace-time constants) compose with
    the multihost eval step — the --load_scales + --distributed serving
    path. Counters must match the single-chip static-scale forward."""
    from rajni_tpu.quant import calibrate_act_scales, quantize_params

    params = _params()
    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 13, size=(8,)).astype(np.int32)
    scales = calibrate_act_scales(params, jnp.asarray(x), CFG, SCHED)
    q = quantize_params(params)

    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    acc, _ = multihost.evaluate_model_multihost(
        q, CFG, SCHED, [(x, labels)], mesh=mesh, impl="pallas",
        warmup=1, act_scales=scales,
    )
    single = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, jnp.asarray(x), CFG, SCHED, "pallas", scales
        )
    )
    want = 100.0 * int((single.argmax(axis=1) == labels).sum()) / 8
    assert acc == pytest.approx(want)


def test_initialize_rejects_partial_topology():
    """Explicit process ids without a coordinator must raise, not be
    silently discarded in favor of pod autodetection."""
    with pytest.raises(ValueError, match="coordinator_address"):
        multihost.initialize(num_processes=2)
    with pytest.raises(ValueError, match="coordinator_address"):
        multihost.initialize(process_id=0)


def test_steps_for():
    from rajni_tpu.parallel.multihost import steps_for

    # 17 rows over 2 hosts: shards 9/8, local batch 4 → 3 steps everywhere
    assert steps_for(17, 8, 2) == 3
    assert steps_for(16, 8, 2) == 2
    assert steps_for(33, 32, 2) == 2   # shards 17/16: the 33rd row costs
    assert steps_for(1, 8, 2) == 1     # a second step on BOTH hosts
    with pytest.raises(ValueError):
        steps_for(10, 7, 2)


def _run_workers(impl: str, nproc: int = 2, timeout: int = 240,
                 mode: str = "even"):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # hermetic: never touch the TPU tunnel
        WORKER_CPU_DEVICES="2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(nproc), impl,
             mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_two_process_ragged_shards(rng):
    """Unequal per-host shards (17 rows → 9/8): with num_batches from
    steps_for, the short host fabricates a zero-weight batch for the last
    collective instead of deadlocking, and the global accuracy counts all
    17 real rows exactly once."""
    outs = _run_workers("xla", mode="ragged")
    assert outs[0]["acc"] == pytest.approx(outs[1]["acc"])

    params = _params()
    data_rng = np.random.default_rng(21)
    gx = data_rng.standard_normal((17, 32, 32, 3)).astype(np.float32)
    gy = data_rng.integers(0, 13, size=(17,)).astype(np.int32)
    logits = np.asarray(vit_forward(params, jnp.asarray(gx), CFG, SCHED))
    want = 100.0 * int((logits.argmax(axis=1) == gy).sum()) / 17
    assert outs[0]["acc"] == pytest.approx(want)


def test_two_process_divergent_first_batches(rng):
    """Dataset smaller than one global batch (5 rows → first local batches
    of 3 vs 2): with the globally-agreed local_batch both hosts pad to the
    same shape instead of compiling divergent programs and deadlocking."""
    outs = _run_workers("xla", mode="tiny")
    assert outs[0]["acc"] == pytest.approx(outs[1]["acc"])

    params = _params()
    data_rng = np.random.default_rng(33)
    gx = data_rng.standard_normal((5, 32, 32, 3)).astype(np.float32)
    gy = data_rng.integers(0, 13, size=(5,)).astype(np.int32)
    logits = np.asarray(vit_forward(params, jnp.asarray(gx), CFG, SCHED))
    want = 100.0 * int((logits.argmax(axis=1) == gy).sum()) / 5
    assert outs[0]["acc"] == pytest.approx(want)


def test_cli_distributed_two_process(tmp_path):
    """End-to-end CLI: two `python -m rajni_tpu.run --distributed`
    processes form one runtime, shard the synthetic data, and report the
    same global accuracy."""
    sched = tmp_path / "sched.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rajni_tpu.run", "--distributed",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--synthetic", "3", "--batch_size", "8",
             "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
             "--warmup", "1", "--kernels", "xla", "--dtype", "float32"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    accs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"CLI worker failed:\n{out}\n{err}"
        assert "Distributed: process" in out
        line = [ln for ln in out.splitlines() if ln.startswith("RAJNI - ")]
        assert line, out
        accs.append(float(line[0].split("Accuracy: ")[1].split("%")[0]))
    assert accs[0] == pytest.approx(accs[1])


def test_cli_distributed_training_matches_single_process(tmp_path):
    """Two-process `python -m rajni_tpu.train --distributed` produces the
    same final params as a single-process run on the union of both hosts'
    batches — i.e. the cross-host gradient all-reduce is a true global
    mean, not two diverging local optimizations."""
    sched_path = tmp_path / "sched.json"
    sched_path.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    out = tmp_path / "ft.msgpack"
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rajni_tpu.train", "--distributed",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--synthetic", "--model", "vit_tiny_patch16_224",
             "--schedule", str(sched_path), "--steps", "3",
             "--batch_size", "8", "--lr", "1e-3", "--dtype", "float32",
             "--log_every", "1", "--output", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    traj = []
    for p in procs:
        o, e = p.communicate(timeout=240)
        assert p.returncode == 0, f"train worker failed:\n{o}\n{e}"
        traj.append([
            float(ln.split("loss")[1].split()[0])
            for ln in o.splitlines() if ln.startswith("step")
        ])
    assert len(traj[0]) == 3
    # both controllers see the same replicated global loss every step
    assert traj[0] == pytest.approx(traj[1])
    assert out.exists()

    # single-process reference: the same global batch (concat of both
    # hosts' seed-derived slices), same init, same optimizer
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.params.io import load_params
    from rajni_tpu.train import create_train_state, make_train_step
    from rajni_tpu.utils.schedule import load_schedule

    cfg = get_config("vit_tiny_patch16_224")
    sched = load_schedule(str(sched_path), cfg.depth)
    parts = []
    for pid in range(2):
        r = np.random.default_rng(0 + 100003 * pid)
        parts.append((
            r.standard_normal((4, cfg.img_size, cfg.img_size, 3))
            .astype(np.float32),
            r.integers(0, cfg.num_classes, 4).astype(np.int32),
        ))
    gx = np.concatenate([p[0] for p in parts])
    gy = np.concatenate([p[1] for p in parts])

    params0 = init_params(jax.random.key(0), cfg, jnp.float32)
    state, tx = create_train_state(params0, 1e-3, 0.05)
    step = jax.jit(make_train_step(cfg, sched, tx))
    ref_traj = []
    for _ in range(3):
        state, metrics = step(state, jnp.asarray(gx), jnp.asarray(gy))
        ref_traj.append(float(metrics["loss"]))
    # the whole LOSS TRAJECTORY must match the single-process run on the
    # union batch: local-only (unsynced) training would diverge from the
    # global-mean trajectory after the very first update
    assert traj[0] == pytest.approx(ref_traj, abs=1e-3)

    # Param parity is asserted leaf-wise at two scales. Leaves with real
    # gradient signal must match tightly; a blanket bit-tolerance is NOT
    # available because Adam normalizes away gradient magnitude — for
    # parameters whose true gradient is ~0 (e.g. the K third of the qkv
    # bias: shifting K by a constant is softmax-invariant) the "gradient"
    # is pure fp noise and the update is lr-scale noise whose SIGN flips
    # with reduction order. Bound those by the Adam noise scale lr*steps.
    got = load_params(str(out))
    lr_scale = 1e-3 * 3
    for key in ("head", "patch_embed", "cls_token", "pos_embed"):
        for w, g in zip(jax.tree_util.tree_leaves(state.params[key]),
                        jax.tree_util.tree_leaves(got[key])):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=5e-5, rtol=1e-3)
    for w, g in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(got)):
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < lr_scale


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_two_process_eval_agrees_with_reference(rng, impl):
    """Real cross-process collectives: both controllers report identical
    global accuracy, equal to a single-process forward over the union of
    both hosts' local data (same seeds as the worker)."""
    outs = _run_workers(impl)
    assert outs[0]["devices"] == 4  # 2 processes x 2 virtual devices
    assert outs[0]["acc"] == pytest.approx(outs[1]["acc"])

    # reference: replay the worker's deterministic dataset on one process
    params = _params()
    data_rng = np.random.default_rng(7)
    batches = [
        (data_rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
         data_rng.integers(0, 13, size=(8,)).astype(np.int32))
        for _ in range(3)
    ]
    batches.append(
        (data_rng.standard_normal((6, 32, 32, 3)).astype(np.float32),
         data_rng.integers(0, 13, size=(6,)).astype(np.int32))
    )
    correct = total = 0
    for x, y in batches:
        logits = np.asarray(vit_forward(params, jnp.asarray(x), CFG, SCHED))
        correct += int((logits.argmax(axis=1) == y).sum())
        total += len(y)
    assert outs[0]["acc"] == pytest.approx(100.0 * correct / total)
