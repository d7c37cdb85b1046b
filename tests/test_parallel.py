"""Mesh sharding on the simulated 8-device CPU mesh (SURVEY.md §4 item 4):
DP+TP forward matches single-device; eval counters reduce correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.parallel.mesh import (
    eval_step_fn,
    make_mesh,
    shard_params,
    sharded_forward,
)
from rajni_tpu.utils.schedule import normalize_schedule

TINY = ViTConfig(
    img_size=32, patch_size=16, embed_dim=32, depth=3, num_heads=4, num_classes=10
)
SCHED = normalize_schedule({1: {"keep_ratio": 0.5}}, TINY.depth)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    params = init_params(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (16, 32, 32, 3))
    return params, x


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4)])
def test_dp_tp_matches_single_device(setup, data, model):
    params, x = setup
    want = np.asarray(vit_forward(params, x, TINY, SCHED))
    mesh = make_mesh(data=data, model=model)
    apply = sharded_forward(params, TINY, SCHED, mesh)
    got = np.asarray(apply(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_param_placement(setup):
    params, _ = setup
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh)
    qkv = sharded["blocks"][0]["attn"]["qkv"]["kernel"]
    # column-parallel: output dim split over 2 model chips
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 48)}  # [C, 3C/2]
    proj = sharded["blocks"][0]["attn"]["proj"]["kernel"]
    assert {s.data.shape for s in proj.addressable_shards} == {(16, 32)}


def test_eval_step_counters(setup):
    params, x = setup
    mesh = make_mesh(data=8, model=1)
    step = eval_step_fn(TINY, SCHED, mesh)
    sharded = shard_params(params, mesh)
    logits = vit_forward(params, x, TINY, SCHED)
    labels_right = jnp.argmax(logits, axis=-1)
    labels_wrong = (labels_right + 1) % TINY.num_classes

    correct, total = step(sharded, x, labels_right)
    assert int(correct) == 16 and int(total) == 16
    correct, total = step(sharded, x, labels_wrong)
    assert int(correct) == 0 and int(total) == 16


def test_dp_pallas_shard_map_matches_single_device(setup):
    """DP with the Pallas backend goes through shard_map (per-chip kernels
    on local batch shards) and must match the single-device forward."""
    params, x = setup
    want = np.asarray(vit_forward(params, x, TINY, SCHED, "xla"))
    mesh = make_mesh(data=8, model=1)
    apply = sharded_forward(params, TINY, SCHED, mesh, impl="pallas")
    got = np.asarray(apply(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tp_with_pallas_rejected(setup):
    params, _ = setup
    mesh = make_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="tensor parallelism"):
        sharded_forward(params, TINY, SCHED, mesh, impl="pallas")


def test_dp_with_quantized_params(setup):
    """shard_map DP forward works with int8-quantized params (records are
    pytree leaves that replicate like any other weight)."""
    from rajni_tpu.quant import quantize_params

    params, x = setup
    qparams = quantize_params(params)
    want = np.asarray(vit_forward(qparams, x, TINY, SCHED, "pallas"))
    mesh = make_mesh(data=8, model=1)
    apply = sharded_forward(qparams, TINY, SCHED, mesh, impl="pallas")
    got = np.asarray(apply(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
