"""Test configuration: run everything on a simulated 8-device CPU mesh.

SURVEY.md §4: JAX's standard multi-chip-without-a-cluster trick — 8 virtual
CPU devices let pjit/shard_map tests cover real mesh shardings with no TPU;
Pallas kernels run with ``interpret=True``.

Note: this environment's ``sitecustomize`` imports jax at interpreter start
(to register the TPU tunnel backend), so ``JAX_PLATFORMS``/``XLA_FLAGS`` env
vars are already consumed by the time conftest runs — the config must be set
through ``jax.config.update`` instead, *before* the first backend
initialization (which is lazy).
"""

import os

# Still set the env for the case where jax was NOT pre-imported.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
