"""Test configuration: run everything on a simulated 8-device CPU mesh.

SURVEY.md §4: JAX's standard multi-chip-without-a-cluster trick —
``--xla_force_host_platform_device_count=8`` gives pjit/shard_map tests 8
virtual CPU devices; Pallas kernels run with ``interpret=True``. Env vars must
be set before the first ``import jax`` anywhere in the test process, which is
why this lives at the top of conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
