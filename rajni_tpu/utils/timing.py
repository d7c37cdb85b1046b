"""Device-synchronization fence for wall-clock timing.

The reference brackets its timed region with ``torch.cuda.synchronize``
(`/root/reference/rajni/eval.py:51-59`). The JAX equivalent is nominally
``jax.block_until_ready`` — but on some TPU runtimes (observed on the axon
loopback relay used in this environment) ``block_until_ready`` returns as soon
as the execution is *enqueued*, not completed, which silently inflates
throughput numbers by ~1000×. Pulling a data-dependent scalar to the host is
the only fence that provably waits for the computation, on every runtime.

``fence`` therefore does both: ``block_until_ready`` (correct and cheap on
conforming runtimes) plus a one-element host read of each leaf (forces
completion everywhere; ~µs of transfer).
"""

from __future__ import annotations

import jax
import numpy as np


def fence(tree) -> None:
    """Block the host until every array in ``tree`` has finished computing."""
    tree = jax.block_until_ready(tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            # A 1-element, data-dependent host pull: completes only after the
            # producing computation has fully executed.
            np.asarray(jax.device_get(leaf.ravel()[:1]))
