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


def measure_throughput(fn, *args, iters: int = 20, warmup: int = 3,
                       batch: int | None = None, repeats: int = 3) -> float:
    """Best-of-``repeats`` throughput of ``fn(*args)`` in items/sec.

    Shared by bench.py and scripts/bench_suite.py so the measurement
    protocol cannot drift: ``warmup`` fenced calls, then ``repeats`` timing
    loops of ``iters`` back-to-back dispatches fenced once at the end (the
    per-loop fence is a host round trip through the TPU tunnel, so fencing
    per *loop* rather than per call measures forward-only wall time without
    the tunnel artifact — see bench.py's protocol note).
    """
    import time

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if batch is None:
        # infer only from the fn(params, images, ...) convention; guessing
        # 1 for anything else silently misreports throughput by a factor
        # of the real batch
        if len(args) > 1 and hasattr(args[1], "shape") and args[1].ndim:
            batch = args[1].shape[0]
        else:
            raise ValueError(
                "cannot infer the batch size from args — pass batch="
            )
    for _ in range(warmup):
        fence(fn(*args))
    best = 0.0
    for _ in range(max(1, repeats)):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        best = max(best, iters * batch / max(time.time() - t0, 1e-9))
    return best
