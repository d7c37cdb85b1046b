"""Worker process for tests/test_multihost.py (not a pytest module).

Each of N processes runs this script with its own ``process_id``; together
they form one JAX multi-controller runtime over CPU devices with gloo
collectives — real cross-process collectives, no TPU pod required
(SURVEY.md §4's "multi-chip without a cluster" trick, extended to
multi-HOST). Prints one JSON line with the global eval results; the
parent test asserts every process agrees and matches a single-process
reference.

Run: python tests/multihost_worker.py PORT PROCESS_ID NUM_PROCESSES IMPL
(env must carry JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_
device_count=K, PALLAS_AXON_POOL_IPS= before the interpreter starts —
sitecustomize registers the TPU plugin at startup).
"""

import json
import sys


def main() -> None:
    port, pid, nproc, impl = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "even"

    import os

    import jax

    # Before the first backend init (sitecustomize may have imported jax
    # already, but backend creation is lazy): CPU platform, K virtual
    # devices per process.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", int(os.environ.get("WORKER_CPU_DEVICES", "2"))
    )

    from rajni_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", num_processes=nproc,
                         process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from rajni_tpu.models.vit import ViTConfig, init_params
    from rajni_tpu.utils.schedule import normalize_schedule

    assert jax.process_count() == nproc, jax.process_count()

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=3,
                    num_heads=4, mlp_ratio=2.0, num_classes=13)
    sched = normalize_schedule({1: {"keep_ratio": 0.7}}, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.float32)

    # Deterministic global dataset; each process slices its own rows.
    # Final batch is partial (global 6 of 8) to exercise label-padding.
    rng = np.random.default_rng(7)
    global_batches = [
        (rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
         rng.integers(0, 13, size=(8,)).astype(np.int32))
        for _ in range(3)
    ]
    gx, gy = rng.standard_normal((6, 32, 32, 3)).astype(np.float32), \
        rng.integers(0, 13, size=(6,)).astype(np.int32)
    global_batches.append((gx, gy))

    def local_slices():
        for x, y in global_batches:
            b = x.shape[0]
            lo = (b * pid) // nproc
            hi = (b * (pid + 1)) // nproc
            yield x[lo:hi], y[lo:hi]

    mesh = multihost.global_mesh()
    num_batches = None
    local_batch = None
    if mode == "tiny":
        # dataset smaller than one global batch: 5 rows over 2 hosts gives
        # FIRST batches of 3 vs 2 — without the globally-agreed
        # local_batch, each host would infer a different padded shape and
        # the controllers' programs diverge (deadlock)
        n, local_batch = 5, 4
        rng2 = np.random.default_rng(33)
        gx = rng2.standard_normal((n, 32, 32, 3)).astype(np.float32)
        gy = rng2.integers(0, 13, size=(n,)).astype(np.int32)
        shard_x, shard_y = gx[pid::nproc], gy[pid::nproc]

        def local_slices():  # noqa: F811 — deliberate mode override
            yield shard_x, shard_y

        num_batches = multihost.steps_for(n, local_batch * nproc, nproc)
        assert num_batches == 1, num_batches
    if mode == "ragged":
        # the unequal-shard case: 17 rows interleaved over 2 hosts gives
        # shards of 9 and 8 → host 0 yields 3 local batches of ≤4, host 1
        # only 2; steps_for makes BOTH run 3 steps (host 1 fabricates a
        # zero-weight batch for the last collective)
        n, global_b = 17, 4 * nproc
        rng2 = np.random.default_rng(21)  # fresh seed: easy test replay
        gx = rng2.standard_normal((n, 32, 32, 3)).astype(np.float32)
        gy = rng2.integers(0, 13, size=(n,)).astype(np.int32)
        shard_x, shard_y = gx[pid::nproc], gy[pid::nproc]
        local_b = global_b // nproc

        def local_slices():  # noqa: F811 — deliberate mode override
            for lo in range(0, len(shard_y), local_b):
                yield shard_x[lo:lo + local_b], shard_y[lo:lo + local_b]

        num_batches = multihost.steps_for(n, global_b, nproc)
        assert num_batches == 3, num_batches

    acc, thr = multihost.evaluate_model_multihost(
        params, cfg, sched, list(local_slices()), mesh=mesh, impl=impl,
        warmup=1, num_batches=num_batches, local_batch=local_batch,
    )
    print(json.dumps({"pid": pid, "acc": acc, "thr": round(thr, 3),
                      "devices": len(jax.devices())}), flush=True)


if __name__ == "__main__":
    main()
