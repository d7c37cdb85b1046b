"""Profile one training step per engine (xla / pallas kernels) and print
the top device-op costs — the attribution tool behind the train-side
landmarks (VERDICT r3 #2/#3).

Runs a few steps under ``jax.profiler.trace`` (the device profiler works
through the axon tunnel — read the ``/device:TPU:0`` events) and
aggregates XLA-op durations by name prefix.

Usage:
    PYTHONPATH=.:/root/.axon_site python scripts/profile_train.py \
        [--kernels pallas] [--schedule] [--batch 128] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kernels", default="xla", choices=["xla", "pallas"])
    p.add_argument("--schedule", action="store_true",
                   help="profile the pruned (schedule.json) step instead "
                        "of the stock one")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--dir", default="/tmp/rajni_train_prof")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rajni_tpu.models.vit import get_config, init_params
    from rajni_tpu.train import TrainState, build_optimizer, make_train_step
    from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE, normalize_schedule
    from rajni_tpu.utils.timing import fence

    config = get_config(args.model)
    sched = (normalize_schedule(REFERENCE_SCHEDULE, config.depth)
             if args.schedule else None)
    params = init_params(jax.random.key(0), config, jnp.bfloat16)
    images = jax.random.normal(
        jax.random.key(1),
        (args.batch, config.img_size, config.img_size, 3), jnp.bfloat16,
    )
    labels = jax.random.randint(
        jax.random.key(2), (args.batch,), 0, config.num_classes
    )
    tx = build_optimizer(1e-4, total_steps=10_000)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(
        make_train_step(config, sched, tx, impl=args.kernels)
    )
    for _ in range(2):
        state, metrics = step(state, images, labels)
    fence((metrics, state.params["head"]["kernel"]))

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        for _ in range(3):
            state, metrics = step(state, images, labels)
        fence((metrics, state.params["head"]["kernel"]))

    # newest trace file
    traces = sorted(glob.glob(
        os.path.join(args.dir, "plugins/profile/*/*.trace.json.gz")
    ), key=os.path.getmtime)
    if not traces:
        print("no trace captured", file=sys.stderr)
        sys.exit(1)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: names like "/device:TPU:0"
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_train_step") or name.isdigit():
            # whole-program envelopes (the bare-numeric names are the
            # per-step module executions) double-count their inner ops
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        # collapse numeric suffixes only: "fusion.123" -> "fusion"
        parts = name.rsplit(".", 1)
        base = parts[0] if len(parts) == 2 and parts[1].isdigit() else name
        agg[base] += dur
        total += dur
    print(f"# engine={args.kernels} schedule={args.schedule} "
          f"batch={args.batch} — total device time {total:.1f} ms "
          f"over 3 steps")
    for name, ms in agg.most_common(args.top):
        print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
