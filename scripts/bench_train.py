"""Training-step throughput benchmark: img/s through forward+backward+AdamW.

Training is a capability extension (the reference is inference-only —
SURVEY.md §5), so there is no reference protocol to mirror; this uses the
same measurement discipline as bench.py: fenced timing loops
(`rajni_tpu.utils.timing.fence` — block_until_ready alone returns at enqueue
on the axon relay), back-to-back dispatches fenced once per loop, best of
``--repeats``. Unlike the forward bench the steps CHAIN (each consumes the
previous state), so the final fence transitively completes the whole loop.

Prints one JSON line per schedule row and writes/merges ``--out``
(BENCH_TRAIN.json). Rows: pruned (schedule.json) and unpruned base, plus
their ratio — fine-tuning *through* a pruning schedule should enjoy the same
token-work saving as serving.

Usage (real chip):
  PYTHONPATH=/root/.axon_site python scripts/bench_train.py \
      [--model vit_base_patch16_224] [--batch 128] [--dtype bfloat16] \
      [--iters 10] [--out BENCH_TRAIN.json]

Batch default is 128 (not the eval bench's 256): the un-rematerialized
backward keeps every block's activations live, ~2× the forward's footprint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser("rajni-tpu training-step benchmark")
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--iters", type=int, default=10,
                   help="chained steps per timing loop")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--remat", action="store_true",
                   help="per-block jax.checkpoint in the backward "
                        "(the train CLI's --remat)")
    p.add_argument("--drop_path", type=float, default=0.0,
                   help="stochastic depth rate (the train CLI's "
                        "--drop_path); measures the regularizer's "
                        "step-time cost")
    p.add_argument("--kernels", default="xla", choices=["xla", "pallas"],
                   help="student forward engine (the train CLI's "
                        "--kernels): 'pallas' = fused training kernels "
                        "with residual-fed XLA backward")
    p.add_argument("--out", default=None,
                   help="merge rows into this JSON artifact (by config key)")
    p.add_argument("--probe_timeout", type=int, default=600,
                   help="backend-init watchdog seconds (0 disables)")
    args = p.parse_args()

    from rajni_tpu.utils.backend_probe import probe_backend_init

    err = probe_backend_init(args.probe_timeout)
    if err:
        log(f"FATAL: {err}")
        sys.exit(2)

    import jax
    import jax.numpy as jnp

    from rajni_tpu.models.vit import get_config, init_params, model_stats
    from rajni_tpu.train import TrainState, build_optimizer, make_train_step
    from rajni_tpu.utils.flops import train_mfu
    from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE, normalize_schedule
    from rajni_tpu.utils.timing import fence

    log(f"devices: {jax.devices()}")
    config = get_config(args.model)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(jax.random.key(0), config, dtype)
    images = jax.random.normal(
        jax.random.key(1),
        (args.batch, config.img_size, config.img_size, 3), dtype,
    )
    labels = jax.random.randint(
        jax.random.key(2), (args.batch,), 0, config.num_classes
    )

    def measure(schedule) -> float:
        tx = build_optimizer(args.lr, total_steps=10_000)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        # no donation: each timing loop restarts from the same live state
        step = jax.jit(
            make_train_step(config, schedule, tx, remat=args.remat,
                            drop_path=args.drop_path, impl=args.kernels)
        )
        for _ in range(2):  # compile + cache warmup
            state, metrics = step(state, images, labels)
        fence((metrics, state.params["head"]["kernel"]))
        best = 0.0
        for _ in range(max(1, args.repeats)):
            s = state
            t0 = time.time()
            for _ in range(args.iters):
                s, metrics = step(s, images, labels)
            # steps chain through s, so fencing the last one completes all
            fence((metrics, s.params["head"]["kernel"]))
            best = max(best, args.iters * args.batch
                       / max(time.time() - t0, 1e-9))
        return best

    if args.kernels == "pallas":
        from rajni_tpu.models.train_path import train_kernels_supported

        ok, why = train_kernels_supported(
            config, REFERENCE_SCHEDULE, dtype
        )
        if not ok:
            log(f"FATAL: --kernels pallas unsupported here: {why}")
            sys.exit(2)

    sched = normalize_schedule(REFERENCE_SCHEDULE, config.depth)
    log("compiling + measuring pruned train step (schedule.json)...")
    pruned = measure(sched)
    log(f"pruned: {pruned:.1f} img/s")
    log("compiling + measuring unpruned train step...")
    base = measure(None)
    log(f"base: {base:.1f} img/s")

    trace = model_stats(config, sched)["token_counts"]
    row = {
        "config": f"{args.model}_train_schedulejson"
                  + ("_remat" if args.remat else "")
                  + ("_droppath" if args.drop_path else "")
                  + ("_kernels" if args.kernels == "pallas" else ""),
        "batch": args.batch,
        "dtype": args.dtype,
        "img_per_s": round(pruned, 1),
        "base_img_per_s": round(base, 1),
        "speedup": round(pruned / base, 4),
        # conventional 3x-forward accounting (utils/flops.train_mfu);
        # remat recompute deliberately unbilled
        "mfu": round(train_mfu(config, trace, pruned), 4),
        "base_mfu": round(train_mfu(config, None, base), 4),
        "protocol": "fwd+bwd+adamw per step, chained, fenced per loop, "
                     f"best of {args.repeats}x{args.iters}",
    }
    print(json.dumps(row))

    if args.out:
        rows = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                rows = json.load(f)
        rows = [r for r in rows if r.get("config") != row["config"]
                or r.get("dtype") != row["dtype"]
                or r.get("batch") != row["batch"]] + [row]
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rows, f, indent=1)
        os.replace(tmp, args.out)
        log(f"merged -> {args.out}")


if __name__ == "__main__":
    main()
