"""Headline benchmark: ViT-B/16 + reference schedule.json throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": <pruned img/s>, "unit": "img/s",
   "vs_baseline": <pruned / unpruned speedup on the same chip>}

Protocol mirrors the reference measurement definition (BASELINE.md): timed
region is the forward only, device-fenced per timing loop (the JAX
equivalent of `torch.cuda.synchronize` bracketing,
/root/reference/rajni/eval.py:51-59 — per-batch fencing through the TPU
tunnel costs ~40 ms of host round trip, so the fence brackets each loop of
back-to-back forwards instead; same forward-only quantity, no tunnel
artifact); batch 256 (reference run.py:23 default); bf16 inference dtype;
best-of-3 loops (shared-chip variance ±5-10%).

Env overrides: RAJNI_BENCH_BATCH, RAJNI_BENCH_ITERS, RAJNI_BENCH_MODEL,
RAJNI_BENCH_DTYPE, RAJNI_BENCH_KERNELS (xla|pallas), RAJNI_BENCH_QUANT=1,
RAJNI_BENCH_CALIBRATE=1 (static-scale PTQ int8, with QUANT=1)
(int8 MLP + attention-projection weights with dynamic activation
quantization — opt-in, changes numerics; see rajni_tpu/quant.py).
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import get_config, init_params, vit_forward
from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE, normalize_schedule
from rajni_tpu.utils.timing import measure_throughput


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    batch = int(os.environ.get("RAJNI_BENCH_BATCH", "256"))
    iters = int(os.environ.get("RAJNI_BENCH_ITERS", "20"))
    model = os.environ.get("RAJNI_BENCH_MODEL", "vit_base_patch16_224")
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("RAJNI_BENCH_DTYPE", "bfloat16")
    ]
    impl = os.environ.get("RAJNI_BENCH_KERNELS", "pallas")
    quant = os.environ.get("RAJNI_BENCH_QUANT", "0") == "1"
    calibrate = os.environ.get("RAJNI_BENCH_CALIBRATE", "0") == "1"

    # Backend-init watchdog: a wedged TPU tunnel hangs jax.devices() forever
    # (CLAUDE.md "axon tunnel wedge") — fail the bench cleanly instead.
    # RAJNI_BENCH_PROBE_TIMEOUT=0 disables.
    from rajni_tpu.utils.backend_probe import probe_backend_init

    err = probe_backend_init(
        int(os.environ.get("RAJNI_BENCH_PROBE_TIMEOUT", "600"))
    )
    if err:
        log(f"FATAL: {err}")
        sys.exit(2)

    log(f"devices: {jax.devices()}")
    config = get_config(model)
    schedule = normalize_schedule(REFERENCE_SCHEDULE, config.depth)
    params = init_params(jax.random.key(0), config, dtype)
    images = jax.device_put(
        jax.random.normal(
            jax.random.key(1), (batch, config.img_size, config.img_size, 3), dtype
        )
    )
    base_scales = pruned_scales = None
    if calibrate and not quant:
        log("WARNING: RAJNI_BENCH_CALIBRATE=1 without RAJNI_BENCH_QUANT=1 "
            "is ignored (static scales are an int8 mode)")
    if quant:
        from rajni_tpu.quant import quantize_params

        if calibrate and impl == "xla":
            # the xla route ignores act_scales by contract (fully
            # dynamic) — skip the calibration forwards and the label
            log("WARNING: RAJNI_BENCH_CALIBRATE=1 has no effect on the "
                "xla route (it stays fully dynamic); skipping calibration")
            calibrate = False
        if calibrate:
            # Static-scale PTQ (RAJNI_BENCH_CALIBRATE=1, with QUANT=1):
            # per-schedule scales, calibrated pre-quantization on the bench
            # batch itself (random data — the scales match the measured run).
            from rajni_tpu.quant import calibrate_act_scales

            base_scales = calibrate_act_scales(params, images, config, None)
            pruned_scales = calibrate_act_scales(params, images, config,
                                                 schedule)
            log("calibrated static int8 activation scales "
                "(RAJNI_BENCH_CALIBRATE=1)")
        raw_params = params  # keep the bf16 weights for the xla_base row
        params = quantize_params(params)
        log("int8-quantized weights (RAJNI_BENCH_QUANT=1)")
    fwd = jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))

    log(f"compiling + measuring base (identity schedule, {impl})...")
    base = measure_throughput(fwd, params, images, config, None, impl,
                              base_scales, iters=iters)
    log(f"base: {base:.1f} img/s")

    log(f"compiling + measuring pruned (schedule.json, {impl})...")
    pruned = measure_throughput(fwd, params, images, config, schedule, impl,
                                pruned_scales, iters=iters)
    log(f"pruned: {pruned:.1f} img/s")

    record = {
        "metric": f"{model} images/sec/chip with schedule.json "
        f"(batch {batch}, {jnp.dtype(dtype).name})",
        "value": round(pruned, 1),
        "unit": "img/s",
        "vs_baseline": round(pruned / base, 4),
    }
    if quant:
        # disambiguate recorded artifacts: a static-scale run is a
        # different numerics mode than dynamic int8 or bf16
        record["quant"] = "int8-static" if calibrate else "int8-dynamic"

    if impl != "xla":
        # Self-contained north-star ratio (VERDICT r2 weak #4): vs_baseline
        # above is pruned vs the SAME implementation's unpruned base; the
        # "≥2×" target is against the plain-XLA-ops unpruned forward — the
        # faithful stand-in for "stock timm on this chip". Measure it in the
        # same run so the recorded artifact carries both ratios.
        log("compiling + measuring XLA-ops unpruned base (north-star "
            "denominator)...")
        # the denominator is the BF16 stock-timm stand-in: with QUANT=1
        # the quantized tree would pay a per-call dequantize on the xla
        # route and run an int8 head — a slower, numerics-different
        # forward that silently inflates the recorded ratio
        xla_base = measure_throughput(
            fwd, raw_params if quant else params, images, config, None,
            "xla", iters=iters,
        )
        log(f"xla base: {xla_base:.1f} img/s")
        record["base_img_per_s"] = round(base, 1)
        record["xla_base_img_per_s"] = round(xla_base, 1)
        record["vs_xla_base"] = round(pruned / xla_base, 4)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
