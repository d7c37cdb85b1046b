"""Serving-path throughput: exported StableHLO artifact vs live forward.

The AOT export (rajni_tpu.export) bakes params + schedule + fused kernels
into a self-contained artifact; this measures that the *serving* path (no
Python model code, no retracing) runs at the same per-chip throughput as
the live jitted forward — i.e. export costs nothing at inference time.

Run:  python scripts/bench_serving.py [--batch 256] [--iters 20]
Prints one JSON line with live and artifact img/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rajni_tpu.export import export_model, load_exported
from rajni_tpu.models.vit import get_config, init_params, vit_forward
from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE, normalize_schedule
from rajni_tpu.utils.timing import measure_throughput


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    impl = "pallas" if on_tpu else "xla"
    cfg = get_config(args.model)
    sched = normalize_schedule(REFERENCE_SCHEDULE, cfg.depth)
    params = init_params(jax.random.key(0), cfg, jnp.bfloat16)
    images = jax.random.normal(
        jax.random.key(1), (args.batch, cfg.img_size, cfg.img_size, 3),
        jnp.bfloat16,
    )

    fwd = jax.jit(vit_forward, static_argnums=(2, 3, 4))
    live = measure_throughput(fwd, params, images, cfg, sched, impl,
                              iters=args.iters)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.rajni")
        export_model(path, params, cfg, REFERENCE_SCHEDULE, args.batch,
                     jnp.bfloat16, impl,
                     platform="tpu" if on_tpu else "cpu")
        size_mb = os.path.getsize(path) / 1e6
        serve = load_exported(path)

        def served(_p, imgs, *_static):
            return serve(imgs)

        artifact = measure_throughput(served, None, images, cfg, sched,
                                      impl, iters=args.iters)

    print(json.dumps({
        "config": f"{args.model} schedule.json batch {args.batch} {impl}",
        "live_img_per_s": round(live, 1),
        "artifact_img_per_s": round(artifact, 1),
        "artifact_vs_live": round(artifact / live, 4),
        "artifact_mb": round(size_mb, 1),
    }))


if __name__ == "__main__":
    main()
