"""Online-serving load test: the dynamic-batching tier under concurrency.

Closed-loop clients (each submits one image, waits for its logits, repeats)
drive a :class:`rajni_tpu.serving.BatchingEngine` over an exported
multi-bucket artifact at several concurrency levels. Reports, per level:
sustained request throughput, p50/p99 request latency, and the mean
coalesced device batch — the curve that justifies the batching window
(single-image clients approach large-batch chip throughput as offered load
rises, with latency bounded by ``--delay_ms`` + one device call).

Run:  python scripts/bench_serving_load.py [--buckets 8,32]
          [--levels 1,4,16,64] [--secs 10] [--delay_ms 5]
Prints one JSON line; recorded rows live in BENCH_SERVING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rajni_tpu.export import export_model, load_exported
from rajni_tpu.models.vit import get_config, init_params
from rajni_tpu.serving import BatchingEngine
from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE


def run_level(engine: BatchingEngine, crop: np.ndarray,
              concurrency: int, secs: float) -> dict:
    before = engine.stats.snapshot()
    stop_at = time.perf_counter() + secs
    lat_ms: list[float] = []
    lock = threading.Lock()

    def client() -> None:
        local = []
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            engine.submit(crop).result()
            local.append((time.perf_counter() - t0) * 1e3)
        with lock:
            lat_ms.extend(local)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    after = engine.stats.snapshot()
    arr = np.asarray(lat_ms)
    batches = after["batches"] - before["batches"]
    return {
        "concurrency": concurrency,
        "req_s": round(arr.size / elapsed, 1),
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p99_ms": round(float(np.percentile(arr, 99)), 2),
        "mean_batch": round(
            (after["requests"] - before["requests"]) / max(batches, 1), 2
        ),
        "n": int(arr.size),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--buckets", default="8,32",
                    help="multi-bucket artifact batch sizes")
    ap.add_argument("--levels", default="1,4,16,64",
                    help="closed-loop client counts to sweep")
    ap.add_argument("--secs", type=float, default=10.0,
                    help="measured wall-clock per level")
    ap.add_argument("--delay_ms", type=float, default=5.0)
    ap.add_argument("--artifact", default=None,
                    help="pre-exported .rajni (skips the export)")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    cfg = get_config(args.model)
    buckets = [int(b) for b in args.buckets.split(",")]
    rng = np.random.default_rng(0)
    crop = rng.integers(0, 256, (cfg.img_size, cfg.img_size, 3), np.uint8)

    with tempfile.TemporaryDirectory() as td:
        path = args.artifact
        if path is None:
            params = init_params(jax.random.key(0), cfg, jnp.bfloat16)
            path = os.path.join(td, "m.rajni")
            export_model(path, params, cfg, REFERENCE_SCHEDULE, buckets,
                         jnp.bfloat16, platform="tpu" if on_tpu else "cpu")
        engine = BatchingEngine(load_exported(path),
                                max_delay_ms=args.delay_ms)
        t0 = time.perf_counter()
        engine.warmup()
        warm_s = time.perf_counter() - t0
        levels = [
            run_level(engine, crop, c, args.secs)
            for c in (int(x) for x in args.levels.split(","))
        ]
        engine.stop()

    print(json.dumps({
        "config": (f"{args.model} schedule.json buckets {buckets} "
                   f"delay {args.delay_ms}ms "
                   f"{'tpu' if on_tpu else jax.default_backend()}"),
        "warmup_s": round(warm_s, 1),
        "levels": levels,
    }))


if __name__ == "__main__":
    main()
