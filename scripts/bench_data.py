"""Host data-pipeline throughput: can the loader feed the chip?

The TPU numbers in BENCH_SUITE.json time the forward only (reference
protocol, eval.py:51-59 — H2D excluded), but a production deployment is
loader-bound the moment host decode+preprocess falls below the chip's
img/s. This measures that ceiling on the host CPU: JPEG decode + resize +
crop (+ normalize) through the real `ImageFolder`/`DataLoader`, across
worker counts and the three preprocessing tiers:

  float32  — full host path: decode, bicubic resize, crop, normalize
             (native C++ resampler, GIL-free; RAJNI_NATIVE=0 falls back
             to PIL fixed-point)
  uint8    — decode + resize + crop only; normalize runs ON DEVICE
             (`--preprocess device`), 4x less H2D too
  canvas   — decode-only host (`--preprocess device-full`); resample
             happens in-graph

Pure host benchmark — runs anywhere, no TPU needed. Writes/merges
BENCH_DATA.json rows keyed on (tier, workers).

Usage: python scripts/bench_data.py [--images 256] [--px 400]
           [--workers 1,8,16] [--out BENCH_DATA.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_dataset(root: str, n: int, px: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        os.makedirs(os.path.join(root, cls), exist_ok=True)
    for i in range(n):
        cls = "ab"[i % 2]
        h = px + int(rng.integers(-px // 4, px // 4))
        w = px + int(rng.integers(-px // 4, px // 4))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(
            os.path.join(root, cls, f"{i}.jpg"), quality=85
        )


def main() -> None:
    ap = argparse.ArgumentParser("rajni-tpu host data-pipeline benchmark")
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--px", type=int, default=400,
                    help="nominal source image size (±25% jitter)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=str, default="1,8,16")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="merge rows into this JSON artifact")
    args = ap.parse_args()

    from rajni_tpu.data.pipeline import DataLoader, ImageFolder
    from rajni_tpu.data.native import load as load_native

    native = load_native() is not None
    rows = []
    with tempfile.TemporaryDirectory() as td:
        print(f"synthesizing {args.images} ~{args.px}px JPEGs...",
              file=sys.stderr)
        _make_dataset(td, args.images, args.px)

        for tier in ("float32", "uint8", "canvas"):
            dataset = ImageFolder(td, img_size=224, output=tier)
            for w in [int(x) for x in args.workers.split(",") if x]:
                loader = DataLoader(dataset, batch_size=args.batch,
                                    num_workers=w)
                best = 0.0
                for _ in range(args.repeats):
                    t0 = time.time()
                    n = 0
                    for im, _lb in loader:
                        # canvas tier yields (canvas, sizes) tuples
                        n += (im[0] if isinstance(im, tuple) else im).shape[0]
                    best = max(best, n / max(time.time() - t0, 1e-9))
                row = {
                    "tier": tier,
                    "workers": w,
                    "img_per_s": round(best, 1),
                    "native": native and tier != "canvas",
                    # worker scaling is meaningless without cores to scale
                    # onto — record the host so the artifact is honest;
                    # px/batch/images join the merge key below so rows
                    # from different workloads never silently mix
                    "host_cores": os.cpu_count(),
                    "px": args.px,
                    "batch": args.batch,
                    "images": args.images,
                }
                rows.append(row)
                print(json.dumps(row))

    if args.out:
        old = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                old = json.load(f)
        def key(r):
            return (r.get("tier"), r.get("workers"), r.get("px"),
                    r.get("batch"), r.get("images"))

        keys = {key(r) for r in rows}
        merged = [r for r in old if key(r) not in keys] + rows
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=1)
        os.replace(tmp, args.out)
        print(f"merged -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
