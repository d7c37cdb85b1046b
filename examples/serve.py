"""Minimal serving loop from an exported artifact — no model code needed.

One-time, on a dev machine (params + schedule + fused kernels baked in):

    python -m rajni_tpu.export vit_b16.msgpack vit_b16.rajni \
        --model vit_base_patch16_224 --schedule schedule.json --batch 32

Then this process only needs the artifact (and jax):

    python examples/serve.py vit_b16.rajni img1.jpg img2.jpg ...

Images are host-decoded to uint8 crops and normalized ON DEVICE
(`rajni_tpu.data.device.normalize_images` — 4× less H2D than fp32), the
exported StableHLO computation runs without retracing, and top-5 class
indices print per image. Without an artifact on disk, pass --demo to build
a throwaway random-weight artifact first (pipeline demo only).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("rajni-tpu serving example")
    ap.add_argument("artifact", help="path to a .rajni export")
    ap.add_argument("images", nargs="*", help="image files to classify")
    ap.add_argument("--demo", action="store_true",
                    help="create a random-weight artifact at ARTIFACT first")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from rajni_tpu.data.device import normalize_images
    from rajni_tpu.data.pipeline import preprocess_u8
    from rajni_tpu.export import load_exported

    if args.demo and not os.path.exists(args.artifact):
        import jax

        from rajni_tpu.export import export_model
        from rajni_tpu.models.vit import get_config, init_params

        cfg = get_config("vit_base_patch16_224")
        params = init_params(jax.random.key(0), cfg, jnp.bfloat16)
        export_model(
            args.artifact, params, cfg,
            schedule={3: {"keep_ratio": 0.7}},
            batch=max(len(args.images), 4),  # > len(images) exercises padding
            platform="cpu" if jax.default_backend() == "cpu" else "tpu",
        )
        print(f"(demo) exported random-weight artifact -> {args.artifact}")

    serve = load_exported(args.artifact)
    # the artifact is resolution-pinned; batch is pinned unless it was
    # exported with --batch dynamic (then any request size runs unpadded)
    img_size = serve.input_spec.shape[1]
    in_dtype = serve.input_spec.dtype

    crops = []
    for path in args.images:
        from PIL import Image

        with Image.open(path) as im:
            crops.append(preprocess_u8(im.convert("RGB"), img_size))
    if not crops:
        print("no images given; exiting")
        return
    n = len(crops)
    if getattr(serve, "buckets", None):
        pass  # multi-bucket artifact: pads/chunks internally, slices back
    elif not serve.dynamic_batch:
        spec_batch = serve.input_spec.shape[0]
        if len(crops) > spec_batch:
            raise SystemExit(
                f"artifact was exported with batch {spec_batch}; got "
                f"{len(crops)} images — re-export with a larger --batch, "
                "a bucket list (--batch 8,32,256), or --batch dynamic"
            )
        while len(crops) < spec_batch:  # pad to the baked batch, slice below
            crops.append(np.zeros_like(crops[0]))
    batch_u8 = jnp.asarray(np.stack(crops))
    # normalize on-device, fused ahead of the exported computation
    logits = np.asarray(serve(normalize_images(batch_u8, in_dtype)))[:n]
    for path, row in zip(args.images, logits.astype(np.float32)):
        top5 = np.argsort(row)[::-1][:5]
        print(f"{path}: top-5 classes {top5.tolist()}")


if __name__ == "__main__":
    main()
