"""Classify images with a pruned RAJNI ViT — minimal end-to-end example.

    # one-time: convert pretrained timm weights
    python -m rajni_tpu.params.convert vit_b16_timm.pth vit_b16.msgpack

    python examples/classify.py --checkpoint vit_b16.msgpack \
        --schedule schedule.json cat.jpg dog.jpg

Without ``--checkpoint`` random weights are used (pipeline demo only).
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running straight from a checkout: python examples/classify.py ...
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax.numpy as jnp
import numpy as np

from rajni_tpu import RAJNIViT, get_config
from rajni_tpu.data.pipeline import preprocess
from rajni_tpu.utils.schedule import load_schedule


def main() -> None:
    p = argparse.ArgumentParser("rajni-tpu image classification")
    p.add_argument("images", nargs="+", help="image files")
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--schedule", default=None, help="pruning schedule JSON")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--top", type=int, default=5)
    args = p.parse_args()

    config = get_config(args.model)
    schedule = (
        load_schedule(args.schedule, config.depth) if args.schedule else None
    )

    if args.checkpoint:
        from rajni_tpu.params.io import load_params

        params = load_params(args.checkpoint, dtype=jnp.bfloat16)
    else:
        import jax

        from rajni_tpu import init_params

        print("WARNING: no --checkpoint; random weights (pipeline demo only)")
        params = init_params(jax.random.key(0), config, jnp.bfloat16)
    if args.quantize:
        from rajni_tpu.quant import quantize_params

        params = quantize_params(params)

    model = RAJNIViT(config, schedule, params=params)
    print(f"token counts: {model.get_last_stats()['token_counts']}")

    from PIL import Image

    batch = np.stack([
        preprocess(Image.open(f).convert("RGB"), config.img_size)
        for f in args.images
    ])
    logits = np.asarray(model(jnp.asarray(batch)), np.float32)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    for f, pr in zip(args.images, probs):
        top = np.argsort(-pr)[: args.top]
        pairs = ", ".join(f"class {i}: {pr[i]:.3f}" for i in top)
        print(f"{f}: {pairs}")


if __name__ == "__main__":
    main()
