"""Visualize which patches a pruning schedule keeps, block by block.

    python examples/token_map.py --schedule schedule.json cat.jpg
    python examples/token_map.py --schedule schedule.json \
        --checkpoint vit_b16.msgpack cat.jpg   # real selections

Prints one ASCII patch grid per pruned block ('#' = token kept at that
block's entry, '.' = already dropped) plus the per-block token counts —
the reference exposes only the counts (`get_last_stats`); the *identity*
of the surviving tokens comes from `rajni_tpu.vit_token_trace`.

Without ``--checkpoint`` random weights still demonstrate the mechanism
(the selection then reflects random scores, not semantics).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from rajni_tpu import get_config, init_params, vit_token_trace
from rajni_tpu.data.pipeline import preprocess
from rajni_tpu.utils.schedule import load_schedule, normalize_schedule


def main() -> None:
    p = argparse.ArgumentParser("RAJNI kept-token visualization")
    p.add_argument("image", help="image file")
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--schedule", required=True, help="pruning schedule JSON")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    config = get_config(args.model)
    schedule = load_schedule(args.schedule, config.depth)
    if args.checkpoint:
        from rajni_tpu import adapt_config_to_params
        from rajni_tpu.params.io import load_params

        params = load_params(args.checkpoint)
        config = adapt_config_to_params(config, params)
    else:
        params = init_params(jax.random.key(0), config)
        print("NOTE: random weights — selections are not semantic")

    from PIL import Image

    with Image.open(args.image) as im:
        x = preprocess(im.convert("RGB"), config.img_size)
    masks, _ = vit_token_trace(
        params, jnp.asarray(x[None]), config, schedule
    )
    g = config.grid_size
    pre = config.num_prefix_tokens
    norm = normalize_schedule(schedule, config.depth)
    counts = [int(m[0].sum()) for m in masks[:-1]]
    print(f"{args.model}: token_counts {counts}")
    for i, spec in enumerate(norm):
        if spec is None:
            continue
        # entry of block i+1 shows the effect of block i's selection
        patch = np.asarray(masks[i + 1][0, pre:]).reshape(g, g)
        kept = int(patch.sum())
        print(f"\nblock {i} (keep_ratio {spec.keep_ratio}): "
              f"{kept}/{g * g} patches after selection")
        for row in patch:
            print("".join("#" if v else "." for v in row))


if __name__ == "__main__":
    main()
