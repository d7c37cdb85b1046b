"""Pipeline-parallel inference demo (GPipe over a ``(data, pipe)`` mesh).

Runs anywhere: on a TPU pod slice the mesh spans real chips; on a dev
machine, force an 8-device virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/pipeline_inference.py

Pipeline parallelism exists for ViTs whose bf16 weights exceed one chip's
HBM (ViT-22B class: 48 blocks x C=6144 is ~44 GB vs 16 GB HBM on v5e).
Each chip holds ONLY its stage's blocks; activations hop stage-to-stage
over ICI via collective-permute; the whole microbatch schedule is a single
compiled XLA program. Token pruning composes — per-stage token counts are
compile-time constants of the schedule.
"""

import os
import sys

# allow running straight from a checkout: python examples/pipeline_inference.py
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import jax
import jax.numpy as jnp

from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.parallel.pipeline import make_pipe_mesh, pipeline_forward
from rajni_tpu.utils.schedule import normalize_schedule


def main():
    n = len(jax.devices())
    pipe = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    mesh = make_pipe_mesh(pipe=pipe)
    print(f"devices={n} mesh=(data={n // pipe}, pipe={pipe})")

    # A small stand-in config (depth divisible by the pipe axis, heads by
    # the TP demo's model=2). For a real over-HBM model, point get_config
    # at e.g. a 48-block giant instead.
    config = ViTConfig(
        img_size=224, patch_size=16, embed_dim=192, depth=12, num_heads=4,
    )
    schedule = normalize_schedule(
        {3: {"keep_ratio": 0.95}, 4: {"keep_ratio": 0.95},
         5: {"keep_ratio": 0.85}, 6: {"keep_ratio": 0.85},
         7: {"keep_ratio": 0.95}},
        config.depth,
    )
    params = init_params(jax.random.key(0), config)

    apply = pipeline_forward(params, config, schedule, mesh, microbatch=2 * pipe)
    images = np.random.default_rng(0).standard_normal(
        (16, config.img_size, config.img_size, 3)
    ).astype(np.float32)

    logits = np.asarray(apply(images))
    want = np.asarray(vit_forward(params, jnp.asarray(images), config, schedule))
    print(f"logits {logits.shape}; max |pipelined - single-device| = "
          f"{np.abs(logits - want).max():.2e}")
    m = apply.n_micro
    print(f"GPipe utilization M/(M+S-1) = {m}/{m + pipe - 1} = "
          f"{m / (m + pipe - 1):.2f}")

    # 3-D composition: Megatron TP inside every stage — each chip then
    # holds only its stage's blocks AND only its head/hidden shard of them.
    if n % (2 * pipe) == 0 and config.num_heads % 2 == 0:
        mesh3 = make_pipe_mesh(pipe=pipe, model=2)
        apply3 = pipeline_forward(
            params, config, schedule, mesh3, microbatch=2 * pipe
        )
        got3 = np.asarray(apply3(images))
        print(f"(data={mesh3.shape['data']}, pipe={pipe}, model=2): "
              f"max |PP+TP - single-device| = {np.abs(got3 - want).max():.2e}")


if __name__ == "__main__":
    main()
