"""Convenience object API mirroring the reference's ``RAJNIViTWrapper``.

The functional core (:func:`rajni_tpu.models.vit.vit_forward`) is the real
API; this class packages (config, schedule, params, backend) the way the
reference packages (timm model, pruning_schedule) —
`/root/reference/rajni/wrapper/model.py:6-28` — so reference users find the
same call shape:

    model = RAJNIViT("vit_base_patch16_224", schedule, params=params)
    logits = model(images)            # jitted, cached per input shape
    model.get_last_stats()            # {"token_counts": [...]}

Unlike the reference, stats need no forward pass (token counts are static),
but ``get_last_stats`` keeps the call-after-forward contract anyway
(model.py:25-28).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from ..utils.schedule import Schedule, normalize_schedule
from .vit import ViTConfig, get_config, init_params, model_stats, vit_forward


class RAJNIViT:
    """ViT with schedule-driven RAJNI token pruning (object wrapper)."""

    def __init__(
        self,
        model: str | ViTConfig = "vit_base_patch16_224",
        schedule: Mapping | Sequence | Schedule | None = None,
        params: Any = None,
        dtype: jnp.dtype = jnp.bfloat16,
        kernels: str = "auto",
        seed: int = 0,
    ):
        self.config = model if isinstance(model, ViTConfig) else get_config(model)
        self.schedule = normalize_schedule(schedule, self.config.depth)
        if params is None:
            params = init_params(jax.random.key(seed), self.config, dtype)
        else:
            # extended-variant checkpoints (qk-norm / pooled head /
            # registers) carry their semantics in the tree, not the name
            from .vit import adapt_config_to_params

            self.config = adapt_config_to_params(self.config, params)
        self.params = params
        # "auto" resolves per-batch at trace time (vit.resolve_impl).
        self.impl = kernels
        self._fwd = jax.jit(
            functools.partial(
                vit_forward,
                config=self.config,
                schedule=self.schedule,
                impl=self.impl,
            )
        )

    def __call__(self, images: jax.Array) -> jax.Array:
        """``[B, H, W, 3] -> [B, num_classes]`` logits."""
        return self._fwd(self.params, images)

    def get_last_stats(self) -> dict:
        """Per-block entry token counts (reference model.py:25-28, 68)."""
        return model_stats(self.config, self.schedule)
