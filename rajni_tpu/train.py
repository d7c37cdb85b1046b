"""Training step for RAJNI-ViT (capability extension; the reference is
inference-only — `/root/reference/rajni/eval.py:6` `@torch.no_grad()`).

Provided so the framework covers fine-tuning a ViT *through* the pruning
schedule: the forward is fully differentiable (top-k index selection is
piecewise-constant — gradients flow through the gathered values, the standard
straight-through treatment for token selection), so a model can be adapted to
its deployment schedule.

Pure-functional: ``TrainState`` is a pytree; ``make_train_step`` returns a
jittable ``(state, images, labels) -> (state, metrics)`` suitable for
``jax.jit`` over a device mesh (DP batch + TP params — see
:mod:`rajni_tpu.parallel.mesh`).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .models.vit import ViTConfig, vit_forward
from .utils.schedule import Schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def create_train_state(
    params: Any, learning_rate: float = 1e-4, weight_decay: float = 0.05
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def make_train_step(
    config: ViTConfig,
    schedule: Schedule | None,
    tx: optax.GradientTransformation,
):
    """Build the full train step: forward (with pruning) → loss → grad →
    optimizer update. ``config``/``schedule`` are static closures."""

    def loss_fn(params, images, labels):
        logits = vit_forward(params, images, config, schedule)
        loss = cross_entropy(logits, labels)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    def train_step(state: TrainState, images, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, labels
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return train_step
