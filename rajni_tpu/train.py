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


def main(argv=None):
    """Fine-tuning CLI: adapt a ViT to its deployment pruning schedule.

    ``python -m rajni_tpu.train --synthetic --steps 100 --schedule s.json``

    Capability extension over the inference-only reference: trains *through*
    the static pruning schedule so the network adapts to the token budget it
    will be served with, then saves a checkpoint loadable by the eval CLI.
    """
    import argparse

    import numpy as np

    from .models.vit import get_config, init_params
    from .utils.schedule import load_schedule

    p = argparse.ArgumentParser("RAJNI-TPU fine-tuning")
    p.add_argument("--data_path", type=str, default=None,
                   help="ImageFolder training root")
    p.add_argument("--synthetic", action="store_true",
                   help="Train on synthetic data (pipeline smoke/benchmark)")
    p.add_argument("--model", type=str, default="vit_base_patch16_224")
    p.add_argument("--schedule", type=str, default=None,
                   help="Pruning schedule JSON to train through")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Initial params (msgpack/orbax); random if absent")
    p.add_argument("--output", type=str, default="rajni_finetuned.msgpack")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Param dtype (fp32 default: optimizer stability)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    config = get_config(args.model)
    schedule = (
        load_schedule(args.schedule, config.depth) if args.schedule else None
    )
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16

    if args.checkpoint:
        from .params.io import load_params

        params = load_params(args.checkpoint, dtype=dtype)
    else:
        params = init_params(jax.random.key(args.seed), config, dtype)

    state, tx = create_train_state(params, args.lr, args.weight_decay)
    step_fn = jax.jit(make_train_step(config, schedule, tx),
                      donate_argnums=(0,))

    if args.synthetic or args.data_path is None:
        if args.data_path is None and not args.synthetic:
            raise ValueError("provide --data_path or --synthetic")
        rng = np.random.default_rng(args.seed)
        images = rng.standard_normal(
            (args.batch_size, config.img_size, config.img_size, 3)
        ).astype(np.float32)
        labels = rng.integers(
            0, config.num_classes, args.batch_size
        ).astype(np.int32)

        def batches():
            while True:
                yield images, labels
        batch_iter = batches()
    else:
        from .data.pipeline import DataLoader, ImageFolder

        dataset = ImageFolder(args.data_path, img_size=config.img_size)
        loader = DataLoader(dataset, batch_size=args.batch_size)
        print(f"training on {len(dataset)} images, "
              f"{len(dataset.classes)} classes")

        def batches():
            while True:
                for im, lb in loader:
                    if im.shape[0] == args.batch_size:  # static shapes only
                        yield im, lb.astype(np.int32)
        batch_iter = batches()

    for step in range(1, args.steps + 1):
        im, lb = next(batch_iter)
        state, metrics = step_fn(state, jnp.asarray(im), jnp.asarray(lb))
        if step % args.log_every == 0 or step == args.steps:
            print(f"step {step:6d}  loss {float(metrics['loss']):.4f}  "
                  f"acc {float(metrics['accuracy']):.3f}")

    from .params.io import save_params

    save_params(args.output, state.params)
    print(f"saved fine-tuned params -> {args.output}")
    return state


if __name__ == "__main__":
    main()
