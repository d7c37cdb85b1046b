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

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.vit import ViTConfig, vit_forward
from .utils.schedule import Schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Mean CE in fp32; ``label_smoothing`` mixes the one-hot target with
    the uniform distribution: ``t = (1−s)·onehot + s/K`` — the standard ViT
    fine-tuning regularizer (the ``-s·mean(logp)`` term below is that
    mixture's cross entropy, algebraically, without materializing ``t``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing:
        s = float(label_smoothing)
        nll = (1.0 - s) * nll - s * logp.mean(axis=-1)
    return nll.mean()


def create_train_state(
    params: Any, learning_rate: Any = 1e-4, weight_decay: float = 0.05
) -> tuple[TrainState, optax.GradientTransformation]:
    """``learning_rate`` may be a float or any optax schedule callable."""
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


class EmaState(NamedTuple):
    """Optimizer-state slot holding the EMA of the parameters.

    Living inside ``opt_state`` (rather than a new ``TrainState`` field)
    keeps every existing surface working unchanged: ``save_train_state``
    persists it, ``--resume`` restores it onto the template and continues
    the EMA trajectory exactly, and sharded runs inherit the params'
    placements because ``tx.init`` copies the (already-placed) param tree.
    """

    ema: Any


def ema_tracker(decay: float) -> optax.GradientTransformation:
    """Track ``ema = decay·ema + (1−decay)·params`` after each update.

    Chained AFTER the optimizer core so it observes the final updates; a
    pass-through for the updates themselves. Under ``optax.MultiSteps``
    the inner chain commits once per ``grad_accum`` micro-steps, so the
    EMA advances per real parameter update — the standard semantics
    (capability extension; the reference is inference-only, SURVEY.md §5).
    Retrieve the tree with :func:`get_ema_params`.
    """

    def init(params):
        # fp32 accumulator regardless of the param dtype: with
        # decay=0.9999 the per-update increment (1e-4)·(p − e) is below
        # half a bf16 ulp of e, so a bf16-stored EMA would round every
        # update away and freeze at its initial value. Also a REAL copy,
        # not an alias (`+ 0`): the train steps donate the TrainState
        # (donate_argnums=(0,)), and an aliased leaf would put the same
        # buffer in the donation list twice ("Attempt to donate the same
        # buffer twice"); astype is the identity when params are already
        # fp32. Sharding is preserved either way.
        return EmaState(jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32) + 0, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("ema_tracker requires params in tx.update")
        new_params = optax.apply_updates(params, updates)
        d = jnp.asarray(decay)
        ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p.astype(jnp.float32),
            state.ema, new_params,
        )
        return updates, EmaState(ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state: Any, like: Any = None) -> Any:
    """Pull the EMA param tree out of a (possibly nested) optimizer state.

    Walks tuples/NamedTuples (``optax.chain`` states are tuples;
    ``optax.MultiSteps``' state is a NamedTuple whose ``inner_opt_state``
    holds the chain) and returns the first :class:`EmaState`'s tree, or
    ``None`` when the optimizer was built without ``ema``. The stored
    tree is the fp32 accumulator; pass ``like`` (the live param tree) to
    get it cast leaf-wise to the params' dtypes — the form to evaluate
    or checkpoint so the EMA weights run/store exactly like the raw ones.
    """
    tree = _find_ema(opt_state)
    if tree is None or like is None:
        return tree
    return jax.tree_util.tree_map(
        lambda e, p: e.astype(p.dtype), tree, like
    )


def _find_ema(opt_state: Any) -> Any:
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):
        for s in opt_state:
            found = _find_ema(s)
            if found is not None:
                return found
    return None


def layer_decay_factors(params: Any, decay: float) -> Any:
    """Per-leaf update multipliers for layer-wise LR decay (LLRD).

    The standard ViT fine-tuning scheme (timm's ``layer_decay``): the head
    and final norm train at the full LR, block ``i`` at
    ``decay^(depth - i)``, and the embedding leaves (patch-embed, CLS /
    register / dist tokens, pos-embed) at ``decay^(depth + 1)`` — early
    layers hold general features and should move least. Returns a tree
    with the params' structure whose leaves are scalar factors.
    """
    depth = len(params["blocks"])
    top = depth + 1

    def fill(tree, f):
        return jax.tree_util.tree_map(lambda _: f, tree)

    embed_keys = {"patch_embed", "cls_token", "pos_embed", "reg_token",
                  "dist_token"}
    factors = {}
    for k, v in params.items():
        if k == "blocks":
            factors[k] = [
                fill(b, decay ** (top - (i + 1))) for i, b in enumerate(v)
            ]
        elif k in embed_keys:
            factors[k] = fill(v, decay ** top)
        else:  # head / head_dist / norm / fc_norm: full LR
            factors[k] = fill(v, 1.0)
    return factors


def layer_decay_factors_stacked(ptree: Any, decay: float) -> Any:
    """LLRD factors for a PIPELINE-stacked tree (:func:`rajni_tpu.parallel.
    pipeline.stack_params`): same schedule as :func:`layer_decay_factors`,
    but each ``blocks`` leaf is ``[depth, ...]`` so the per-block scalars
    become one broadcastable ``[depth, 1, ...]`` column per leaf — the
    per-block factors were never blocked by the stacking (VERDICT r3 #5),
    they just needed the array form. Embed leaves take ``decay^(depth+1)``,
    head/norm 1.0, exactly like the canonical layout."""
    depth = jax.tree_util.tree_leaves(ptree["blocks"])[0].shape[0]
    top = depth + 1
    col = np.asarray(
        [decay ** (top - (i + 1)) for i in range(depth)], np.float32
    )

    def per_block(leaf):
        return jnp.asarray(col).reshape((depth,) + (1,) * (leaf.ndim - 1))

    def fill(tree, f):
        return jax.tree_util.tree_map(lambda _: f, tree)

    return {
        "embed": fill(ptree["embed"], decay ** top),
        "blocks": jax.tree_util.tree_map(per_block, ptree["blocks"]),
        "head": fill(ptree["head"], 1.0),
    }


def scale_updates_by_tree(factors: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by its factor — chained AFTER the
    optimizer core, this is exactly per-group LR (AdamW's update is
    ``lr·(normalized grad + wd·param)``, so post-scaling by ``f`` equals
    running that group at ``lr·f``, weight decay included)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        scaled = jax.tree_util.tree_map(
            lambda u, f: u * jnp.asarray(f, u.dtype), updates, factors
        )
        return scaled, state

    return optax.GradientTransformation(init, update)


def _schedule_ticks(
    total_steps: int, warmup_steps: int, grad_accum: int
) -> tuple[int, int]:
    """Convert micro-step horizons to optimizer-update ticks (the unit the
    LR schedule actually counts in under ``optax.MultiSteps``, which commits
    the inner state — including the schedule count — once per
    ``grad_accum`` micro-steps)."""
    if grad_accum <= 1:
        return total_steps, warmup_steps
    decay = max(1, total_steps // grad_accum)
    warm = max(1, warmup_steps // grad_accum) if warmup_steps > 0 else 0
    return decay, warm


def build_optimizer(
    learning_rate: float,
    total_steps: int,
    weight_decay: float = 0.05,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    grad_accum: int = 1,
    grad_clip: float = 0.0,
    ema: float = 0.0,
    layer_decay: float = 0.0,
    params: Any = None,
    pp_stacked: bool = False,
) -> optax.GradientTransformation:
    """AdamW with the standard fine-tuning knobs.

    - ``lr_schedule="cosine"``: linear warmup for ``warmup_steps`` then cosine
      decay to 0 at ``total_steps``; ``"constant"``: optional linear warmup,
      then flat. The schedule step lives in the optimizer state, so
      :func:`load_train_state` resumes mid-schedule exactly.
    - ``grad_accum=K`` wraps the update in ``optax.MultiSteps``: parameters
      move once every K ``train_step`` calls on the mean of the K gradients —
      a K× effective batch without K× activation memory. The step counter
      still counts micro-steps. ``total_steps``/``warmup_steps`` are ALSO
      micro-step-denominated: MultiSteps advances the inner schedule count
      only on real updates (once per K micro-steps), so the horizons are
      converted to update ticks here — without the conversion a cosine run
      with K=4 would end at ~0.9·peak instead of 0.
    - ``grad_clip > 0`` rescales the whole gradient tree when its global
      L2 norm exceeds the threshold (``optax.clip_by_global_norm``),
      applied BEFORE AdamW so the clipped gradient is what feeds the
      moment estimates, and inside MultiSteps' inner chain so with
      ``grad_accum`` the clip sees the K-step MEAN gradient (the
      effective-batch gradient), not each micro-gradient.
    - ``ema > 0`` appends :func:`ema_tracker` with that decay: the
      optimizer state carries an exponential moving average of the
      parameters (updated once per real update, so per K micro-steps
      under ``grad_accum``); extract with :func:`get_ema_params`.
    - ``layer_decay`` in (0, 1) enables layer-wise LR decay
      (:func:`layer_decay_factors` — requires ``params`` for the factor
      tree, built from the CANONICAL layout before any TP repack; the
      factor tree's structure matches either layout). For pipeline
      training pass the STACKED tree with ``pp_stacked=True``
      (:func:`layer_decay_factors_stacked` — per-block factors as a
      broadcastable column over the stacked depth axis).
    """
    decay_ticks, warm_ticks = _schedule_ticks(
        total_steps, warmup_steps, grad_accum
    )
    if lr_schedule == "cosine":
        lr: Any = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warm_ticks,
            decay_steps=max(decay_ticks, warm_ticks + 1),
        )
    elif warm_ticks > 0:
        lr = optax.linear_schedule(0.0, learning_rate, warm_ticks)
    else:
        lr = learning_rate
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if grad_clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if layer_decay > 0.0:
        if params is None:
            raise ValueError("layer_decay requires the params tree")
        mk = layer_decay_factors_stacked if pp_stacked \
            else layer_decay_factors
        tx = optax.chain(
            tx, scale_updates_by_tree(mk(params, layer_decay))
        )
    if ema > 0.0:
        tx = optax.chain(tx, ema_tracker(ema))
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def save_train_state(
    path: str, state: TrainState, backend: str = "msgpack"
) -> None:
    """Atomically persist the FULL train state — params, optimizer moments,
    step counter — for crash-safe mid-training checkpoints.

    Capability extension: the reference persists nothing at all (SURVEY.md
    §5 — weights re-fetched from timm's hub every run,
    `/root/reference/rajni/run.py:89-92`). A production fine-tuning run needs
    to survive preemption, so the optimizer state (Adam's first/second
    moments) is saved alongside the params; restoring params alone would
    restart the moment estimates and perturb the trajectory.

    Written as ``path + ".tmp"`` then ``os.replace``d so a crash mid-write
    never corrupts the previous good checkpoint.

    ``backend="orbax"`` writes an Orbax checkpoint DIRECTORY instead:
    sharded arrays stream per-array instead of staging the whole tree
    through one host buffer — required for over-HBM pipeline states, whose
    params + two Adam moments can exceed host memory as a single msgpack
    blob. (Orbax's atomicity is its own finalize step.)
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), state, force=True)
        return
    if backend != "msgpack":
        raise ValueError(f"unknown train-state backend {backend!r}")
    from flax import serialization

    host = jax.device_get(state)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host))
    os.replace(tmp, path)


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a train state saved by :func:`save_train_state`.

    Args:
      path: the state file.
      template: a freshly built :class:`TrainState` for the SAME model,
        optimizer, and parallelism configuration. Its leaf shardings dictate
        placement — a pipeline-stacked template restores straight onto the
        ``pipe`` mesh — and its dtypes are authoritative (the restored values
        are cast, so a run resumed under a different ``--dtype`` stays
        consistent with its compiled program).

    Raises:
      ValueError: when a restored leaf's shape disagrees with the template —
        the usual cause is resuming with different model/schedule/parallelism
        flags than the run that saved the state.

    Directories (Orbax saves, ``backend="orbax"``) are auto-detected;
    Orbax restores sharded leaves straight to their template placements,
    never staging the full tree on one host.
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            abstract = jax.tree_util.tree_map(
                lambda t: (
                    jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=t.sharding)
                    if isinstance(t, jax.Array) else t
                ),
                template,
            )
            restored = ckptr.restore(os.path.abspath(path), abstract)

        def _uncommit(t, x):
            # mirror the msgpack path's committedness semantics (see below)
            if isinstance(t, jax.Array) and not getattr(t, "committed", False):
                return jnp.asarray(np.asarray(x), t.dtype)
            return x

        return jax.tree_util.tree_map(_uncommit, template, restored)
    from flax import serialization

    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())

    def _place(t, x):
        if not isinstance(t, jax.Array):
            return x
        if tuple(t.shape) != tuple(np.shape(x)):
            raise ValueError(
                f"train-state leaf shape {np.shape(x)} does not match the "
                f"template's {tuple(t.shape)} — was the state saved with "
                f"different --model/--schedule/--pipeline_parallel/"
                f"--tensor_parallel flags?"
            )
        if getattr(t, "committed", False):
            # explicitly placed template leaf (e.g. pipeline-stacked params
            # device_put onto the pipe mesh) — restore onto the same sharding
            return jax.device_put(jnp.asarray(x, t.dtype), t.sharding)
        # uncommitted leaf (fresh jnp array, like Adam's step counter):
        # leave it uncommitted too, so jit stays free to place it — a forced
        # single-device put here would conflict with mesh-sharded arguments
        return jnp.asarray(x, t.dtype)

    return jax.tree_util.tree_map(_place, template, restored)


# Domain tags folded into each batch-mixing stream so none collides with
# the augmentation stream, which draws from fold_in(key(seed), step):
# without a tag, step s's mixup key would be byte-identical to step s±1's
# augment key (the same threefry bit stream), the key reuse JAX's PRNG
# design forbids — and the three mixing draws (mixup lam, cutmix lam+box,
# the mode switch) must be mutually independent too.
_MIXUP_TAG = 0x6D697875   # "mixu"
_CUTMIX_TAG = 0x63757478  # "cutx"
_SWITCH_TAG = 0x73776368  # "swch"
_DROPPATH_TAG = 0x64707468  # "dpth" — the stochastic-depth mask stream


def mixup_lam(seed: int, step: jax.Array, alpha: float) -> jax.Array:
    """The per-step mixup coefficient ``lam ~ Beta(alpha, alpha)``.

    Derived in-graph from ``(seed, step)`` under a mixup-specific domain
    tag — like the augmentation stream, a resumed run replays the
    identical coefficients with no RNG state to checkpoint, and the two
    streams are statistically independent."""
    k = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(seed), _MIXUP_TAG), step
    )
    return jax.random.beta(k, alpha, alpha)


def cutmix_mask_and_lam(
    key: jax.Array, height: int, width: int, alpha: float
) -> tuple[jax.Array, jax.Array]:
    """CutMix box sampling — timm's ``rand_bbox`` + ``correct_lam``
    semantics, transcribed to static-shape in-graph ops (the reference
    repo is inference-only; this matches timm/data/mixup.py, the training
    recipe its checkpoints come from).

    Draws ``lam_raw ~ Beta(alpha, alpha)``, cuts a box of side
    ``int(dim · sqrt(1 − lam_raw))`` centered at a uniform pixel, clipped
    to the image (timm uses ``cy ± cut//2`` on both edges, reproduced
    exactly incl. the integer truncations), and returns the ``[H, W]``
    bool mask of the box plus the area-corrected
    ``lam = 1 − box_area/(H·W)`` — the label weight must reflect the box
    actually pasted after clipping, not the raw draw.

    Data-dependent box coordinates stay inside ``jnp.where`` comparisons
    against iotas, so every shape is compile-time static (TPU rule: no
    dynamic slicing on traced bounds).
    """
    k_lam, k_cy, k_cx = jax.random.split(key, 3)
    lam_raw = jax.random.beta(k_lam, alpha, alpha)
    ratio = jnp.sqrt(1.0 - lam_raw)
    cut_h = jnp.floor(height * ratio).astype(jnp.int32)  # timm: int(H·r)
    cut_w = jnp.floor(width * ratio).astype(jnp.int32)
    cy = jax.random.randint(k_cy, (), 0, height)
    cx = jax.random.randint(k_cx, (), 0, width)
    yl = jnp.clip(cy - cut_h // 2, 0, height)
    yh = jnp.clip(cy + cut_h // 2, 0, height)
    xl = jnp.clip(cx - cut_w // 2, 0, width)
    xh = jnp.clip(cx + cut_w // 2, 0, width)
    iy = jnp.arange(height)[:, None]
    ix = jnp.arange(width)[None, :]
    mask = (iy >= yl) & (iy < yh) & (ix >= xl) & (ix < xh)
    lam = 1.0 - ((yh - yl) * (xh - xl)).astype(jnp.float32) / float(
        height * width
    )
    return mask, lam


def apply_batch_mix(
    images: jax.Array,
    seed: int,
    step: jax.Array,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    switch_prob: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Apply the configured batch mixing (mixup / CutMix / the per-step
    switch between them) and return ``(mixed_images, lam)``.

    Every draw is a pure function of ``(seed, step)`` under a
    stream-specific domain tag, so ``--resume`` replays the identical
    mixing decisions with no RNG state to checkpoint. With both alphas
    active, each step flips ``Bernoulli(switch_prob)`` for CutMix vs
    mixup — timm's batch-mode behavior. Images are NHWC; the pairing is
    always the batch against its own reverse. ``lam`` weights the
    two-term loss (:func:`mixed_cross_entropy`); for CutMix it is the
    area-corrected value. Shared by the plain and pipeline train steps.
    """
    lam_m = (
        mixup_lam(seed, step, mixup_alpha) if mixup_alpha > 0.0 else None
    )
    cut = lam_c = None
    if cutmix_alpha > 0.0:
        h, w = int(images.shape[1]), int(images.shape[2])
        k = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(seed), _CUTMIX_TAG), step
        )
        mask, lam_c = cutmix_mask_and_lam(k, h, w, cutmix_alpha)
        cut = jnp.where(mask[None, :, :, None], images[::-1], images)
    if mixup_alpha > 0.0 and cutmix_alpha > 0.0:
        u = jax.random.uniform(
            jax.random.fold_in(
                jax.random.fold_in(jax.random.key(seed), _SWITCH_TAG), step
            )
        )
        use_cut = u < switch_prob
        return (
            jnp.where(use_cut, cut, mix_images(images, lam_m)),
            jnp.where(use_cut, lam_c, lam_m),
        )
    if cutmix_alpha > 0.0:
        return cut, lam_c
    if mixup_alpha > 0.0:
        return mix_images(images, lam_m), lam_m
    return images, jnp.float32(1.0)


def mix_images(images: jax.Array, lam: jax.Array) -> jax.Array:
    """Mixup's image blend: ``lam·x + (1−lam)·reverse(x)`` — timm's
    pairing of the batch with its own reverse (shared by the plain and
    pipeline train steps so the semantics cannot drift apart)."""
    lam = lam.astype(images.dtype)
    return lam * images + (1.0 - lam) * images[::-1]


def mixed_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    lam: jax.Array,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mixup's loss: the ``lam``-weighted cross entropy against both
    halves of the pairing (labels and reversed labels), each optionally
    label-smoothed."""
    return lam * cross_entropy(logits, labels, label_smoothing) + (
        1.0 - lam
    ) * cross_entropy(logits, labels[::-1], label_smoothing)


def distillation_loss(
    dist_logits: jax.Array,
    teacher_logits: jax.Array,
    kind: str = "hard",
    tau: float = 1.0,
) -> jax.Array:
    """DeiT's distillation term (facebookresearch/deit losses.py — the
    training recipe behind the reference's ``deit_*_distilled`` weights).

    ``hard``: cross entropy of the dist head against the teacher's argmax
    — the paper's headline variant (their Table 5 shows it beats soft).
    ``soft``: ``τ² · KL(softmax(teacher/τ) ‖ softmax(student/τ))``, summed
    then divided by ``numel`` (= mean over batch·classes — the DeiT
    repo's exact normalization, reproduced deliberately: it scales the
    term down by num_classes relative to a per-sample mean).
    """
    if kind == "hard":
        return cross_entropy(dist_logits, jnp.argmax(teacher_logits, -1))
    t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / tau, -1)
    s = jax.nn.log_softmax(dist_logits.astype(jnp.float32) / tau, -1)
    kl_sum = jnp.sum(jnp.exp(t) * (t - s))
    return (tau * tau) * kl_sum / dist_logits.size


def make_train_step(
    config: ViTConfig,
    schedule: Schedule | None,
    tx: optax.GradientTransformation,
    label_smoothing: float = 0.0,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    switch_prob: float = 0.5,
    seed: int = 0,
    remat: bool = False,
    drop_path: float = 0.0,
    distill: tuple | None = None,
    teacher_params=None,
    impl: str = "xla",
    dp_mesh=None,
):
    """Build the full train step: forward (with pruning) → loss → grad →
    optimizer update. ``config``/``schedule`` are static closures.

    ``remat`` wraps each block in ``jax.checkpoint``
    (:func:`rajni_tpu.models.vit.vit_forward`'s flag): the backward pass
    recomputes block internals instead of holding all of them live, so
    batch sizes that OOM un-rematerialized fit — at ~⅓ extra forward
    FLOPs. Identical math, measured numbers in BENCH_TRAIN.json.

    ``mixup_alpha``/``cutmix_alpha`` enable batch mixing
    (:func:`apply_batch_mix`): every draw is a pure in-graph function of
    ``(seed, state.step)`` so ``--resume`` replays it exactly; with both
    active each step switches CutMix vs mixup at ``switch_prob`` (timm's
    batch mode). The loss is the lam-weighted cross entropy against both
    label sets; the reported ``accuracy`` is against the unmixed labels
    (diagnostic only under mixing).

    ``drop_path`` enables stochastic depth in the forward
    (:func:`rajni_tpu.models.vit.vit_forward`'s flag, timm linspace
    schedule): the per-step mask key derives in-graph from
    ``(seed, state.step)`` under a drop-path domain tag, so ``--resume``
    replays the identical drop decisions and the stream never collides
    with the augment/mixing keys.

    ``distill`` — ``(kind, alpha, tau, teacher_cfg)`` with
    ``teacher_params`` — enables DeiT-style knowledge distillation: the
    student's dist head (or its single head for plain configs — the
    "usual distillation" fallback) is supervised against a frozen
    teacher's logits on the SAME (augmented/mixed) batch, combined as
    ``(1−α)·base + α·distill`` (:func:`distillation_loss`). The teacher
    runs unpruned inference inside the step (stop-gradient; its params
    are closure constants, replicated under any mesh).

    ``impl`` — ``"xla"`` (default) or ``"pallas"`` — selects the student's
    forward engine. ``"pallas"`` routes the fused training kernels
    (:func:`rajni_tpu.models.train_path.vit_forward_train`: pallas primal,
    residual-fed backward — fused SDPA-backward kernel where it fits,
    XLA segment vjps otherwise); callers must pre-check
    :func:`rajni_tpu.models.train_path.train_kernels_supported`. It
    composes with ``remat`` (the checkpoint recompute re-runs the pallas
    forward) and with ``drop_path`` (masks blended around the kernels,
    same key schedule as the XLA path).

    ``dp_mesh`` — a 1-D ``(data,)`` mesh — runs the grad computation under
    ``shard_map`` (per-shard forward/backward on the local batch, pmean'd
    loss/grads). Required for data-parallel ``impl="pallas"``: pallas
    custom calls need manual sharding, the same rule as the inference DP
    path (:func:`rajni_tpu.parallel.mesh.sharded_forward`). Batch mixing
    still happens on the GLOBAL batch before the shard split (the mixup
    pairing reverses the whole batch)."""
    mixing = mixup_alpha > 0.0 or cutmix_alpha > 0.0
    if impl == "pallas":
        from .models.train_path import vit_forward_train

        def student_fwd(params, images, dp_rng, return_dist=False):
            return vit_forward_train(
                params, images, config, schedule,
                return_dist=return_dist, remat=remat,
                drop_path=drop_path, rng=dp_rng,
            )
    else:

        def student_fwd(params, images, dp_rng, return_dist=False):
            return vit_forward(
                params, images, config, schedule, remat=remat,
                drop_path=drop_path, rng=dp_rng, return_dist=return_dist,
            )

    def loss_fn(params, images, labels, lam, dp_rng):
        if distill is not None:
            kind, alpha, tau, teacher_cfg = distill
            cls_logits, dist_logits = student_fwd(
                params, images, dp_rng, return_dist=True
            )
            if mixing:
                base = mixed_cross_entropy(
                    cls_logits, labels, lam, label_smoothing
                )
            else:
                base = cross_entropy(cls_logits, labels, label_smoothing)
            teacher_logits = jax.lax.stop_gradient(
                vit_forward(teacher_params, images, teacher_cfg)
            )
            loss = (1.0 - alpha) * base + alpha * distillation_loss(
                dist_logits, teacher_logits, kind, tau
            )
            logits = cls_logits  # accuracy vs true labels is diagnostic
        else:
            logits = student_fwd(params, images, dp_rng)
            if mixing:
                loss = mixed_cross_entropy(logits, labels, lam,
                                           label_smoothing)
            else:
                loss = cross_entropy(logits, labels, label_smoothing)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    def train_step(state: TrainState, images, labels):
        if mixing:
            # mixing happens outside value_and_grad — images are inputs,
            # not parameters, so no gradient flows through the blend
            images, lam = apply_batch_mix(
                images, seed, state.step, mixup_alpha, cutmix_alpha,
                switch_prob,
            )
        else:
            lam = jnp.float32(1.0)
        dp_rng = None
        if drop_path > 0.0:
            dp_rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(seed), _DROPPATH_TAG),
                state.step,
            )
        if dp_mesh is None:
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, images, labels, lam, dp_rng
            )
        else:
            from jax.sharding import PartitionSpec as P

            def shard_grads(params, images, labels, lam):
                rng = dp_rng
                if rng is not None:
                    # decorrelate the per-shard stochastic-depth masks:
                    # each shard draws (B_local, 1, 1) masks, so without
                    # this fold every data shard would repeat the same
                    # drop rows (statistically dependent across the
                    # global batch)
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data")
                    )
                (loss, acc), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, images, labels, lam, rng)
                # equal shards → mean-of-means is the global mean; grads
                # come from a mean loss, so pmean IS the global gradient
                return (jax.lax.pmean(loss, "data"),
                        jax.lax.pmean(acc, "data"),
                        jax.lax.pmean(g, "data"))

            loss, acc, grads = jax.shard_map(
                shard_grads,
                mesh=dp_mesh,
                in_specs=(P(), P("data"), P("data"), P()),
                out_specs=(P(), P(), P()),
                # pallas_call out_shapes carry no varying-mesh-axes
                # metadata (same rule as parallel.mesh's kernel branches)
                check_vma=False,
            )(state.params, images, labels, lam)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return train_step


def _eval_top1(fwd, params, loader, batch_size, max_batches=None):
    """Top-1 accuracy over a validation loader, for in-training checkpoints.

    Pads the ragged final batch up to ``batch_size`` so the jitted forward
    compiles ONE shape; pad rows are sliced off before accounting. Same
    denominator discipline as the reference harness
    (`/root/reference/rajni/eval.py:73` — ``max(total, 1)``).
    """
    correct = total = 0
    for i, (im, lb) in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        im = np.asarray(im)
        b = int(im.shape[0])
        if b == 0:
            continue
        if b < batch_size:
            pad = np.zeros((batch_size - b,) + im.shape[1:], im.dtype)
            im = np.concatenate([im, pad])
        logits = np.asarray(fwd(params, jnp.asarray(im)))[:b]
        correct += int((logits.argmax(-1) == np.asarray(lb)[:b]).sum())
        total += b
    return 100.0 * correct / max(total, 1)


def main(argv=None):
    """Fine-tuning CLI: adapt a ViT to its deployment pruning schedule.

    ``python -m rajni_tpu.train --synthetic --steps 100 --schedule s.json``

    Capability extension over the inference-only reference: trains *through*
    the static pruning schedule so the network adapts to the token budget it
    will be served with, then saves a checkpoint loadable by the eval CLI.
    """
    import argparse

    from .models.vit import get_config, init_params
    from .utils.schedule import load_schedule

    p = argparse.ArgumentParser("RAJNI-TPU fine-tuning")
    p.add_argument("--data_path", type=str, default=None,
                   help="ImageFolder training root")
    p.add_argument("--synthetic", action="store_true",
                   help="Train on synthetic data (pipeline smoke/benchmark)")
    p.add_argument("--shuffle", action="store_true",
                   help="Reshuffle the training set each pass (seeded by "
                        "--seed + pass index; --resume replays the exact "
                        "same order). Off by default to match the "
                        "deterministic eval-order protocol")
    p.add_argument("--augment", action="store_true",
                   help="Train-mode augmentation: RandomResizedCrop + "
                        "horizontal flip, computed IN-GRAPH on the device "
                        "from decode-only uint8 canvases "
                        "(rajni_tpu.data.augment — torchvision box "
                        "semantics, PIL-exact bicubic). Keys derive from "
                        "(--seed, step), so --resume replays the identical "
                        "augmented stream. Requires --data_path")
    p.add_argument("--canvas", type=int, default=512,
                   help="with --augment: decode canvas side; images larger "
                        "than this are pre-downscaled to fit "
                        "(data.pipeline.decode_to_canvas)")
    p.add_argument("--repeated_aug", type=int, default=0, metavar="N",
                   help="repeated augmentation (DeiT's RASampler): each "
                        "step draws ceil(batch/N) unique images and "
                        "repeats each N times consecutively — the copies "
                        "diverge only through the in-graph augmentation "
                        "(per-row keys), so requires --augment. The data "
                        "stream consumes ceil(batch/N) samples per step "
                        "and --resume replays it exactly")
    p.add_argument("--rand_augment", type=str, default=None, metavar="CFG",
                   help="with --augment: timm RandAugment config string "
                        "(e.g. 'rand-m9-mstd0.5-inc1'), applied IN-GRAPH to "
                        "the uint8 crop after the flip — timm transform "
                        "order (rajni_tpu.data.randaug; PIL-exact LUT ops). "
                        "Keys derive from (--seed, step): resume-exact")
    p.add_argument("--reprob", type=float, default=0.0, metavar="P",
                   help="with --augment: timm RandomErasing probability, "
                        "applied in-graph after normalization. 0 = off; "
                        "0.25 is the DeiT setting")
    p.add_argument("--remode", type=str, default="pixel",
                   choices=("pixel", "rand", "const"),
                   help="RandomErasing fill mode (timm remode)")
    p.add_argument("--recount", type=int, default=1,
                   help="RandomErasing rectangles per image (timm recount)")
    p.add_argument("--label_smoothing", type=float, default=0.0,
                   metavar="S",
                   help="cross-entropy label smoothing: targets "
                        "(1-S)*onehot + S/num_classes")
    p.add_argument("--mixup", type=float, default=0.0, metavar="ALPHA",
                   help="mixup: per-step lam ~ Beta(ALPHA, ALPHA) derived "
                        "from (--seed, step) in-graph (resume-exact); the "
                        "batch mixes with its own reverse and the loss "
                        "mixes the two label sets. 0 = off; 0.2 is the "
                        "common ViT setting")
    p.add_argument("--cutmix", type=float, default=0.0, metavar="ALPHA",
                   help="CutMix: per-step box cut from the reversed batch "
                        "with lam ~ Beta(ALPHA, ALPHA), area-corrected "
                        "label weights (timm rand_bbox semantics), derived "
                        "from (--seed, step) in-graph (resume-exact). "
                        "0 = off; 1.0 is the common setting. With --mixup "
                        "too, each step picks one of the two at "
                        "--mixup_switch_prob")
    p.add_argument("--mixup_switch_prob", type=float, default=0.5,
                   metavar="P",
                   help="with BOTH --mixup and --cutmix: per-step "
                        "probability of CutMix (timm batch mode)")
    p.add_argument("--model", type=str, default="vit_base_patch16_224")
    p.add_argument("--schedule", type=str, default=None,
                   help="Pruning schedule JSON to train through")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Initial params (msgpack/orbax); random if absent")
    p.add_argument("--output", type=str, default="rajni_finetuned.msgpack")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="cosine: linear warmup then cosine decay to 0 at "
                        "--steps (the standard ViT fine-tuning recipe)")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="Linear LR warmup steps (0 disables)")
    p.add_argument("--grad_accum", type=int, default=1, metavar="K",
                   help="Accumulate K micro-batch gradients per optimizer "
                        "update (optax.MultiSteps): K× effective batch at "
                        "1× activation memory. --steps counts micro-steps.")
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.0, metavar="D",
                   help="layer-wise LR decay (timm's layer_decay): the "
                        "head trains at --lr, block i at lr*D^(depth-i), "
                        "the embeddings at lr*D^(depth+1) — 0.65-0.75 is "
                        "the common ViT fine-tuning range (0 = off)")
    p.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                   help="track an exponential moving average of the "
                        "params (ema = DECAY*ema + (1-DECAY)*params per "
                        "update; 0.9999 is the common ViT setting) and "
                        "additionally save it as <output>.ema — often "
                        "worth a few tenths of top-1 over the raw final "
                        "params. Lives in the optimizer state, so "
                        "--save_state_every/--resume carry it exactly; "
                        "costs one extra fp32 param-sized buffer (fp32 "
                        "regardless of --dtype: a bf16 accumulator would "
                        "round the tiny per-update increment away)")
    p.add_argument("--grad_clip", type=float, default=0.0, metavar="NORM",
                   help="clip the gradient to this global L2 norm before "
                        "AdamW (0 = off); with --grad_accum the clip "
                        "applies to the K-step mean gradient")
    p.add_argument("--kernels", type=str, default="auto",
                   choices=["xla", "pallas", "auto"],
                   help="student forward engine: 'pallas' routes the fused "
                        "training kernels (pallas forward at inference-"
                        "kernel MFU, fused SDPA-backward kernel + XLA "
                        "segment vjps — models/train_path.py, measured "
                        ">=1.13x everywhere supported); 'auto' (default, "
                        "matching the eval CLI's backend dispatch) picks "
                        "pallas on TPU when the (model, schedule) supports "
                        "it and no parallel flag needs the XLA partitioner. "
                        "Composes with --remat, --drop_path, "
                        "--data_parallel and --tensor_parallel "
                        "(parallel/tp_train.py)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Param dtype (fp32 default: optimizer stability)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--eval_data", type=str, default=None,
                   help="Validation ImageFolder root: run top-1 eval every "
                        "--eval_every steps and after the last step; the "
                        "best-so-far params are saved to <output>.best")
    p.add_argument("--eval_every", type=int, default=0, metavar="N",
                   help="Validation cadence in steps (0 = only after the "
                        "final step); requires --eval_data")
    p.add_argument("--eval_batches", type=int, default=None, metavar="M",
                   help="Cap validation at M batches (default: full set)")
    p.add_argument("--eval_batch_size", type=int, default=None,
                   help="Validation batch size (default: --batch_size)")
    p.add_argument("--save_state_every", type=int, default=0, metavar="N",
                   help="Every N steps, atomically save the FULL train "
                        "state (params + optimizer moments + step) for "
                        "crash-safe resume; 0 disables. The final step "
                        "always saves when this is on.")
    p.add_argument("--state_path", type=str, default=None,
                   help="Train-state file for --save_state_every/--resume "
                        "(default: <output>.state)")
    p.add_argument("--state_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="orbax: per-array streaming checkpoint DIRECTORY — "
                        "use for over-HBM (pipeline-sharded) states whose "
                        "tree would not fit host memory as one msgpack "
                        "blob; --resume auto-detects either")
    p.add_argument("--resume", type=str, default=None, metavar="STATE",
                   help="Resume from a train state saved by "
                        "--save_state_every. Requires the same model/"
                        "schedule/optimizer/parallelism flags as the run "
                        "that saved it; --steps is the TOTAL step budget, "
                        "so a run resumed at step>=steps just re-saves. "
                        "With --distributed the file must be readable on "
                        "every host.")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over ALL local devices on a 1-D "
                        "data mesh (params replicated; XLA all-reduces the "
                        "gradients over ICI) — the single-host counterpart "
                        "of the eval CLI's --data_parallel. Redundant with "
                        "--tensor_parallel/--pipeline_parallel (their "
                        "meshes already data-parallelize the leftover "
                        "devices) and with --distributed (DCN-level DP)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize each block in the backward pass "
                        "(jax.checkpoint): ~⅓ extra forward FLOPs buys "
                        "O(depth) less activation memory — use when the "
                        "batch OOMs (pipeline training has its own "
                        "per-tick remat; this flag composes with plain, "
                        "--distributed and --tensor_parallel runs)")
    p.add_argument("--drop_path", type=float, default=0.0, metavar="RATE",
                   help="Stochastic depth (timm DropPath): per-sample "
                        "residual-branch drop with rates linspace(0, RATE, "
                        "depth); masks derive in-graph from (--seed, step) "
                        "so --resume replays them exactly. DeiT recipe "
                        "uses 0.1")
    p.add_argument("--distill_teacher", type=str, default=None,
                   metavar="CKPT",
                   help="Knowledge distillation: path to a frozen teacher "
                        "checkpoint (any loadable params tree). The "
                        "student's dist head (deit *_distilled models; "
                        "plain models fall back to the single head) "
                        "trains against the teacher's logits on the same "
                        "batch — DeiT's recipe")
    p.add_argument("--distill_model", type=str, default=None, metavar="NAME",
                   help="Teacher architecture name (required with "
                        "--distill_teacher); input resolution must match "
                        "the student")
    p.add_argument("--distill_type", choices=["hard", "soft"],
                   default="hard",
                   help="hard = CE against the teacher argmax (DeiT's "
                        "winning variant); soft = tau^2-scaled KL")
    p.add_argument("--distill_alpha", type=float, default=0.5,
                   help="loss = (1-alpha)*CE(labels) + alpha*distill")
    p.add_argument("--distill_tau", type=float, default=1.0,
                   help="soft-distillation temperature")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Capture a jax.profiler trace of the training loop "
                        "(same surface as the eval CLI's --profile)")
    p.add_argument("--distributed", action="store_true",
                   help="Multi-HOST data-parallel training: join the JAX "
                        "multi-controller runtime; each process feeds its "
                        "shard of the global batch, gradients all-reduce "
                        "over DCN (rajni_tpu.parallel.multihost)")
    p.add_argument("--coordinator", type=str, default=None,
                   metavar="HOST:PORT",
                   help="With --distributed off a TPU pod: coordinator "
                        "address (pods autodetect)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--pipeline_parallel", type=int, default=1, metavar="N",
                   help="GPipe pipeline training: stage the blocks over an "
                        "N-wide `pipe` mesh axis for over-HBM models "
                        "(rajni_tpu.parallel.pipeline); the leftover "
                        "devices form the `data` axis")
    p.add_argument("--tensor_parallel", type=int, default=1, metavar="N",
                   help="Megatron TP over a (data, model) mesh (leftover "
                        "devices form the data axis — DP implied); with "
                        "--pipeline_parallel it moves inside each stage "
                        "(3-D (data, pipe, model) mesh)")
    p.add_argument("--microbatch", type=int, default=None, metavar="M",
                   help="With --pipeline_parallel: in-flight GPipe "
                        "microbatches (default 2*pipe)")
    args = p.parse_args(argv)

    if args.pipeline_parallel > 1 and args.distributed:
        raise ValueError(
            "--pipeline_parallel is a single-controller (ICI) mesh; "
            "--distributed shards data over hosts (DCN) — PP across DCN "
            "is not supported"
        )
    if args.tensor_parallel > 1 and args.distributed:
        raise ValueError(
            "--tensor_parallel shards over ICI within one controller; "
            "--distributed shards data over hosts (DCN) — compose TP with "
            "DP on the in-host mesh instead"
        )
    if args.eval_every and not args.eval_data:
        raise ValueError("--eval_every requires --eval_data")
    if args.data_parallel and (
        args.distributed or args.tensor_parallel > 1
        or args.pipeline_parallel > 1
    ):
        raise ValueError(
            "--data_parallel is the plain single-host mode; "
            "--tensor_parallel/--pipeline_parallel meshes already "
            "data-parallelize their leftover devices and --distributed "
            "shards data over hosts — drop the redundant flag"
        )
    if args.remat and args.pipeline_parallel > 1:
        raise ValueError(
            "--remat is redundant with --pipeline_parallel: the GPipe "
            "train step already rematerializes per tick "
            "(parallel/pipeline.py)"
        )
    if not 0.0 <= args.drop_path < 1.0:
        raise ValueError("--drop_path must be in [0, 1)")
    if args.distill_teacher and not args.distill_model:
        raise ValueError("--distill_teacher requires --distill_model "
                         "(the teacher architecture name)")
    if args.distill_teacher and args.pipeline_parallel > 1:
        raise ValueError(
            "--distill_teacher with --pipeline_parallel is unsupported: "
            "the teacher forward is not staged over the pipe mesh (a "
            "replicated teacher inside one stage's program would hold "
            "the full teacher on every chip — defeating PP's memory "
            "purpose)"
        )
    if args.distill_teacher and not 0.0 <= args.distill_alpha <= 1.0:
        raise ValueError("--distill_alpha must be in [0, 1]")
    if args.distill_teacher and args.distill_tau <= 0.0:
        raise ValueError("--distill_tau must be > 0")
    if args.augment and (args.synthetic or not args.data_path):
        raise ValueError(
            "--augment requires a real --data_path dataset (crops are "
            "sampled from decode-only uint8 canvases)"
        )
    if (args.rand_augment or args.reprob) and not args.augment:
        raise ValueError(
            "--rand_augment/--reprob extend the in-graph augmentation "
            "pipeline — they require --augment"
        )
    if args.repeated_aug < 0 or args.repeated_aug == 1:
        raise ValueError("--repeated_aug must be 0 (off) or >= 2 repeats")
    if args.repeated_aug > 1 and not args.augment:
        raise ValueError(
            "--repeated_aug requires --augment: without the in-graph "
            "augmentation the N copies of each image are identical and "
            "the step degenerates to a smaller effective batch"
        )
    if args.rand_augment:
        from .data.randaug import parse_rand_augment

        parse_rand_augment(args.rand_augment)  # fail fast on bad configs
    if not 0.0 <= args.reprob <= 1.0:
        raise ValueError("--reprob must be in [0, 1]")
    if args.recount < 1:
        raise ValueError("--recount must be >= 1")
    if not 0.0 <= args.label_smoothing < 1.0:
        raise ValueError("--label_smoothing must be in [0, 1)")
    if args.mixup < 0.0:
        raise ValueError("--mixup alpha must be >= 0")
    if args.cutmix < 0.0:
        raise ValueError("--cutmix alpha must be >= 0")
    if not 0.0 <= args.mixup_switch_prob <= 1.0:
        raise ValueError("--mixup_switch_prob must be in [0, 1]")
    if args.grad_clip < 0.0:
        raise ValueError("--grad_clip must be >= 0 (0 disables)")
    if not 0.0 <= args.ema < 1.0:
        raise ValueError("--ema decay must be in [0, 1) (0 disables)")
    if not 0.0 <= args.layer_decay <= 1.0:
        raise ValueError("--layer_decay must be in [0, 1] (0 disables)")
    if args.state_backend == "orbax" and args.distributed:
        raise ValueError(
            "--state_backend orbax is single-controller: saving multi-host "
            "(non-fully-addressable) arrays is a collective write, but only "
            "process 0 saves here — a process-0-only orbax save would "
            "deadlock the other controllers. Use msgpack (the state is "
            "replicated; one host's device_get covers it)."
        )
    if args.eval_data and (args.distributed or args.pipeline_parallel > 1):
        raise ValueError(
            "--eval_data composes with single-controller, non-pipelined "
            "training (TP/DP included — the eval canonicalizes the "
            "repacked tree per checkpoint); multi-host runs would need "
            "per-process eval shards (score saved checkpoints with "
            "python -m rajni_tpu.run --distributed), and a PP run's "
            "un-stacked eval tree would materialize the full over-HBM "
            "model on one chip"
        )

    if args.kernels == "pallas":
        if args.distributed or args.pipeline_parallel > 1:
            raise ValueError(
                "--kernels pallas composes with plain, --data_parallel "
                "and --tensor_parallel training (shard_mapped kernel "
                "forward/backward); PP/multi-host kernel training is "
                "not wired"
            )
        if args.tensor_parallel > 1:
            if args.remat:
                raise ValueError(
                    "--kernels pallas --tensor_parallel excludes --remat "
                    "(jax.checkpoint over the TP shard ops is not wired; "
                    "the XLA TP path composes with --remat)"
                )
            if args.distill_teacher:
                raise ValueError(
                    "--kernels pallas --tensor_parallel excludes "
                    "--distill_teacher (the teacher forward is not "
                    "shard_mapped; the XLA TP path composes)"
                )
        # --drop_path composes: the per-branch masks blend around the
        # fused kernels (x + m·(y − x)) with exact backward corrections
        # (models/train_path.py), same key schedule as the XLA path

    mesh = None
    if args.distributed:
        # before the first jax.devices() — joining the runtime changes it
        from .parallel import multihost

        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)
        pid, nproc = jax.process_index(), jax.process_count()
        # strict: the train step does no padding, so the global batch
        # must divide over EVERY device of the data axis or
        # host_to_global raises at step 1
        multihost.local_batch_size(args.batch_size, strict_devices=True)
        print(f"Distributed: process {pid} of {nproc}, "
              f"{len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices")

    config = get_config(args.model)
    schedule = (
        load_schedule(args.schedule, config.depth) if args.schedule else None
    )
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16

    if args.checkpoint:
        from .models.vit import adapt_config_to_params
        from .params.io import load_params

        params = load_params(args.checkpoint, dtype=dtype)
        config = adapt_config_to_params(config, params)
    else:
        params = init_params(jax.random.key(args.seed), config, dtype)

    distill = None
    teacher_params = None
    if args.distill_teacher:
        from .models.vit import adapt_config_to_params
        from .params.io import load_params

        teacher_cfg = get_config(args.distill_model)
        teacher_params = load_params(args.distill_teacher, dtype=dtype)
        teacher_cfg = adapt_config_to_params(teacher_cfg, teacher_params)
        if teacher_cfg.img_size != config.img_size:
            raise ValueError(
                f"teacher resolution {teacher_cfg.img_size} != student "
                f"{config.img_size} — both forwards share one batch"
            )
        distill = (args.distill_type, args.distill_alpha,
                   args.distill_tau, teacher_cfg)
        print(f"distilling from {args.distill_model} "
              f"({args.distill_type}, alpha={args.distill_alpha})")

    train_impl = args.kernels
    if train_impl != "xla":
        from .models.train_path import train_kernels_supported

        ok, why = train_kernels_supported(config, schedule, dtype)
        if train_impl == "pallas" and not ok:
            raise ValueError(
                f"--kernels pallas unsupported for this run: {why}"
            )
        if train_impl == "auto":
            # same backend rule as inference resolve_impl: the kernels pay
            # off on TPU; CPU/interpret mode stays XLA
            parallel_flags = (args.distributed
                              or args.tensor_parallel > 1
                              or args.pipeline_parallel > 1)
            train_impl = "pallas" if (
                ok and not parallel_flags
                and jax.default_backend() == "tpu"
            ) else "xla"
    if train_impl == "pallas":
        print("train forward: fused pallas kernels "
              "(residual-fed XLA backward)")

    # one optimizer for both branches — tx depends only on the flags
    tx = build_optimizer(
        args.lr, args.steps, args.weight_decay,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        grad_accum=args.grad_accum, grad_clip=args.grad_clip,
        ema=args.ema, layer_decay=args.layer_decay, params=params,
    )

    pp_mesh = None
    tp_mesh = None
    if args.pipeline_parallel > 1:
        from .parallel.pipeline import (
            make_pipe_mesh,
            make_pipeline_train_step,
            place_pipeline_params,
            stack_params,
        )

        pp_mesh = make_pipe_mesh(
            pipe=args.pipeline_parallel, model=args.tensor_parallel
        )
        n_micro = args.microbatch or 2 * args.pipeline_parallel
        group = n_micro * pp_mesh.shape["data"]
        if args.batch_size % group:
            raise ValueError(
                f"--batch_size {args.batch_size} must be a multiple of "
                f"microbatch*data = {n_micro}*{pp_mesh.shape['data']} = "
                f"{group} (the GPipe train step does no padding)"
            )
        # optimizer state is built on the STACKED, placed tree so each
        # chip's Adam moments cover only its stage's (shard of) weights
        stacked = place_pipeline_params(
            stack_params(params, args.pipeline_parallel,
                         args.tensor_parallel),
            pp_mesh,
        )
        del params  # over-HBM models must not keep the unstacked copy
        if args.layer_decay > 0.0:
            # rebuild with the STACKED factor layout (per-block factors as
            # a broadcastable column over the stacked depth axis)
            tx = build_optimizer(
                args.lr, args.steps, args.weight_decay,
                lr_schedule=args.lr_schedule,
                warmup_steps=args.warmup_steps,
                grad_accum=args.grad_accum, grad_clip=args.grad_clip,
                ema=args.ema, layer_decay=args.layer_decay,
                params=stacked, pp_stacked=True,
            )
        state = TrainState(stacked, tx.init(stacked),
                           jnp.zeros((), jnp.int32))
        step_fn = jax.jit(
            make_pipeline_train_step(config, schedule, pp_mesh, tx,
                                     microbatch=args.microbatch,
                                     label_smoothing=args.label_smoothing,
                                     mixup_alpha=args.mixup,
                                     cutmix_alpha=args.cutmix,
                                     switch_prob=args.mixup_switch_prob,
                                     seed=args.seed,
                                     drop_path=args.drop_path),
            donate_argnums=(0,),
        )
        print(f"Pipeline training: mesh {dict(pp_mesh.shape)}, "
              f"M={n_micro} microbatches "
              f"(utilization {n_micro / (n_micro + args.pipeline_parallel - 1):.2f})")
    elif args.tensor_parallel > 1 or args.data_parallel:
        # DP x Megatron TP over a (data, model) mesh (the library recipe in
        # docs/PARALLELISM.md, now CLI-wired): shard_params head-aligns the
        # QKV and places every weight; the optimizer state initialized from
        # the SHARDED tree inherits the shardings, gradients follow them,
        # and XLA inserts the Megatron psums (audited in tests/test_parallel).
        # --data_parallel is the model=1 degenerate case: shard_params
        # replicates every weight (no QKV repack at model=1), the batch
        # shards over the full data axis, and the mean loss makes XLA
        # all-reduce the gradients — plain DDP-style training.
        from .parallel.mesh import batch_sharding, make_mesh, shard_params

        tp_mesh = make_mesh(model=args.tensor_parallel)
        if args.batch_size % tp_mesh.shape["data"]:
            raise ValueError(
                f"--batch_size {args.batch_size} must be a multiple of the "
                f"data axis ({tp_mesh.shape['data']}) — the train step does "
                "no padding"
            )
        sharded = shard_params(params, tp_mesh)
        del params
        state = TrainState(sharded, tx.init(sharded),
                           jnp.zeros((), jnp.int32))
        if train_impl == "pallas" and args.tensor_parallel > 1:
            # Megatron TP over the per-chip train kernels: manual
            # shard_map with custom-vjp f/g collectives
            # (parallel/tp_train.py); the XLA path below keeps
            # automatic jit-sharding partitioning
            from .parallel.mesh import param_pspecs
            from .parallel.tp_train import (
                make_tp_train_step,
                tp_kernels_train_supported,
            )

            ok, why = tp_kernels_train_supported(
                config, schedule, args.tensor_parallel, dtype
            )
            if not ok:
                raise ValueError(
                    f"--kernels pallas --tensor_parallel unsupported "
                    f"for this run: {why}"
                )
            step_fn = jax.jit(
                make_tp_train_step(
                    config, schedule, tx, tp_mesh, param_pspecs(sharded),
                    label_smoothing=args.label_smoothing,
                    mixup_alpha=args.mixup,
                    cutmix_alpha=args.cutmix,
                    switch_prob=args.mixup_switch_prob,
                    seed=args.seed,
                    drop_path=args.drop_path,
                ),
                donate_argnums=(0,),
            )
        else:
            step_fn = jax.jit(
                make_train_step(config, schedule, tx,
                                label_smoothing=args.label_smoothing,
                                mixup_alpha=args.mixup,
                                cutmix_alpha=args.cutmix,
                                switch_prob=args.mixup_switch_prob,
                                seed=args.seed,
                                remat=args.remat,
                                drop_path=args.drop_path,
                                distill=distill,
                                teacher_params=teacher_params,
                                impl=train_impl,
                                # pallas custom calls need manual
                                # sharding — the XLA path keeps
                                # automatic partitioning
                                dp_mesh=(tp_mesh
                                         if train_impl == "pallas"
                                         else None)),
                donate_argnums=(0,),
            )
        tp_batch_sharding = batch_sharding(tp_mesh)
        if args.tensor_parallel > 1:
            print(f"TP training: mesh {dict(tp_mesh.shape)} "
                  f"(data-parallel batch x Megatron tensor parallelism)")
        else:
            print(f"DP training: batch sharded over "
                  f"{tp_mesh.shape['data']} devices (params replicated)")
    else:
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step_fn = jax.jit(
            make_train_step(config, schedule, tx,
                            label_smoothing=args.label_smoothing,
                            mixup_alpha=args.mixup,
                            cutmix_alpha=args.cutmix,
                            switch_prob=args.mixup_switch_prob,
                            seed=args.seed,
                            remat=args.remat,
                            drop_path=args.drop_path,
                            distill=distill,
                            teacher_params=teacher_params,
                            impl=train_impl),
            donate_argnums=(0,),
        )

    start_step = 0
    if args.resume:
        # restore onto the freshly built template BEFORE any multi-host
        # replication: the template's leaves are host-local here (or
        # pipe-placed in the PP branch), so placement follows the template
        state = load_train_state(args.resume, state)
        start_step = int(jax.device_get(state.step))
        print(f"resumed train state from {args.resume} at step {start_step}")

    local_batch = args.batch_size
    if args.distributed:
        from .parallel import multihost

        mesh = multihost.global_mesh()
        # replicate the whole train state onto the global mesh; gradients
        # (and so the updated params) come back replicated because the
        # loss is a mean over the data-sharded batch — XLA inserts the
        # cross-host all-reduce
        state = multihost.replicate_to_global(state, mesh)
        local_batch = multihost.local_batch_size(args.batch_size,
                                                 strict_devices=True)

    if args.synthetic or args.data_path is None:
        if args.data_path is None and not args.synthetic:
            raise ValueError("provide --data_path or --synthetic")
        seed = args.seed + (
            100003 * jax.process_index() if args.distributed else 0
        )
        rng = np.random.default_rng(seed)
        images = rng.standard_normal(
            (local_batch, config.img_size, config.img_size, 3)
        ).astype(np.float32)
        labels = rng.integers(
            0, config.num_classes, local_batch
        ).astype(np.int32)

        def batches():
            while True:
                yield images, labels
        batch_iter = batches()
    else:
        from .data.pipeline import DataLoader, ImageFolder

        if args.augment:
            # decode-only canvases: the random crop + resize runs in-graph
            # (data.augment.augment_on_device), so the host must NOT
            # center-crop first
            dataset = ImageFolder(args.data_path, img_size=config.img_size,
                                  output="canvas", canvas=args.canvas)
        else:
            dataset = ImageFolder(args.data_path, img_size=config.img_size)
        # repeated augmentation: the loader yields ceil(B/N) unique images
        # per step; batches() repeats each N× consecutively (timm
        # RASampler order) and truncates to the batch — the copies
        # diverge through the per-row augment keys
        sub_batch = local_batch
        if args.repeated_aug > 1:
            sub_batch = -(-local_batch // args.repeated_aug)
        if len(dataset) < sub_batch:
            # the full-batch-only filter in batches() below would spin
            # forever otherwise (single-host hang; distributed deadlock)
            raise ValueError(
                f"dataset ({len(dataset)} images) smaller than the "
                f"{'local ' if args.distributed else ''}batch "
                f"({sub_batch}) — no full batch can ever be formed"
            )
        if args.distributed and jax.process_count() > 1:
            # Every host must be able to fill a full local batch or its
            # batches() generator would spin forever while the other
            # controllers block in the gradient all-reduce. Check against
            # the SMALLEST shard using the pre-shard length, so every
            # host raises together instead of one deadlocking the rest.
            if len(dataset) // jax.process_count() < sub_batch:
                raise ValueError(
                    f"dataset too small for distributed training: the "
                    f"smallest per-host shard "
                    f"({len(dataset) // jax.process_count()} images) "
                    f"cannot fill a local batch of {sub_batch}"
                )
            # interleaved per-process shard (the distributed-sampler split)
            from .parallel import multihost as _mh
            dataset.samples = _mh.shard_samples(dataset.samples)
        loader = DataLoader(dataset, batch_size=sub_batch)
        print(f"training on {len(dataset)} images, "
              f"{len(dataset.classes)} classes"
              + (f", {args.repeated_aug}x repeated augmentation "
                 f"({sub_batch} unique/step)"
                 if args.repeated_aug > 1 else ""))

        base_samples = list(dataset.samples)
        bpe = max(len(dataset) // sub_batch, 1)  # full batches per pass
        # with --shuffle each pass has its own order, so resume must also
        # restart the generator at the interrupted PASS (unshuffled passes
        # are identical, so pass 0 suffices there)
        start_pass = (start_step // bpe) if args.shuffle else 0

        def batches():
            pass_idx = start_pass
            while True:
                if args.shuffle:
                    # deterministic per-pass order keyed on (seed, pass):
                    # --resume regenerates the identical permutation, so
                    # the resumed data stream is exact (pinned in
                    # tests/test_train.py::test_train_cli_resume_shuffle)
                    perm = np.random.default_rng(
                        [args.seed, pass_idx]
                    ).permutation(len(base_samples))
                    dataset.samples = [base_samples[j] for j in perm]
                for im, lb in loader:
                    # canvas mode yields (canvas, sizes) tuples
                    lead = im[0] if isinstance(im, tuple) else im
                    if lead.shape[0] != sub_batch:  # static shapes only
                        continue
                    if args.repeated_aug > 1:
                        rep = lambda a: np.repeat(  # noqa: E731
                            np.asarray(a), args.repeated_aug, axis=0
                        )[:local_batch]
                        im = (tuple(rep(a) for a in im)
                              if isinstance(im, tuple) else rep(im))
                        lb = rep(lb)
                    yield im, lb.astype(np.int32)
                pass_idx += 1
        batch_iter = batches()

        if start_step:
            # --resume reproduces the uninterrupted trajectory including
            # the DATA stream: fast-forward the cyclic loader (decode-only,
            # no training) to where step start_step+1 would have read.
            # Each host skips within its OWN shard, matching what its
            # uninterrupted generator would have been yielding.
            skip = start_step % bpe
            if skip:
                print(f"resume: fast-forwarding the data stream {skip} "
                      f"batches (decode-only)")
                for _ in range(skip):
                    next(batch_iter)

    run_eval = None
    if args.eval_data:
        from .data.pipeline import DataLoader, ImageFolder
        from .params.io import save_params as _save_params

        eb = args.eval_batch_size or args.batch_size
        eval_loader = DataLoader(
            ImageFolder(args.eval_data, img_size=config.img_size),
            batch_size=eb,
        )
        eval_fwd = jax.jit(lambda p, x: vit_forward(p, x, config, schedule))

        def eval_tree(tree):
            """Canonicalize a candidate tree for the eval forward: under
            TP the live params carry the head-aligned [C, 3, C] QKV
            repack — the save path's unrepack applies (VERDICT r3 #6);
            replicated DP (model=1) trees pass through as-is."""
            if tp_mesh is not None and args.tensor_parallel > 1:
                from .parallel.mesh import unrepack_qkv_heads

                tree = jax.device_put(
                    unrepack_qkv_heads(jax.device_get(tree))
                )
            return tree

        best_acc = -1.0
        if args.resume and os.path.exists(f"{args.output}.best"):
            # don't let a resumed run clobber a better pre-interruption
            # checkpoint: re-score the existing .best to seed the bar
            from .params.io import load_params as _load_params

            best_acc = _eval_top1(
                eval_fwd,
                _load_params(f"{args.output}.best", dtype=dtype),
                eval_loader, eb, args.eval_batches,
            )
            print(f"seeded best val_top1 {best_acc:.2f}% from existing "
                  f"{args.output}.best")

        def run_eval(at_step):
            nonlocal best_acc
            # with --ema the EMA weights are scored too and .best keeps
            # whichever tree is ahead — EMA usually wins late in a run,
            # raw params early (the EMA lags at warm-up)
            candidates = [("", state.params)]
            if args.ema > 0.0:
                candidates.append((" (ema)",
                                   get_ema_params(state.opt_state,
                                                  like=state.params)))
            for tag, tree in candidates:
                tree = eval_tree(tree)
                acc = _eval_top1(eval_fwd, tree, eval_loader, eb,
                                 args.eval_batches)
                print(f"step {at_step:6d}  val_top1{tag} {acc:.2f}%")
                if acc > best_acc:
                    best_acc = acc
                    # the canonicalized tree — .best stays a canonical
                    # checkpoint under TP too
                    _save_params(f"{args.output}.best", tree)
                    print(f"new best ({acc:.2f}%{tag}) -> "
                          f"{args.output}.best")

    if args.profile:
        # start/stop (not the context manager) so the long loop body keeps
        # its indentation; stopped right after the loop, before the final
        # checkpoint IO, so the trace covers compute only
        jax.profiler.start_trace(args.profile)
        print(f"Profiling to {args.profile}")

    state_path = args.state_path or f"{args.output}.state"
    aug_root = None
    if args.augment:
        from .data.augment import augment_on_device

        # per-step stream keyed only on (--seed, step): --resume replays
        # the identical augmented batches with no RNG state to checkpoint
        aug_root = jax.random.key(args.seed)
        # static policy kwargs shared by both call sites below (the flags
        # are jit static_argnames — one compile per policy, not per step)
        aug_kwargs = dict(
            rand_augment=args.rand_augment,
            erase=(
                (args.reprob, args.remode, args.recount)
                if args.reprob > 0.0 else None
            ),
        )
    last_eval = None
    try:
        for step in range(start_step + 1, args.steps + 1):
            im, lb = next(batch_iter)
            if mesh is not None:
                from .parallel import multihost

                if aug_root is not None:
                    # shard the uint8 canvases + sizes over the global data
                    # axis FIRST, then augment in-graph: one global program;
                    # per-image keys split from the replicated step key, so
                    # every host computes exactly its shard of the stream
                    cnv, szs, lb = multihost.host_to_global(
                        (np.asarray(im[0]), np.asarray(im[1]),
                         np.asarray(lb).astype(np.int32)), mesh
                    )
                    im = augment_on_device(
                        cnv, szs, jax.random.fold_in(aug_root, step),
                        crop=config.img_size, dtype=dtype, **aug_kwargs,
                    )
                else:
                    im, lb = multihost.host_to_global(
                        (np.asarray(im), np.asarray(lb).astype(np.int32)),
                        mesh,
                    )
                state, metrics = step_fn(state, im, lb)
            else:
                if aug_root is not None:
                    cnv, szs = jnp.asarray(im[0]), jnp.asarray(im[1])
                    if tp_mesh is not None:
                        # shard the uint8 canvases over the data axis
                        # BEFORE augmenting (mirror of the --distributed
                        # branch): the crop/resize matmuls then run as one
                        # global SPMD program over the mesh instead of
                        # serializing the whole batch — canvases are the
                        # big buffers (B·S·S·3 uint8 + the fp32 upcast) —
                        # through device 0 and resharding after
                        cnv = jax.device_put(cnv, tp_batch_sharding)
                        szs = jax.device_put(szs, tp_batch_sharding)
                    im = augment_on_device(
                        cnv, szs,
                        jax.random.fold_in(aug_root, step),
                        crop=config.img_size, dtype=dtype, **aug_kwargs,
                    )
                if tp_mesh is not None:
                    # place the batch over the data axis in the untimed
                    # host loop (leading-dim sharding fits images
                    # [B,H,W,3] and labels [B])
                    state, metrics = step_fn(
                        state,
                        jax.device_put(jnp.asarray(im), tp_batch_sharding),
                        jax.device_put(jnp.asarray(lb), tp_batch_sharding),
                    )
                else:
                    state, metrics = step_fn(
                        state, jnp.asarray(im), jnp.asarray(lb)
                    )
            if step % args.log_every == 0 or step == args.steps:
                print(f"step {step:6d}  loss {float(metrics['loss']):.4f}  "
                      f"acc {float(metrics['accuracy']):.3f}")
            if args.save_state_every and (
                step % args.save_state_every == 0 or step == args.steps
            ) and (not args.distributed or jax.process_index() == 0):
                # replicated/single-controller state is fully addressable, so
                # process 0's device_get sees the whole tree
                save_train_state(state_path, state, backend=args.state_backend)
            if run_eval is not None and args.eval_every and (
                step % args.eval_every == 0
            ):
                run_eval(step)
                last_eval = step


    finally:
        if args.profile:
            # finalize even on a mid-run failure/interrupt — an
            # unmatched start_trace loses the whole capture
            jax.profiler.stop_trace()

    if run_eval is not None and last_eval != args.steps:
        run_eval(args.steps)

    from .params.io import save_params

    if not args.distributed or jax.process_index() == 0:

        def to_canonical(tree):
            # back to the canonical checkpoint layout: gather the stacked
            # per-stage shards to host, un-stack the depth axis, and (with
            # TP) un-repack the head-aligned QKV — so the output loads
            # into the eval CLI / converter / oracles unchanged. (The EMA
            # tree mirrors the params' layout, so the same path applies.)
            if pp_mesh is not None:
                from .parallel.pipeline import unstack_params

                tree = unstack_params(jax.device_get(tree))
                if args.tensor_parallel > 1:
                    from .parallel.mesh import unrepack_qkv_heads

                    tree = unrepack_qkv_heads(tree)
            elif tp_mesh is not None:
                from .parallel.mesh import unrepack_qkv_heads

                tree = unrepack_qkv_heads(jax.device_get(tree))
            return tree

        # params are fully replicated — one copy on disk is the checkpoint
        save_params(args.output, to_canonical(state.params))
        print(f"saved fine-tuned params -> {args.output}")
        if args.ema > 0.0:
            ema = get_ema_params(state.opt_state, like=state.params)
            save_params(f"{args.output}.ema", to_canonical(ema))
            print(f"saved EMA params -> {args.output}.ema")
    return state


if __name__ == "__main__":
    main()
