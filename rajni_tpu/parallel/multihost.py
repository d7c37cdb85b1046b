"""Multi-host (DCN) data parallelism for evaluation and serving.

The reference is single-process/single-GPU (SURVEY.md §2 "Parallelism":
no ``torch.distributed`` anywhere); single-host multi-chip DP/TP lives in
:mod:`rajni_tpu.parallel.mesh`. This module adds the one missing rung of
the scaling ladder — **several hosts, each owning a slice of the chips,
joined over DCN** — the standard JAX multi-controller model:

  * every process runs the *same* program;
  * :func:`initialize` wires the processes into one runtime
    (``jax.distributed.initialize`` — on TPU pods the no-arg form
    autodetects the topology; on CPU it rides gloo collectives, which is
    how the tests exercise real cross-process collectives without a pod);
  * ``jax.devices()`` then spans all hosts, so the ordinary
    ``(data, model)`` mesh (:func:`rajni_tpu.parallel.mesh.make_mesh`)
    becomes a global mesh; XLA routes the ``data``-axis reductions over
    DCN and everything else over ICI exactly as the sharding dictates;
  * each host feeds its **local slice** of the global batch
    (:func:`host_to_global` assembles the global array without ever
    materializing the full batch on one host);
  * accuracy counters reduce **in-graph** to replicated scalars
    (:func:`multihost_eval_step`) because per-host code must never
    ``device_get`` a non-addressable (cross-host) array.

The accounting contract is the reference's (`/root/reference/rajni/
eval.py:61-74`): top-1 over real (non-padded) rows, throughput =
global images / forward wall-clock.
"""

from __future__ import annotations

import time
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import ViTConfig, vit_forward
from ..utils.schedule import Schedule
from ..utils.timing import fence
from .mesh import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join this process into a multi-host JAX runtime.

    On TPU pods call with no arguments (the runtime autodetects the
    topology from the pod metadata). Off-TPU (the CPU test path) the
    three arguments are required and collectives go through gloo.
    Idempotent: a second call on an initialized runtime is a no-op.
    """
    if _initialized():
        return
    # jaxlib's CPU client supports cross-process collectives only via the
    # gloo implementation. The flag must land BEFORE the first backend
    # initialization — so don't probe jax.default_backend() here (that
    # CREATES the backend); set it unconditionally (it only affects CPU
    # client creation, harmless on TPU pods).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # already-initialized runtimes: leave as-is
        pass
    kwargs = {}
    if coordinator_address is not None:
        if num_processes is None or process_id is None:
            raise ValueError(
                "coordinator_address requires num_processes and process_id "
                "(pass all three, or none for TPU-pod autodetection)"
            )
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is not None or process_id is not None:
        # silently autodetecting while discarding explicit (possibly
        # conflicting) topology args would be a debugging trap
        raise ValueError(
            "num_processes/process_id require coordinator_address "
            "(pass all three, or none for TPU-pod autodetection)"
        )
    jax.distributed.initialize(**kwargs)


def _initialized() -> bool:
    from jax._src import distributed

    return distributed.global_state.client is not None


def global_mesh(data: int | None = None, model: int = 1) -> Mesh:
    """A ``(data, model)`` mesh over ALL hosts' devices (call after
    :func:`initialize`). ``model`` must not straddle hosts if the kernel
    (pallas) backend is used — keep TP inside one host's ICI domain."""
    return make_mesh(jax.devices(), data=data, model=model)


def host_to_global(batch: Any, mesh: Mesh) -> Any:
    """Assemble per-host local batches into one globally-sharded pytree.

    Each process passes its own ``batch`` (arrays with a leading local
    batch dim — images, labels, or the on-device-preprocess tuple); the
    result is a global array sharded ``P("data")`` whose global batch is
    the concatenation over processes. No host ever holds the full batch.
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        batch,
    )


def replicate_to_global(tree: Any, mesh: Mesh) -> Any:
    """Replicate a host-resident pytree (params) onto every device of the
    global mesh. Every process must pass the same values (the usual
    checkpoint-load-then-replicate flow)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        tree,
    )


def multihost_eval_step(
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh,
    impl: str = "xla",
    act_scales=None,
    stage=None,
):
    """Jitted ``(params, images, labels) -> (correct, total)`` counters
    over a (possibly multi-host) mesh, replicated-scalar outputs.

    Rows with ``label < 0`` are padding and count toward neither
    numerator nor denominator — multi-host padding must be label-marked
    because the per-host code cannot slice a cross-host logits array
    (it is not addressable). The reference accounting being matched is
    eval.py:61-64 (argmax / correct / total). ``stage`` is the optional
    in-graph preprocessing callable (``--preprocess device*``) — per-image
    math, shards over ``data`` like everything else.
    """

    def step(p, images, labels):
        if stage is not None:
            images = stage(images)
        logits = vit_forward(p, images, config, schedule, impl, act_scales)
        preds = jnp.argmax(logits, axis=-1)
        valid = labels >= 0
        correct = jnp.sum(((preds == labels) & valid).astype(jnp.int32))
        total = jnp.sum(valid.astype(jnp.int32))
        return correct, total

    if impl != "xla":
        # Per-chip kernel programs: map the forward+count over the data
        # axis and psum the counters (same shard_map reasoning as
        # parallel.mesh.sharded_forward's pallas route).
        if mesh.shape["model"] > 1:
            raise NotImplementedError(
                "multi-host TP over the kernel backend is not supported; "
                "use impl='xla' or model=1 (TP belongs inside one host)"
            )

        def local(p, images, labels):
            c, t = step(p, images, labels)
            return (
                jax.lax.psum(c, "data"),
                jax.lax.psum(t, "data"),
            )

        return jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )

    return jax.jit(
        step,
        in_shardings=(
            None,
            NamedSharding(mesh, P("data")),
            NamedSharding(mesh, P("data")),
        ),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )


def _fence_local(tree) -> None:
    """Multi-host-safe fence: a cross-host-sharded array is not fully
    addressable, so :func:`rajni_tpu.utils.timing.fence`'s one-element
    ``device_get`` would raise — pull a ONE-ELEMENT probe from one of THIS
    process's shards instead (completion of the local shards is what the
    H2D-outside-the-timed-region accounting needs; materializing the whole
    shard would drag megabytes over the tunnel per batch)."""
    tree = jax.block_until_ready(tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            np.asarray(jax.device_get(shards[0].data.ravel()[:1]))


def _pad_to_local(images, labels, b_loc: int):
    """Pad a host-local batch up to the FIXED per-host batch ``b_loc``
    (padding labels are -1 so :func:`multihost_eval_step` ignores them).
    One shape ⇒ one compiled program: a variable-size final batch would
    otherwise recompile INSIDE the timed region (~30 s on the tunnel —
    the same hazard :func:`rajni_tpu.eval._pad_to` guards single-host)."""
    from ..eval import _pad_to

    b = labels.shape[0]
    if b > b_loc:
        raise ValueError(
            f"batch of {b} rows exceeds the steady per-host batch {b_loc} "
            "(the first batch must be the largest — reference protocol)"
        )
    return (
        _pad_to(images, b_loc),
        np.concatenate(
            [np.asarray(labels),
             np.full((b_loc - b,), -1, np.asarray(labels).dtype)]
        ),
    )


def local_batch_size(global_batch: int, strict_devices: bool = False) -> int:
    """This process's share of a global batch (validates divisibility by
    the process count; with ``strict_devices`` also by the device count —
    required when the caller does no padding, e.g. the train step, where
    a batch that doesn't split over the data axis fails at step 1)."""
    nproc = jax.process_count()
    ndev = jax.device_count()
    if global_batch % nproc:
        raise ValueError(
            f"global batch {global_batch} not divisible by the process "
            f"count {nproc}"
        )
    if strict_devices and global_batch % ndev:
        raise ValueError(
            f"global batch {global_batch} not divisible by the device "
            f"count {ndev}"
        )
    return global_batch // nproc


def shard_samples(samples):
    """This process's interleaved shard of a sample list (the standard
    distributed-sampler split; shard sizes differ by at most one)."""
    return samples[jax.process_index()::jax.process_count()]


def steps_for(total_rows: int, global_batch: int, processes: int) -> int:
    """The number of eval/train steps EVERY process must execute for a
    ``total_rows``-sample dataset split interleaved over ``processes``
    hosts at ``global_batch`` rows per step.

    Every host can compute this from the (globally known) dataset length
    BEFORE sharding — the per-host loop bound must be identical on every
    controller or the fleet deadlocks in the first collective one host
    skips. Derivation: the largest shard holds ``ceil(total/processes)``
    rows, consumed ``global_batch // processes`` per step."""
    if global_batch % processes:
        raise ValueError(f"{global_batch=} not divisible by {processes=}")
    local_b = global_batch // processes
    largest_shard = -(-total_rows // processes)
    return -(-largest_shard // local_b)


def evaluate_model_multihost(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    dataloader: Iterable,
    mesh: Mesh | None = None,
    impl: str = "xla",
    max_batches: int | None = None,
    warmup: int = 2,
    act_scales=None,
    stage=None,
    num_batches: int | None = None,
    assume_replicated: bool = False,
    local_batch: int | None = None,
) -> tuple[float, float]:
    """Reference-accounting eval over a multi-host mesh → ``(acc, img/s)``.

    ``dataloader`` yields THIS HOST's ``(images, labels)`` slices of each
    global batch (numpy; the standard per-process sampler split). Returns
    the GLOBAL top-1 accuracy and global throughput; all processes return
    the same values (the counters are replicated), so any process may
    print.

    **Every controller must execute the same number of steps** — each
    step is a cross-host collective, and a host that stops early leaves
    the others blocked until the DCN timeout. Pass ``num_batches``
    (:func:`steps_for` computes it from the global dataset length) and
    the loop runs EXACTLY that many steps on every host, fabricating
    all-padding batches (label -1 — zero weight in the counters) once a
    short shard is exhausted. Without ``num_batches`` the dataloaders
    themselves must yield identical counts (true for the synthetic/equal
    split paths). Every batch is padded to the first batch's size so the
    whole run is ONE compiled shape.

    ``assume_replicated=True`` skips the parameter broadcast (pass the
    tree :func:`replicate_to_global` returned — saves re-pushing the
    model through the tunnel when evaluating several schedules).

    ``local_batch`` is the steady per-host batch size every batch is
    padded to. It MUST be a globally-agreed value (global batch /
    processes — the CLI passes it): when omitted it is inferred from this
    host's first batch, which is only safe if every host's first batch
    has the same size (hosts whose interleaved shard is one row short
    would otherwise infer a smaller padded shape and the controllers'
    programs diverge). ``dataloader`` must be re-iterable (a list, not a
    generator): the warmup pass restarts it.

    Single-process (tests, one-host pods) this degrades gracefully to the
    plain DP eval over the local mesh.
    """
    if iter(dataloader) is iter(dataloader):
        # a generator: warmup would consume measured batches silently
        raise ValueError(
            "dataloader must be re-iterable (pass a list, not a generator)"
        )
    if mesh is None:
        mesh = global_mesh()
    step = multihost_eval_step(config, schedule, mesh, impl, act_scales,
                               stage)
    gparams = params if assume_replicated else replicate_to_global(
        params, mesh
    )
    # each process feeds local_devices_on_data rows per global-batch row
    # group; the local batch must split over the process's OWN slice of
    # the data axis
    n_data = mesh.shape["data"]
    if n_data % jax.process_count():
        raise ValueError(
            f"data axis ({n_data}) must be divisible by the process count "
            f"({jax.process_count()})"
        )
    local_div = n_data // jax.process_count()
    # steady per-host batch: the globally-agreed value, or (single-host /
    # equal-shard cases) fixed by the first batch seen
    b_loc = None
    if local_batch is not None:
        b_loc = -(-local_batch // local_div) * local_div
    template = None  # last padded host batch (shapes for blank batches)

    def prepare(x, y):
        nonlocal b_loc, template
        y = np.asarray(y)
        if b_loc is None:
            b_loc = -(-y.shape[0] // local_div) * local_div
        template = _pad_to_local(x, y, b_loc)
        return template

    it = iter(dataloader)
    if warmup > 0:
        for _ in range(warmup):
            try:
                x, y = next(it)
            except StopIteration:
                it = iter(dataloader)
                try:
                    x, y = next(it)
                except StopIteration:
                    raise ValueError(
                        "dataloader yielded no batches (empty dataset?)"
                    ) from None
            g = host_to_global(prepare(x, y), mesh)
            fence(step(gparams, *g))
        it = iter(dataloader)

    correct = 0
    total = 0
    total_time = 0.0
    blank = None  # all-padding batch for hosts whose shard ran short
    i = 0
    while True:
        if max_batches is not None and i >= max_batches:
            break
        if num_batches is not None and i >= num_batches:
            break
        try:
            images, labels = prepare(*next(it))
        except StopIteration:
            if num_batches is None:
                break
            # keep joining the fleet's collectives with a zero-weight batch
            if blank is None:
                if template is None:
                    raise ValueError(
                        "empty dataloader with num_batches set and no "
                        "batch to infer shapes from"
                    ) from None
                blank = (
                    jax.tree_util.tree_map(np.zeros_like, template[0]),
                    np.full_like(template[1], -1),
                )
            images, labels = blank
        gimages, glabels = host_to_global((images, labels), mesh)
        # H2D outside the timed region (reference eval.py:48) — fence the
        # labels too; their copy must not land inside the timer
        _fence_local((gimages, glabels))
        start = time.time()
        c, t = step(gparams, gimages, glabels)
        fence(c)
        total_time += time.time() - start
        correct += int(jax.device_get(c))
        total += int(jax.device_get(t))
        i += 1

    acc = 100.0 * correct / max(total, 1)
    throughput = total / max(total_time, 1e-6)
    return acc, throughput
