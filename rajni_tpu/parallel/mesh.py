"""SPMD parallelism over a TPU device mesh.

The reference has **no** distributed code (SURVEY.md §2 "Parallelism"); this
module is the TPU-native capability equivalent and more: a 2-D
``(data, model)`` :class:`jax.sharding.Mesh` with

  * **data parallelism**: the batch sharded over the ``data`` axis;
    accuracy counters reduce across chips via XLA collectives;
  * **tensor parallelism** (Megatron pattern): QKV/fc1 kernels column-sharded
    and proj/fc2 kernels row-sharded over the ``model`` axis, so each block is
    one column-parallel matmul → local attention/GELU → one row-parallel
    matmul → psum, with XLA's SPMD partitioner inserting the all-reduces on
    ICI automatically.

Everything goes through ``jax.jit`` with sharding annotations — no manual
collectives, no NCCL-style process groups. Multi-host would only add
``jax.distributed.initialize``; the sharded program is unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import ViTConfig, vit_forward
from ..utils.schedule import Schedule


def make_mesh(
    devices=None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def repack_qkv_heads(params: Any) -> Any:
    """Head-aligned TP layout for the packed QKV weights.

    ``qkv.kernel [C, 3C]`` sharded ``P(None, "model")`` splits the packed
    (q|k|v, head, dim) lane order across the q/k/v boundary — correct under
    SPMD but forces an all-gather before the head reshape. Splitting the
    packed axis first — ``[C, 3, C]`` kernel, ``[3, C]`` bias, last axis
    sharded — keeps every shard a whole set of heads (model must divide the
    head count for zero-comm attention), so the only collectives left per
    block are the two row-parallel all-reduces (proj, fc2): the Megatron
    minimum. The forward consumes either layout
    (:func:`rajni_tpu.ops.attention._qkv_projection`); element order is
    unchanged, so this is a pure reshape of the checkpoint, not a permute.
    Int8 quantization records are repacked the same way (int8 ``[C, 3, C]``,
    scale ``[3, C]``).
    """

    def repack_block(block):
        b = dict(block)
        attn = dict(block["attn"])
        qkv = dict(attn["qkv"])
        k = qkv["kernel"]
        if isinstance(k, dict):  # quantized record
            if k["int8"].ndim == 2:
                C = k["int8"].shape[0]
                k = dict(k)
                k["int8"] = k["int8"].reshape(C, 3, C)
                k["scale"] = k["scale"].reshape(3, C)
                qkv["kernel"] = k
        elif k.ndim == 2:
            C = k.shape[0]
            qkv["kernel"] = k.reshape(C, 3, C)
        if qkv["bias"].ndim == 1:
            qkv["bias"] = qkv["bias"].reshape(3, -1)
        attn["qkv"] = qkv
        b["attn"] = attn
        return b

    out = dict(params)
    out["blocks"] = [repack_block(b) for b in params["blocks"]]
    return out


def _maybe_quantized_spec(kernel, spec):
    """Match a PartitionSpec to a plain kernel or an int8 record's leaves.

    A quantized record shards its int8 payload like the plain weight; the
    per-output-channel scale row follows the kernel's *output* axis."""
    if not isinstance(kernel, dict):
        return spec
    out_axis_sharded = len(spec) > 0 and spec[-1] is not None
    ndim = kernel["scale"].ndim
    if out_axis_sharded:
        scale_spec = P(*([None] * (ndim - 1)), "model")
    else:
        scale_spec = P()
    return {"int8": spec, "scale": scale_spec}


def param_pspecs(params: Any) -> Any:
    """PartitionSpecs for a ViT param pytree: Megatron TP over ``model``.

    - ``qkv.kernel`` / ``mlp.fc1.kernel [C, H]``: column-parallel (output
      dim sharded) with matching bias sharding; qkv uses the head-aligned
      ``[C, 3, C]`` layout when present (:func:`repack_qkv_heads`);
    - ``attn.proj.kernel [C, C]`` / ``mlp.fc2.kernel [H, C]``: row-parallel
      (input dim sharded), bias replicated;
    - embeddings, norms, head: replicated (tiny);
    - int8 quantization records shard their payload like the plain weight.
    """

    def block_spec(block):
        qkv_k = block["attn"]["qkv"]["kernel"]
        packed3 = (
            qkv_k["int8"].ndim if isinstance(qkv_k, dict) else qkv_k.ndim
        ) == 3
        qkv_kernel_spec = (
            P(None, None, "model") if packed3 else P(None, "model")
        )
        qkv_bias_spec = (
            P(None, "model")
            if block["attn"]["qkv"]["bias"].ndim == 2
            else P("model")
        )
        spec = {
            "norm1": {"scale": P(), "bias": P()},
            "norm2": {"scale": P(), "bias": P()},
            "attn": {
                "qkv": {
                    "kernel": _maybe_quantized_spec(qkv_k, qkv_kernel_spec),
                    "bias": qkv_bias_spec,
                },
                "proj": {
                    "kernel": _maybe_quantized_spec(
                        block["attn"]["proj"]["kernel"], P("model", None)
                    ),
                    "bias": P(),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": _maybe_quantized_spec(
                        block["mlp"]["fc1"]["kernel"], P(None, "model")
                    ),
                    "bias": P("model"),
                },
                "fc2": {
                    "kernel": _maybe_quantized_spec(
                        block["mlp"]["fc2"]["kernel"], P("model", None)
                    ),
                    "bias": P(),
                },
            },
        }
        if "ls1" in block:
            spec["ls1"] = P()
            spec["ls2"] = P()
        return spec

    head_kernel = params["head"]["kernel"]
    return {
        "patch_embed": {"kernel": P(), "bias": P()},
        "cls_token": P(),
        "pos_embed": P(),
        "blocks": [block_spec(b) for b in params["blocks"]],
        "norm": {"scale": P(), "bias": P()},
        "head": {
            "kernel": _maybe_quantized_spec(head_kernel, P()),
            "bias": P(),
        },
    }


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh with TP shardings.

    With a real ``model`` axis the packed QKV weights are first re-packed
    head-aligned (:func:`repack_qkv_heads`) so TP attention needs no
    all-gather — see ``tests/test_parallel.py``'s compiled-HLO collective
    assertions."""
    if mesh.shape["model"] > 1:
        params = repack_qkv_heads(params)
    specs = param_pspecs(params)
    # quantized records are dicts mirrored by _maybe_quantized_spec, so the
    # two trees always match leaf-for-leaf
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the ``data`` axis (leading dim)."""
    return NamedSharding(mesh, P("data"))


def _pad_batch(images, n_data: int):
    """Zero-pad the batch to a multiple of the data-axis size.

    The eval DataLoader yields a partial final batch (``drop_last=False``,
    reference run.py:75-82) whose size need not divide the mesh — e.g.
    ImageNet-val's trailing 80 images on a 32-chip mesh. Returns
    ``(padded_images, real_batch)``; callers slice the outputs back.
    Tuple batches (the on-device preprocessing ``(canvas, sizes)`` mode,
    :mod:`rajni_tpu.data.device`) pad every leaf along the batch dim.
    """
    if isinstance(images, tuple):
        b = images[0].shape[0]
        return tuple(_pad_batch(e, n_data)[0] for e in images), b
    b = images.shape[0]
    pad = (-b) % n_data
    if pad == 0:
        return images, b  # no copy on the common (full-batch) path
    images = np.concatenate(
        [np.asarray(images),
         np.zeros((pad,) + tuple(images.shape[1:]), np.asarray(images).dtype)],
        axis=0,
    )
    return images, b


def sharded_forward(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh,
    impl: str = "xla",
    stage=None,
):
    """Jitted ``images -> logits`` with DP batch + TP params over ``mesh``.

    The returned callable accepts a host or device batch ``[B, H, W, 3]``
    (B divisible by the ``data`` axis size) and returns replicated logits.

    ``stage`` is an optional in-graph preprocessing callable applied to the
    batch before the forward (e.g. :func:`rajni_tpu.data.device.
    normalize_images` or a ``preprocess_on_device`` partial). Its input may
    be a tuple pytree (``(canvas_u8, sizes)``); every leaf is batch-leading
    and shards over the ``data`` axis — the stage math is per-image, so DP
    composes trivially (VERDICT r2 missing #3; reference equivalence: the
    per-image torchvision transforms at run.py:62-70)."""

    def forward(p, images):
        if stage is not None:
            images = stage(images)
        return vit_forward(p, images, config, schedule, impl)

    if impl != "xla":
        # Pallas kernels are single-chip programs: XLA's SPMD partitioner
        # cannot split a custom call, so under jit-with-shardings it would
        # replicate the kernel (correct but wasted work). Instead map the
        # full per-chip forward over the data axis with shard_map — each
        # chip runs its kernels on its local batch shard. Tensor parallelism
        # (which relies on SPMD inserting collectives inside the matmuls) is
        # XLA-path only.
        if mesh.shape["model"] > 1:
            raise ValueError(
                "tensor parallelism (model axis > 1) requires impl='xla'; "
                "Pallas kernels are per-chip programs"
            )
        mapped = jax.jit(
            jax.shard_map(
                forward,
                mesh=mesh,
                # P("data") is a pytree prefix: tuple batches (canvas mode)
                # shard every leaf on the leading dim
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                # pallas_call outputs carry no varying-mesh-axes metadata
                check_vma=False,
            )
        )
        replicated = jax.device_put(params, NamedSharding(mesh, P()))
        n_data = mesh.shape["data"]

        def apply_pallas(images):
            images, b = _pad_batch(images, n_data)
            images = jax.device_put(images, batch_sharding(mesh))
            return mapped(replicated, images)[:b]

        apply_pallas.input_sharding = batch_sharding(mesh)
        return apply_pallas

    sharded = shard_params(params, mesh)
    fwd = jax.jit(
        forward,
        # params keep their placed (TP) shardings; batch arrives DP-sharded
        # (sharding is a pytree prefix: tuple batches shard every leaf)
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=NamedSharding(mesh, P("data")),
    )

    n_data = mesh.shape["data"]

    def apply(images):
        images, b = _pad_batch(images, n_data)
        images = jax.device_put(images, batch_sharding(mesh))
        return fwd(sharded, images)[:b]

    apply.input_sharding = batch_sharding(mesh)
    return apply


def data_parallel_forward(
    params: Any,
    config: ViTConfig,
    schedule: Schedule | None,
    mesh: Mesh | None = None,
    impl: str = "xla",
    stage=None,
):
    """Convenience: shard over all local devices (1-D data mesh by default)."""
    if mesh is None:
        mesh = make_mesh()
    return sharded_forward(params, config, schedule, mesh, impl, stage=stage)


def eval_step_fn(config: ViTConfig, schedule: Schedule | None, mesh: Mesh):
    """Jitted ``(params, images, labels) -> (correct, total)`` counters.

    The batch-sharded argmax/compare reduces to replicated scalars — the
    TPU-native equivalent of the reference's per-batch host-side accumulation
    (eval.py:61-64), with XLA emitting the cross-chip psum.
    """

    def step(params, images, labels):
        import jax.numpy as jnp

        logits = vit_forward(params, images, config, schedule)
        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((preds == labels).astype(jnp.int32))
        total = jnp.asarray(labels.shape[0], jnp.int32)
        return correct, total

    return jax.jit(
        step,
        in_shardings=(
            None,
            batch_sharding(mesh),
            NamedSharding(mesh, P("data")),
        ),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
