"""AOT model export for serving (StableHLO via ``jax.export``).

Production deployments should not retrace/recompile Python at startup:
:func:`export_model` ahead-of-time lowers the pruned forward — params baked
in, schedule/backend resolved — to a serialized StableHLO artifact that a
serving process rehydrates with :func:`load_exported` and calls directly.
The artifact is self-contained (weights are constants in the program) and
platform-checked by ``jax.export`` at load time.

    from rajni_tpu.export import export_model, load_exported

    export_model("vit_b16.rajni", params, config, schedule, batch=256)
    ...
    serve_fn = load_exported("vit_b16.rajni")
    logits = serve_fn(images)        # [256, H, W, 3] -> [256, 1000]

The reference has no serving/export story (SURVEY.md §1 "no serving layer");
this is TPU-native surface beyond parity.
"""

from __future__ import annotations

import functools
import json
import struct

import jax
import jax.numpy as jnp
from jax import export as _jexport

from .models.vit import ViTConfig, vit_forward
from .utils.schedule import Schedule, normalize_schedule

#: container magic for multi-bucket artifacts (single-program artifacts are
#: the raw jax.export serialization, headerless — format-compatible back to
#: the first export_model)
_BUCKET_MAGIC = b"RAJNI-BUCKETS\x01"


def export_model(
    path: str,
    params,
    config: ViTConfig,
    schedule: Schedule | None = None,
    batch: int | str | list | tuple = 256,
    dtype: jnp.dtype = jnp.bfloat16,
    impl: str = "auto",
    platform: str = "tpu",
    act_scales=None,
) -> None:
    """AOT-lower the forward (params baked in) and serialize it to ``path``.

    The artifact is specific to (batch, resolution, schedule, platform) —
    exactly the static tuple one compiled XLA program covers (SURVEY.md §2
    "critical insight"). ``platform`` pins the target backend explicitly
    (``jax.export`` stamps it into the artifact and refuses to load
    elsewhere), and ``impl="auto"`` resolves against it — NOT against the
    export host's default backend, so a CPU CI host can produce a valid
    TPU artifact.

    ``batch="dynamic"`` exports a batch-POLYMORPHIC artifact
    (``jax.export.symbolic_shape``): one file serves any request size with
    no padding (VERDICT r2 next-round #7). Token/feature dims stay static —
    the pruning arithmetic never depends on batch — so shape polymorphism
    costs nothing in program structure; the serving runtime compiles each
    distinct concrete batch on first use (from the lowered module, no
    Python). Pallas kernels need static grids, so dynamic batch is
    XLA-path only: ``impl="auto"`` resolves to xla and ``impl="pallas"``
    raises — export a fixed-batch pallas artifact for the peak-throughput
    fixed-shape tier and a dynamic xla artifact for the long tail.

    ``batch=[8, 32, 256]`` (a list) exports a MULTI-BUCKET artifact: one
    file carrying one pre-lowered program per bucket. The loader pads each
    request to the smallest sufficient bucket (chunking by the largest when
    the request exceeds it) and slices the logits back — pad-to-nearest
    instead of pad-to-256, so small requests stop paying full-batch latency
    while big batches keep the fused-kernel tier (``impl="auto"`` resolves
    PER BUCKET: small buckets get xla, MXU-saturating ones pallas).
    """
    schedule = normalize_schedule(schedule, config.depth)
    if isinstance(batch, (list, tuple)):
        import os
        import shutil
        import tempfile

        buckets = sorted(set(int(b) for b in batch))
        if not buckets or buckets[0] < 1:
            raise ValueError(f"bucket batches must be positive ints: {batch}")
        # lower ONE bucket at a time, spooling each serialized program to a
        # temp file: every blob embeds the full weights as constants
        # (GB-scale for large models), so holding all buckets in memory at
        # once would multiply peak host memory by the bucket count
        out_dir = os.path.dirname(os.path.abspath(path)) or "."
        lengths: list[int] = []
        tmps: list[str] = []
        try:
            for b in buckets:
                blob = _export_bytes(params, config, schedule, b, dtype,
                                     impl, platform, act_scales)
                fd, name = tempfile.mkstemp(dir=out_dir, suffix=".bkt")
                with os.fdopen(fd, "wb") as tf:
                    tf.write(blob)
                lengths.append(len(blob))
                tmps.append(name)
                del blob
            header = json.dumps(
                {"batches": buckets, "lengths": lengths}
            ).encode()
            with open(path, "wb") as f:
                f.write(_BUCKET_MAGIC)
                f.write(struct.pack(">I", len(header)))
                f.write(header)
                for name in tmps:
                    with open(name, "rb") as g:
                        shutil.copyfileobj(g, f)
        finally:
            for name in tmps:
                if os.path.exists(name):
                    os.unlink(name)
        return
    blob = _export_bytes(params, config, schedule, batch, dtype, impl,
                         platform, act_scales)
    with open(path, "wb") as f:
        f.write(blob)


def _export_bytes(
    params, config, schedule, batch, dtype, impl, platform, act_scales
) -> bytes:
    """Lower ONE (batch|dynamic) program and return its serialization
    (the validation/impl-resolution core of :func:`export_model`)."""
    dynamic = batch == "dynamic"
    if not dynamic and not isinstance(batch, int):
        raise ValueError(f"batch must be an int or 'dynamic', got {batch!r}")
    if dynamic and impl == "pallas":
        raise ValueError(
            "batch='dynamic' requires impl='xla': Pallas kernel grids are "
            "static per batch; export a fixed-batch artifact for the pallas "
            "serving tier"
        )

    if impl == "auto":
        from .models.vit import _PALLAS_MIN_BATCH

        impl = (
            "pallas"
            if platform == "tpu" and not dynamic
            and batch >= _PALLAS_MIN_BATCH
            # "auto" must also consider the EXPORTING host: Mosaic can
            # only lower on a TPU-attached host, and the xla artifact is
            # valid on TPU too — so a CPU CI host exporting --platform
            # tpu degrades to xla instead of hitting the loud pallas
            # guard below (which stays for the EXPLICIT --kernels pallas)
            and jax.default_backend() == "tpu"
            else "xla"
        )
    if impl == "pallas" and platform != "tpu":
        # Mosaic kernels are TPU programs; baking them into an artifact
        # pinned to another platform produces a file the serving host can
        # never run. (The guard checks the TARGET platform, not this
        # host's backend — a TPU dev host exporting --platform cpu must
        # fail just as loudly.)
        raise ValueError(
            f"impl='pallas' cannot target platform={platform!r}; export "
            "with --kernels xla for non-TPU serving"
        )
    if impl == "pallas" and jax.default_backend() != "tpu":
        # kernels auto-switch to interpret mode off-TPU (kernels.math.
        # use_interpret), which would bake python callbacks into the
        # artifact — unloadable on the serving host. Fail loudly instead.
        raise ValueError(
            "impl='pallas' export requires a TPU-attached host (Mosaic "
            "lowering); export with --kernels xla from this host, or "
            "export on TPU"
        )

    # act_scales (rajni_tpu.quant.ActScales, int8 params only) bakes the
    # calibrated static-scale kernels into the artifact — the scales are
    # trace-time constants, exactly what an AOT artifact wants.
    if act_scales is not None and impl == "xla":
        print("WARNING: act_scales only apply to the pallas kernel route; "
              "this xla-path artifact stays fully dynamic")
    fn = jax.jit(
        functools.partial(
            vit_forward, params, config=config, schedule=schedule,
            impl=impl, act_scales=act_scales,
        )
    )
    if dynamic:
        shape = _jexport.symbolic_shape(
            f"b, {config.img_size}, {config.img_size}, 3"
        )
    else:
        shape = (batch, config.img_size, config.img_size, 3)
    spec = jax.ShapeDtypeStruct(shape, dtype)
    exported = _jexport.export(fn, platforms=[platform])(spec)
    return exported.serialize()


def load_exported(path: str):
    """Rehydrate an artifact saved by :func:`export_model`.

    Returns a callable ``images -> logits`` running the pre-lowered program
    (no Python model code, no retracing; jit-wrapped so repeat calls hit the
    executable cache). The callable's ``input_spec`` attribute carries the
    baked input aval; ``dynamic_batch`` is True for batch-polymorphic
    artifacts (``export_model(batch="dynamic")``), which accept any leading
    batch size directly — fixed-batch artifacts accept exactly their baked
    ``(batch, H, W, 3)`` shape, so callers with fewer images pad up to it
    and slice the logits (see ``examples/serve.py``).

    Multi-bucket artifacts (``export_model(batch=[8, 32, 256])``) come back
    with ``buckets`` set (ascending list); the callable then accepts ANY
    leading batch size — each request is padded to the smallest sufficient
    bucket (chunked by the largest when it exceeds it) and the logits are
    sliced back to the request size. Single-program artifacts have
    ``buckets = None``.
    """
    with open(path, "rb") as f:
        raw = f.read()

    if raw.startswith(_BUCKET_MAGIC):
        off = len(_BUCKET_MAGIC)
        (hlen,) = struct.unpack(">I", raw[off:off + 4])
        off += 4
        header = json.loads(raw[off:off + hlen].decode())
        off += hlen
        batches, fns, avals = header["batches"], [], []
        for blen in header["lengths"]:
            exported = _jexport.deserialize(raw[off:off + blen])
            off += blen
            fns.append(jax.jit(exported.call))
            avals.append(exported.in_avals[0])
        largest = batches[-1]

        def serve(images):
            b = int(images.shape[0])
            if b <= largest:
                for cap, fn in zip(batches, fns):
                    if b <= cap:
                        if b < cap:
                            pad = jnp.zeros(
                                (cap - b,) + tuple(images.shape[1:]),
                                images.dtype,
                            )
                            images = jnp.concatenate(
                                [jnp.asarray(images), pad]
                            )
                        return fn(images)[:b]
            out = [
                serve(images[i:i + largest])
                for i in range(0, b, largest)
            ]
            return jnp.concatenate(out)

        serve.input_spec = avals[-1]
        serve.dynamic_batch = False
        serve.buckets = list(batches)
        return serve

    exported = _jexport.deserialize(raw)
    jitted = jax.jit(exported.call)

    def serve(images):
        return jitted(images)

    serve.input_spec = exported.in_avals[0]
    serve.dynamic_batch = not isinstance(
        exported.in_avals[0].shape[0], int
    )
    serve.buckets = None
    return serve


def main(argv=None) -> None:
    """CLI: ``python -m rajni_tpu.export ckpt.msgpack model.rajni
    --model vit_base_patch16_224 --schedule sched.json --batch 256``."""
    import argparse

    from .models.vit import get_config
    from .params.io import load_params
    from .utils.schedule import load_schedule

    p = argparse.ArgumentParser("rajni-tpu AOT serving export")
    p.add_argument("checkpoint", help="params checkpoint (msgpack/orbax)")
    p.add_argument("output", help="output artifact path (.rajni)")
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--schedule", default=None, help="pruning schedule JSON")
    p.add_argument("--batch", default="256",
                   help="fixed batch size; 'dynamic' for a batch-"
                        "polymorphic artifact (xla kernels only); or a "
                        "comma list '8,32,256' for a multi-bucket artifact "
                        "(requests pad to the smallest sufficient bucket)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantize", action="store_true",
                   help="int8-quantize weights before export (rajni_tpu.quant)")
    p.add_argument("--act_scales", default=None, metavar="FILE",
                   help="with --quantize: calibrated static activation "
                        "scales JSON (rajni_tpu.run --save_scales / "
                        "ActScales.save) — bakes the static-scale int8 "
                        "kernels into the artifact")
    p.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--platform", default="tpu",
                   choices=["tpu", "cpu", "cuda"],
                   help="target backend baked into the artifact")
    args = p.parse_args(argv)

    config = get_config(args.model)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = load_params(args.checkpoint, dtype=dtype)
    # extended-variant checkpoints (qk-norm / pooled head / registers /
    # distillation) carry their semantics in the param tree, not the model
    # name — adapt like the eval/train CLIs do, or the baked program would
    # silently ignore e.g. dist_token/head_dist
    from .models.vit import adapt_config_to_params

    adapted = adapt_config_to_params(config, params)
    if adapted != config:
        config = adapted
        print("Adapted config to checkpoint variant: "
              f"qk_norm={config.qk_norm} global_pool={config.global_pool} "
              f"reg_tokens={config.reg_tokens} distilled={config.distilled}")
    act_scales = None
    if args.act_scales:
        if not args.quantize:
            raise ValueError("--act_scales requires --quantize")
        from .quant import ActScales

        act_scales = ActScales.load(args.act_scales)
    if args.quantize:
        from .quant import quantize_params

        params = quantize_params(params)
    schedule = (
        load_schedule(args.schedule, config.depth) if args.schedule else None
    )
    if args.batch == "dynamic":
        batch: int | str | list = args.batch
    elif "," in args.batch:
        batch = [int(x) for x in args.batch.split(",") if x]
    else:
        batch = int(args.batch)
    export_model(args.output, params, config, schedule, batch, dtype,
                 args.kernels, args.platform, act_scales=act_scales)
    import os

    print(f"exported {args.model} (batch {args.batch}, "
          f"{'int8' if args.quantize else args.dtype}) -> {args.output} "
          f"({os.path.getsize(args.output) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
