"""CLI evaluation driver.

Flag surface mirrors the reference CLI (`/root/reference/rajni/run.py:17-43`)
— ``--data_path --batch_size --num_workers --pin_mem --model --device
--schedule --warmup --max_batches --compare_base`` — plus TPU-native
extensions:

  * ``--dtype {bfloat16,float32}``: activation/param precision (bf16 default —
    the MXU-native inference dtype).
  * ``--checkpoint``: load converted pretrained params (see
    :mod:`rajni_tpu.params`); without it, randomly initialized params are used
    (throughput valid, accuracy meaningless) with a loud warning.
  * ``--synthetic N``: benchmark against N synthetic batches with no dataset
    on disk.
  * ``--data_parallel``: shard the batch across all local devices on a 1-D
    mesh (see :mod:`rajni_tpu.parallel`).
  * ``--tensor_parallel N`` / ``--pipeline_parallel N``: Megatron TP over a
    ``model`` mesh axis and GPipe PP over a ``pipe`` axis; they compose into
    a ``(data, pipe, model)`` mesh, with the leftover devices data-parallel
    (see :mod:`rajni_tpu.parallel.mesh` / :mod:`rajni_tpu.parallel.pipeline`).

The reference's schedule-key bug (str JSON keys never matching int block
indices, run.py:118-119 vs model.py:14 — so its CLI silently never pruned) is
fixed by :func:`rajni_tpu.utils.schedule.load_schedule`.

Behavioral parity notes: requires ``--schedule`` like the reference
(run.py:115-116); prints args, dataset size, per-model acc/throughput, and
with ``--compare_base`` the speedup/accuracy-drop summary (run.py:150-157).
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from .data.pipeline import DataLoader, ImageFolder, SyntheticLoader
from .eval import evaluate_model
from .models.vit import get_config, init_params, model_stats, vit_forward
from .utils.schedule import load_schedule, schedule_to_dict


def get_args(argv=None):
    parser = argparse.ArgumentParser("RAJNI-TPU Evaluation", add_help=True)

    # Dataset / loader (reference run.py:20-25)
    parser.add_argument("--data_path", type=str, default=None,
                        help="Path to ImageNet-style dataset root")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--pin_mem", action="store_true", default=True,
                        help="Accepted for flag parity; JAX device_put always "
                             "stages through pinned transfer buffers")

    # Model (reference run.py:27-30)
    parser.add_argument("--model", type=str, default="vit_base_patch16_224")
    parser.add_argument("--device", type=str, default=None,
                        help="JAX platform to prefer (e.g. tpu, cpu); default "
                             "is JAX's device order")

    # RAJNI (reference run.py:32-34)
    parser.add_argument("--schedule", type=str, default=None,
                        help="Path to JSON pruning schedule")

    # Eval (reference run.py:36-41)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--compare_base", action="store_true")

    # TPU-native extensions
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Params checkpoint: native msgpack/orbax, or a "
                             "raw torch .pth/.pt (timm state_dict, converted "
                             "on the fly incl. pos-embed resampling)")
    parser.add_argument("--artifact", type=str, default=None, metavar="FILE",
                        help="Evaluate an exported .rajni serving artifact "
                             "(rajni_tpu.export) with the full harness — "
                             "same accounting as a live model. Weights, "
                             "schedule, kernels, and dtype are baked into "
                             "the artifact, so --checkpoint/--schedule/"
                             "--quantize/--kernels/parallelism flags are "
                             "rejected; batch size follows the artifact "
                             "(fixed artifacts pad the ragged final batch)")
    parser.add_argument("--synthetic", type=int, default=None, metavar="N",
                        help="Use N synthetic batches instead of --data_path")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard batches across all local devices")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        metavar="N",
                        help="Megatron tensor parallelism: shard heads/"
                             "hidden over an N-wide `model` mesh axis; the "
                             "remaining devices form the `data` axis "
                             "(rajni_tpu.parallel.mesh — works on both "
                             "kernel backends, incl. --quantize)")
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        metavar="N",
                        help="GPipe pipeline parallelism: stage the blocks "
                             "over an N-wide `pipe` mesh axis for over-HBM "
                             "models; composes with --tensor_parallel into "
                             "a (data, pipe, model) mesh "
                             "(rajni_tpu.parallel.pipeline — XLA-ops "
                             "backend, plain bf16/f32 params)")
    parser.add_argument("--microbatch", type=int, default=None, metavar="M",
                        help="With --pipeline_parallel: in-flight GPipe "
                             "microbatches (default 2*pipe); utilization "
                             "is M/(M+pipe-1)")
    parser.add_argument("--distributed", action="store_true",
                        help="Multi-HOST (DCN) data parallelism: join the "
                             "JAX multi-controller runtime, shard the "
                             "dataset per process, evaluate over the "
                             "global mesh (rajni_tpu.parallel.multihost). "
                             "Launch one identical process per host.")
    parser.add_argument("--coordinator", type=str, default=None,
                        metavar="HOST:PORT",
                        help="With --distributed off a TPU pod: the "
                             "coordinator address (pods autodetect)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="With --coordinator: total process count")
    parser.add_argument("--process_id", type=int, default=None,
                        help="With --coordinator: this process's index")
    parser.add_argument("--kernels", type=str, default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="Attention/MLP backend: fused Pallas kernels "
                             "(default on TPU) or the lax reference path")
    parser.add_argument("--quantize", action="store_true",
                        help="Int8-quantize MLP + attention-projection "
                             "weights (dynamic per-token activation scales; "
                             "changes numerics — see rajni_tpu.quant)")
    parser.add_argument("--calibrate", type=int, default=0, metavar="N",
                        help="With --quantize: calibrate static int8 "
                             "activation scales on the first N loader "
                             "batches (PTQ; removes the per-row dynamic "
                             "quantize passes from the int8 kernels — see "
                             "rajni_tpu.quant.calibrate_act_scales)")
    parser.add_argument("--save_scales", default=None, metavar="FILE",
                        help="With --calibrate: also write the calibrated "
                             "scales (RAJNI-schedule forward) to a JSON "
                             "file for rajni_tpu.export --act_scales")
    parser.add_argument("--load_scales", default=None, metavar="FILE",
                        help="With --quantize: use previously saved static "
                             "int8 activation scales (--save_scales output) "
                             "for the RAJNI evaluation instead of "
                             "calibrating — the calibrate-once/serve-"
                             "anywhere flow, and the only static-scale "
                             "path under --distributed (per-host "
                             "calibration would diverge the controllers' "
                             "programs). The base model in --compare_base "
                             "stays dynamic int8 (the file carries the "
                             "RAJNI-schedule scales).")
    parser.add_argument("--preprocess", type=str, default="host",
                        choices=["host", "device", "device-full"],
                        help="Where eval preprocessing runs (rajni_tpu.data."
                             "device): 'host' = reference protocol (fp32 "
                             "H2D); 'device' = host geometry + uint8 H2D + "
                             "on-device normalize (4x less H2D, bit-exact); "
                             "'device-full' = decode-only host, resize/crop/"
                             "normalize on the TPU via in-graph PIL-exact "
                             "bicubic weight matrices (exact for images "
                             "fitting --canvas; larger ones pre-shrink on "
                             "the host first = double resample)")
    parser.add_argument("--canvas", type=int, default=512,
                        help="uint8 decode-canvas side for "
                             "--preprocess device-full")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of the RAJNI "
                             "evaluation into DIR (view with TensorBoard) — "
                             "the TPU equivalent of the reference's "
                             "cudnn.benchmark/synchronize instrumentation")
    parser.add_argument("--seed", type=int, default=0)

    return parser.parse_args(argv)


def resolve_kernels(kernels: str = "auto", batch: int = 256) -> str:
    """``auto`` → fused Pallas kernels on TPU (at the measured batch
    crossover), lax reference elsewhere. Delegates to
    :func:`rajni_tpu.models.vit.resolve_impl`."""
    from .models.vit import resolve_impl

    return resolve_impl(kernels, batch)


def make_preprocess_stage(preprocess, config, dtype=jnp.bfloat16):
    """In-graph preprocessing stage for a ``--preprocess`` mode (or None).

    The stage runs *inside* the jitted forward, so XLA fuses the normalize
    into the patch-embed load; under ``--data_parallel`` it runs sharded
    over the ``data`` axis (the math is per-image — reference equivalence:
    the per-image torchvision transforms at run.py:62-70 impose no
    batch-level coupling either)."""
    if preprocess == "device":
        from .data.device import normalize_images

        return lambda images: normalize_images(images, dtype)
    if preprocess == "device-full":
        from .data.device import preprocess_on_device

        def stage(images):
            canvas, sizes = images
            return preprocess_on_device(
                canvas, sizes, crop=config.img_size,
                resize=int(config.img_size * 256 / 224), dtype=dtype,
            )

        return stage
    return None


def make_model_fn(params, config, schedule, data_parallel=False,
                  kernels="auto", preprocess="host", dtype=jnp.bfloat16,
                  act_scales=None, tensor_parallel=1, pipeline_parallel=1,
                  microbatch=None):
    """Jitted logits fn closed over params; optionally batch-sharded.

    ``kernels="auto"`` is passed through and resolved per-batch at trace
    time (:func:`rajni_tpu.models.vit.resolve_impl`). ``preprocess``
    prepends the on-device stage matching the loader's output mode
    (:func:`make_preprocess_stage`); it composes with ``--data_parallel``
    on both kernel backends. ``act_scales`` (``--calibrate``) selects the
    calibrated static-scale int8 path (static jit arg).

    ``pipeline_parallel > 1`` routes through the GPipe pipeline over a
    ``(data, pipe[, model])`` mesh (:mod:`rajni_tpu.parallel.pipeline`);
    ``tensor_parallel > 1`` alone routes through Megatron TP over a
    ``(data, model)`` mesh (:func:`rajni_tpu.parallel.mesh.sharded_forward`).
    Either way the leftover devices form the ``data`` axis, so
    ``data_parallel`` is implied."""
    impl = kernels
    stage = make_preprocess_stage(preprocess, config, dtype)

    if pipeline_parallel > 1:
        from .parallel.pipeline import make_pipe_mesh, pipeline_forward

        mesh = make_pipe_mesh(
            pipe=pipeline_parallel, model=tensor_parallel
        )
        # the pipeline's lax.switch stage programs are XLA-ops by design
        # (kernels are per-chip programs; see parallel/pipeline.py)
        return pipeline_forward(
            params, config, schedule, mesh, microbatch=microbatch,
            impl="xla", stage=stage,
        )

    if tensor_parallel > 1:
        from .parallel.mesh import make_mesh, sharded_forward

        mesh = make_mesh(model=tensor_parallel)
        return sharded_forward(
            params, config, schedule, mesh, impl=impl, stage=stage,
            act_scales=act_scales,
        )

    if data_parallel:
        from .parallel.mesh import data_parallel_forward

        return data_parallel_forward(
            params, config, schedule, impl=impl, stage=stage,
            act_scales=act_scales,
        )

    def forward(p, images, config, schedule, impl, act_scales):
        if stage is not None:
            images = stage(images)
        return vit_forward(p, images, config, schedule, impl, act_scales)

    fwd = jax.jit(forward, static_argnums=(2, 3, 4, 5))
    return functools.partial(
        fwd, params, config=config, schedule=schedule, impl=impl,
        act_scales=act_scales,
    )


def _eval_artifact(args, device):
    """Evaluate an exported serving artifact with the reference harness.

    Closes the deploy loop: the exact program a server will run
    (``rajni_tpu.export`` StableHLO, weights/schedule/kernels baked) gets
    the same top-1/throughput accounting as a live model. Fixed-batch
    artifacts drive the loader at their baked batch and pad the ragged
    final batch on device (logits sliced back — accounting unchanged);
    bucket/dynamic artifacts take ``--batch_size`` as-is.
    """
    from .export import load_exported

    rejected = {
        "--checkpoint": args.checkpoint,
        "--schedule": args.schedule,
        "--quantize": args.quantize,
        "--calibrate": args.calibrate,
        "--load_scales": args.load_scales,
        "--save_scales": args.save_scales,
        "--compare_base": args.compare_base,
        "--data_parallel": args.data_parallel,
        "--distributed": args.distributed,
        "--tensor_parallel": args.tensor_parallel > 1,
        "--pipeline_parallel": args.pipeline_parallel > 1,
        "--kernels": args.kernels != "auto",
    }
    bad = [k for k, v in rejected.items() if v]
    if bad:
        raise ValueError(
            f"--artifact evaluates a baked program; {', '.join(bad)} "
            "cannot apply — set them at export time (rajni_tpu.export)"
        )
    if args.preprocess != "host":
        raise ValueError(
            "--artifact expects normalized float inputs (the exported "
            "program starts at the model); use --preprocess host"
        )

    serve = load_exported(args.artifact)
    img_size = int(serve.input_spec.shape[1])
    in_dtype = serve.input_spec.dtype
    fixed = not serve.dynamic_batch and not serve.buckets
    batch = int(serve.input_spec.shape[0]) if fixed else args.batch_size
    kind = ("fixed" if fixed
            else f"buckets {serve.buckets}" if serve.buckets else "dynamic")
    print(f"\nArtifact {args.artifact}: {img_size}px, batch {kind}, "
          f"{jnp.dtype(in_dtype).name}")
    if fixed and batch != args.batch_size:
        print(f"NOTE: loader batch follows the artifact ({batch}), "
              f"not --batch_size ({args.batch_size})")

    if args.synthetic is not None:
        loader = SyntheticLoader(
            num_batches=args.synthetic, batch_size=batch,
            img_size=img_size, seed=args.seed,
        )
        print(f"Using {args.synthetic} synthetic batches of {batch} "
              "(accuracy not meaningful)")
    else:
        if args.data_path is None:
            raise ValueError("provide --data_path or --synthetic N")
        dataset = ImageFolder(args.data_path, img_size=img_size)
        loader = DataLoader(dataset, batch_size=batch,
                            num_workers=args.num_workers)
        print(f"Loaded validation set: {len(dataset)} images, "
              f"{len(dataset.classes)} classes")

    def fn(x):
        x = jnp.asarray(x, in_dtype)
        if fixed and x.shape[0] != batch:
            pad = jnp.zeros((batch - x.shape[0],) + tuple(x.shape[1:]),
                            x.dtype)
            return serve(jnp.concatenate([x, pad]))[: x.shape[0]]
        return serve(x)

    import contextlib

    trace_cm = contextlib.nullcontext()
    if args.profile:
        trace_cm = jax.profiler.trace(args.profile)
        print(f"Profiling to {args.profile}")
    with trace_cm:
        acc, throughput = evaluate_model(
            fn, loader, device=device,
            warmup=args.warmup, max_batches=args.max_batches,
        )
    print(f"\nArtifact model: top-1 {acc:.3f}% | {throughput:.1f} img/s")
    return acc, throughput


def main(argv=None):
    args = get_args(argv)

    print("\nArgs:")
    for k, v in vars(args).items():
        print(f"  {k}: {v}")

    if args.tensor_parallel > 1 or args.pipeline_parallel > 1:
        if args.distributed:
            raise ValueError(
                "--tensor_parallel/--pipeline_parallel are single-"
                "controller (ICI) meshes; --distributed shards data over "
                "hosts (DCN) — TP/PP across DCN is not supported"
            )
    if args.pipeline_parallel > 1:
        if args.quantize:
            raise ValueError(
                "--pipeline_parallel supports plain bf16/f32 params; int8 "
                "is not wired — PP exists for models whose bf16 weights "
                "exceed a chip, use --quantize to *avoid* PP instead"
            )
        if args.preprocess == "device-full":
            raise ValueError(
                "--preprocess device-full (canvas tuples) is not wired "
                "through --pipeline_parallel; use host or device"
            )
        if args.kernels == "pallas":
            print("NOTE: --pipeline_parallel stage programs are XLA-ops "
                  "by design; ignoring --kernels pallas")
    elif args.microbatch:
        print("NOTE: --microbatch has no effect without --pipeline_parallel")

    if args.distributed:
        # must run before the first jax.devices() — joining the
        # multi-controller runtime changes what that call returns
        from .parallel import multihost

        if args.quantize and args.calibrate:
            raise ValueError(
                "--calibrate with --distributed is unsupported: per-host "
                "calibration batches would bake DIFFERENT static scales "
                "into each controller's program (undefined SPMD). "
                "Calibrate single-host with --save_scales and bake the "
                "scales at export time (rajni_tpu.export --act_scales)."
            )
        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)
        print(f"Distributed: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices")

    device = None
    if args.device:
        device = jax.devices(args.device)[0]
    else:
        device = jax.devices()[0]
    print(f"\nJAX devices: {jax.devices()} (using {device})")

    if args.artifact:
        return _eval_artifact(args, device)

    # --kernels auto must honor the *target* device, not the default
    # backend: on a TPU host, --device cpu would otherwise resolve to
    # Pallas kernels that cannot lower for CPU.
    kernels = args.kernels
    if kernels == "auto" and device.platform != "tpu":
        kernels = "xla"
    elif kernels == "pallas" and device.platform != "tpu":
        print("WARNING: --kernels pallas on a non-TPU device runs the "
              "Mosaic interpreter only if the default backend is non-TPU; "
              "expect a compile failure or extreme slowness")

    config = get_config(args.model)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # ---- Dataset ----
    if args.synthetic is not None:
        if args.preprocess != "host":
            print("WARNING: --synthetic yields preprocessed float batches; "
                  "forcing --preprocess host")
            args.preprocess = "host"
        loader = SyntheticLoader(
            num_batches=args.synthetic,
            batch_size=args.batch_size,
            img_size=config.img_size,
            num_classes=config.num_classes,
            seed=args.seed,
        )
        print(f"\nUsing {args.synthetic} synthetic batches "
              f"of {args.batch_size} (accuracy not meaningful)")
    else:
        if args.data_path is None:
            raise ValueError("provide --data_path or --synthetic N")
        output = {"host": "float32", "device": "uint8",
                  "device-full": "canvas"}[args.preprocess]
        dataset = ImageFolder(args.data_path, img_size=config.img_size,
                              output=output, canvas=args.canvas)
        loader = DataLoader(
            dataset, batch_size=args.batch_size, num_workers=args.num_workers
        )
        print(f"\nLoaded validation set: {len(dataset)} images, "
              f"{len(dataset.classes)} classes")

    dist_num_batches = None
    if args.distributed and jax.process_count() > 1:
        # per-process dataset shard: each host loads 1/Nth of the samples
        # and feeds 1/Nth of the global batch (the interleaved split is
        # the standard distributed-sampler layout; accuracy counters are
        # order-invariant, so accounting matches the single-host run)
        from .parallel.multihost import (
            local_batch_size,
            shard_samples,
            steps_for,
        )

        pid, nproc = jax.process_index(), jax.process_count()
        local_b = local_batch_size(args.batch_size)
        if args.synthetic is not None:
            dist_num_batches = args.synthetic  # equal on every host
            loader = SyntheticLoader(
                num_batches=args.synthetic,
                batch_size=local_b,
                img_size=config.img_size,
                num_classes=config.num_classes,
                seed=args.seed + 100003 * pid,  # distinct data per host
            )
        else:
            # every controller must run the same number of eval steps —
            # steps_for derives it from the PRE-SHARD dataset length, so
            # hosts whose interleaved shard runs short pad with
            # zero-weight batches instead of leaving the others blocked
            # in a collective
            dist_num_batches = steps_for(
                len(dataset), args.batch_size, nproc
            )
            dataset.samples = shard_samples(dataset.samples)
            loader = DataLoader(
                dataset, batch_size=local_b,
                num_workers=args.num_workers,
            )
            print(f"Process {pid}: local shard {len(dataset)} images, "
                  f"{dist_num_batches} global steps")

    # ---- Params ----
    if args.checkpoint:
        from .models.vit import adapt_config_to_params
        from .params.io import load_checkpoint_auto

        params = load_checkpoint_auto(args.checkpoint, args.model, dtype=dtype)
        print(f"Loaded params from {args.checkpoint}")
        # extended-variant checkpoints (qk-norm / pooled head / registers)
        # carry their semantics in the tree, not the model name
        adapted = adapt_config_to_params(config, params)
        if adapted != config:
            config = adapted
            print("Adapted config to checkpoint variant: "
                  f"qk_norm={config.qk_norm} global_pool={config.global_pool} "
                  f"reg_tokens={config.reg_tokens} "
                  f"distilled={config.distilled}")
    else:
        params = init_params(jax.random.key(args.seed), config, dtype)
        print("WARNING: no --checkpoint given; using randomly initialized "
              "params (throughput valid, accuracy meaningless)")

    if args.calibrate and not args.quantize:
        raise ValueError("--calibrate requires --quantize")
    if args.save_scales and not (args.quantize and args.calibrate):
        # validate up front: the base-model evaluation can take a long
        # time, and failing only afterwards would throw that work away
        raise ValueError("--save_scales requires --quantize --calibrate N")
    if args.load_scales:
        if not args.quantize:
            raise ValueError("--load_scales requires --quantize")
        if args.calibrate:
            raise ValueError(
                "--load_scales and --calibrate are mutually exclusive "
                "(loading replaces calibration)"
            )

    # Calibration batches must be captured BEFORE quantize_params — the
    # calibration forward runs on the unquantized weights — and pushed
    # through the same preprocess stage the eval path will use, so the
    # scales see exactly the deployment activations. Scales depend on the
    # schedule (token mixes differ), so each model below calibrates with
    # its own schedule from the shared batch list.
    calib_batches = None
    if args.quantize and args.calibrate:
        stage = make_preprocess_stage(args.preprocess, config, dtype)
        calib_batches = []
        for i, (imgs, _labels) in enumerate(loader):
            if i >= args.calibrate:
                break
            # tree-wise: canvas mode yields a TUPLE (canvas_u8, sizes)
            imgs = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, imgs), device
            )
            calib_batches.append(imgs if stage is None else stage(imgs))
        print(f"Captured {len(calib_batches)} calibration batches")
        if not calib_batches:
            raise ValueError(
                "--calibrate captured 0 batches (empty dataset/loader?)"
            )
        if kernels == "xla":
            print("WARNING: --calibrate has no effect on the xla kernel "
                  "route (static scales apply to the pallas kernels only; "
                  "this evaluation stays dynamic int8)")

    raw_params = params
    if args.quantize:
        from .quant import quantize_params

        params = quantize_params(params)
        print("Quantized MLP + attention-projection weights to int8")

    loaded_scales = None
    if args.load_scales:
        from .quant import ActScales

        loaded_scales = ActScales.load(args.load_scales)
        if len(loaded_scales.blocks) != config.depth:
            raise ValueError(
                f"{args.load_scales} holds scales for "
                f"{len(loaded_scales.blocks)} blocks but {args.model} "
                f"has {config.depth} — calibrate with the serving model"
            )
        print(f"Loaded static int8 activation scales from "
              f"{args.load_scales}")
        if kernels == "xla":
            print("WARNING: --load_scales has no effect on the xla kernel "
                  "route (static scales apply to the pallas kernels only; "
                  "this evaluation stays dynamic int8)")

    def calibrated_scales(sched):
        if loaded_scales is not None:
            # the file carries the RAJNI-schedule scales (what
            # --save_scales wrote); the base comparison stays dynamic
            return loaded_scales if sched is not None else None
        if not calib_batches:
            return None
        from .quant import calibrate_act_scales

        scales = calibrate_act_scales(raw_params, calib_batches, config,
                                      sched)
        print("Calibrated static int8 activation scales "
              f"({'pruned' if sched else 'base'} forward)")
        return scales

    dist_ctx = {}

    def run_eval(sched, act_scales):
        """Dispatch one evaluation: multi-host, single-host DP, or plain."""
        if args.distributed:
            from .parallel.multihost import (
                evaluate_model_multihost,
                global_mesh,
                replicate_to_global,
            )

            if not dist_ctx:
                # built once: --compare_base runs two evaluations, and
                # re-replicating the full parameter tree (hundreds of MB
                # through the tunnel) or rebuilding the mesh per eval is
                # pure waste
                dist_ctx["mesh"] = global_mesh()
                dist_ctx["params"] = replicate_to_global(
                    params, dist_ctx["mesh"]
                )
                dist_ctx["stage"] = make_preprocess_stage(
                    args.preprocess, config, dtype
                )
            return evaluate_model_multihost(
                dist_ctx["params"], config, sched, loader,
                mesh=dist_ctx["mesh"], impl=kernels,
                max_batches=args.max_batches, warmup=args.warmup,
                act_scales=act_scales,
                stage=dist_ctx["stage"],
                num_batches=dist_num_batches,
                assume_replicated=True,
                # globally-agreed steady per-host batch: hosts whose
                # interleaved shard runs one row short must not infer a
                # smaller padded shape from their own first batch
                local_batch=args.batch_size // jax.process_count(),
            )
        fn = make_model_fn(params, config, sched, args.data_parallel,
                           kernels, args.preprocess, dtype,
                           act_scales=act_scales,
                           tensor_parallel=args.tensor_parallel,
                           pipeline_parallel=args.pipeline_parallel,
                           microbatch=args.microbatch)
        return evaluate_model(
            fn, loader, device=device,
            warmup=args.warmup, max_batches=args.max_batches,
        )

    # Compute ALL calibrated scales up front so the device-resident
    # calibration batches (≈0.15 GB each at batch 256/224px) are freed
    # before EITHER long evaluation — not just the RAJNI one. The
    # missing-schedule ValueError stays after the base eval (reference
    # error-ordering parity, run.py:115-116), which is why this only
    # pre-loads the schedule when one was actually given.
    base_scales = calibrated_scales(None) if args.compare_base else None
    rajni_scales = None
    schedule = (
        load_schedule(args.schedule, config.depth)
        if args.schedule is not None else None
    )
    if calib_batches:
        if schedule is not None:
            rajni_scales = calibrated_scales(schedule)
        # free even when --schedule was forgotten: the base eval below
        # must not run with the calibration batches pinned in HBM just
        # because the run will error afterwards
        calib_batches.clear()

    # ---- Base model (optional comparison, reference run.py:97-110) ----
    base_acc = base_tput = None
    if args.compare_base:
        print("\nEvaluating BASE model")
        base_acc, base_tput = run_eval(None, base_scales)
        print(f"Base  - Accuracy: {base_acc:.2f}%, "
              f"Throughput: {base_tput:.1f} img/s")

    # ---- RAJNI model (reference run.py:113-145) ----
    if schedule is None:
        raise ValueError("You must provide --schedule for RAJNI evaluation")

    print("\nLoaded RAJNI schedule:")
    for k, v in schedule_to_dict(schedule).items():
        print(f"  Layer {k}: {v}")
    print(f"Token counts per block: "
          f"{model_stats(config, schedule)['token_counts']}")

    print("\nEvaluating RAJNI model")
    if rajni_scales is None:
        rajni_scales = calibrated_scales(schedule)
    if args.save_scales:
        rajni_scales.save(args.save_scales)
        print(f"Saved calibrated scales to {args.save_scales}")
    import contextlib

    if args.profile:
        trace_cm = jax.profiler.trace(args.profile)
        print(f"Profiling to {args.profile}")
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        rajni_acc, rajni_tput = run_eval(schedule, rajni_scales)
    print(f"RAJNI - Accuracy: {rajni_acc:.2f}%, "
          f"Throughput: {rajni_tput:.1f} img/s")

    # ---- Speedup summary (reference run.py:150-157) ----
    if args.compare_base:
        speedup = rajni_tput / base_tput
        acc_drop = base_acc - rajni_acc
        print(f"\nSpeedup: {speedup:.2f}x | Accuracy drop: {acc_drop:.2f}%")
        return {"base": (base_acc, base_tput),
                "rajni": (rajni_acc, rajni_tput),
                "speedup": speedup, "acc_drop": acc_drop}
    return {"rajni": (rajni_acc, rajni_tput)}


if __name__ == "__main__":
    main()
