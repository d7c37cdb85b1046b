"""Analytic schedule design: "I want 1.3× — what schedule do I write?"

The reference leaves schedule construction entirely to hand-tuning
(`/root/reference/README.md:75-82` documents the format, nothing picks the
numbers). Because ``keep = max(1, int(ratio·(N−1)))`` makes every token
count a compile-time constant (SURVEY.md §2 insight), the token-work FLOP
ratio of any candidate schedule is exact and free to evaluate — so the
inverse problem (target speedup → schedule) is a one-dimensional search,
no model runs needed.

``propose_schedule`` finds the *gentlest* uniform keep ratio over a chosen
block range that meets a target analytic speedup. Gentlest-uniform is the
right default: pruning compounds multiplicatively through the range, and
spreading the reduction evenly maximizes the minimum per-block keep ratio —
the schedule shape both sample schedules in the reference follow.

Calibration of the analytic number: on the fused ViT-B/16 TPU path the
measured pruned/base ratio equals the token-work ratio (1.22× both —
README performance table), because scoring/selection ride inside the fused
kernels. On small-C models (DeiT-S) or very long sequences (N=577) the
per-block rescoring/gather overheads take a real bite; treat the analytic
speedup as a CEILING and validate with ``--compare_base`` (the measured
gaps are recorded in BENCH_SUITE.json).

CLI::

    python -m rajni_tpu.utils.schedule_search --model vit_base_patch16_224 \
        --target 1.3 [--blocks 3-7] [--min_ratio 0.5] [--out schedule.json]

Empirical mode (:func:`search_schedule_empirical`) answers the inverse
question under an ACCURACY budget instead — "the most aggressive schedule
that costs ≤ D top-1 points, measured on my data"::

    python -m rajni_tpu.utils.schedule_search --model vit_base_patch16_224 \
        --eval_data /data/imagenet/val --checkpoint vit_b16.msgpack \
        --max_drop 0.5 [--max_batches 20] [--out schedule.json]
"""

from __future__ import annotations

import json
from typing import Sequence

from ..models.vit import ViTConfig
from .flops import flops_per_image
from .schedule import normalize_schedule, token_count_trace


def predict_speedup(config: ViTConfig, schedule) -> float:
    """Analytic token-work speedup of ``schedule`` vs unpruned (≥1 for any
    real pruning schedule; the measured fused-path ceiling)."""
    norm = normalize_schedule(schedule, config.depth)
    trace = token_count_trace(config.num_tokens, norm, config.num_prefix_tokens)
    return flops_per_image(config) / flops_per_image(config, trace)


def propose_schedule(
    config: ViTConfig,
    target_speedup: float,
    blocks: Sequence[int] | None = None,
    min_ratio: float = 0.5,
    update: bool = True,
) -> tuple[dict, dict]:
    """Find the largest uniform ``keep_ratio`` over ``blocks`` whose analytic
    speedup meets ``target_speedup``.

    Args:
      config: model config (token counts and FLOP shape come from it).
      target_speedup: desired unpruned/pruned token-work ratio, e.g. 1.3.
      blocks: block indices allowed to prune. Default: the middle span
        ``depth//4 .. 2*depth//3 - 1`` (= 3..7 for depth 12 — the same span
        the reference's sample ``schedule.json`` uses).
      min_ratio: floor on the proposed keep ratio (below ~0.5/block the
        accuracy cost typically outruns the FLOP saving; spread over more
        blocks instead).
      update: the ``update`` flag written into every proposed entry.

    Returns:
      ``(schedule_dict, info)`` where ``schedule_dict`` is ready for
      ``json.dump`` / ``normalize_schedule`` and ``info`` carries
      ``keep_ratio``, ``achieved`` (analytic speedup), ``reachable``
      (False when even ``min_ratio`` everywhere cannot hit the target —
      the returned schedule is then the ``min_ratio`` one), and
      ``token_counts``.

    Raises:
      ValueError: on a sub-1.0 target or out-of-range block indices.
    """
    if target_speedup < 1.0:
        raise ValueError(f"target_speedup must be >= 1.0, got {target_speedup}")
    if blocks is None:
        blocks = range(config.depth // 4, (2 * config.depth) // 3)
    blocks = sorted(set(int(b) for b in blocks))
    if not blocks:
        raise ValueError("blocks must be non-empty")
    if blocks[0] < 0 or blocks[-1] >= config.depth:
        raise ValueError(
            f"blocks {blocks} out of range for depth {config.depth}"
        )

    def sched_at(r: float) -> dict:
        return {b: {"keep_ratio": r, "update": update} for b in blocks}

    def speedup_at(r: float) -> float:
        return predict_speedup(config, sched_at(r))

    reachable = speedup_at(min_ratio) >= target_speedup
    if not reachable:
        r = min_ratio
    else:
        # speedup is monotonically non-increasing in r: binary-search the
        # largest r that still meets the target, then quantize DOWN to 1e-3
        # (smaller r ⇒ more pruning ⇒ the target stays met)
        lo, hi = min_ratio, 1.0
        for _ in range(40):
            mid = (lo + hi) / 2.0
            if speedup_at(mid) >= target_speedup:
                lo = mid
            else:
                hi = mid
        r = int(lo * 1000) / 1000.0
        r = max(r, min_ratio)

    schedule = sched_at(r)
    norm = normalize_schedule(schedule, config.depth)
    info = {
        "keep_ratio": r,
        "achieved": round(predict_speedup(config, schedule), 4),
        "reachable": reachable,
        "token_counts": token_count_trace(config.num_tokens, norm, config.num_prefix_tokens),
    }
    return schedule, info


def search_schedule_empirical(
    eval_acc,
    config: ViTConfig,
    max_drop: float,
    blocks: Sequence[int] | None = None,
    min_ratio: float = 0.5,
    step: float = 0.025,
    update: bool = True,
) -> tuple[dict | None, dict]:
    """Find the most aggressive uniform schedule whose MEASURED top-1 drop
    stays within ``max_drop`` points.

    The analytic designer answers "what schedule gives 1.3×?"; this answers
    the question the user actually has — "how hard can I prune before I
    lose more than D points?" — by evaluating candidates on real data.

    Args:
      eval_acc: callable ``schedule_dict | None -> top-1 %`` (``None`` =
        unpruned base). Build one from a checkpoint + dataset with the CLI
        below, or pass any closure (the search itself is evaluator-agnostic
        and unit-testable).
      max_drop: accuracy budget in percentage points (base − pruned).
      blocks / min_ratio / update: as :func:`propose_schedule`.
      step: keep-ratio grid quantum. The search bisects the grid
        ``min_ratio, min_ratio+step, …, 1−step`` assuming accuracy is
        monotone non-decreasing in the keep ratio (true of token pruning up
        to eval noise — use ``max_batches`` large enough that noise ≪
        ``max_drop``), so it costs O(log((1−min_ratio)/step)) evaluations,
        each one eval pass.

    Returns:
      ``(schedule_dict | None, info)``. ``schedule_dict`` is the chosen
      schedule (``None`` when even the gentlest grid ratio violates the
      budget — ``info["reachable"]`` False). ``info`` carries ``base_acc``,
      ``acc``, ``drop``, ``keep_ratio``, ``analytic_speedup``, and
      ``evals`` (every (ratio, acc) measured, for the user's own frontier
      plot).
    """
    if blocks is None:
        blocks = range(config.depth // 4, (2 * config.depth) // 3)
    blocks = sorted(set(int(b) for b in blocks))
    if not blocks or blocks[0] < 0 or blocks[-1] >= config.depth:
        raise ValueError(f"blocks {blocks} out of range for depth {config.depth}")
    if not 0.0 < step <= 1.0 - min_ratio:
        raise ValueError(f"step {step} must be in (0, 1 - min_ratio]")

    grid = []
    r = min_ratio
    while r < 1.0 - 1e-9:
        grid.append(round(r, 6))
        r += step
    if not grid:
        raise ValueError("empty keep-ratio grid")

    def sched_at(r: float) -> dict:
        return {b: {"keep_ratio": r, "update": update} for b in blocks}

    base_acc = float(eval_acc(None))
    evals: list[tuple[float, float]] = []
    cache: dict[float, float] = {}

    def ok(r: float) -> bool:
        if r not in cache:
            cache[r] = float(eval_acc(sched_at(r)))
            evals.append((r, cache[r]))
        return base_acc - cache[r] <= max_drop

    def info_at(r: float | None) -> dict:
        acc = cache.get(r) if r is not None else None
        return {
            "keep_ratio": r,
            "base_acc": round(base_acc, 4),
            "acc": None if acc is None else round(acc, 4),
            "drop": None if acc is None else round(base_acc - acc, 4),
            "analytic_speedup": (
                None if r is None
                else round(predict_speedup(config, sched_at(r)), 4)
            ),
            "reachable": r is not None,
            "evals": [(rr, round(aa, 4)) for rr, aa in evals],
        }

    # gentlest candidate fails → no uniform schedule on this grid fits
    if not ok(grid[-1]):
        return None, info_at(None)
    if ok(grid[0]):
        return sched_at(grid[0]), info_at(grid[0])
    # invariant: ok(grid[hi]), not ok(grid[lo]) — find the boundary
    lo, hi = 0, len(grid) - 1
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if ok(grid[mid]):
            hi = mid
        else:
            lo = mid
    return sched_at(grid[hi]), info_at(grid[hi])


def main(argv=None) -> None:
    """CLI: propose a schedule for a target analytic speedup."""
    import argparse

    from ..models.vit import get_config

    p = argparse.ArgumentParser("RAJNI schedule designer")
    p.add_argument("--model", default="vit_base_patch16_224")
    p.add_argument("--target", type=float, default=None,
                   help="desired token-work speedup, e.g. 1.3")
    p.add_argument("--sweep", action="store_true",
                   help="print the keep_ratio -> analytic-speedup table "
                        "for the block span instead of solving one target")
    p.add_argument("--blocks", type=str, default=None, metavar="A-B",
                   help="inclusive block range allowed to prune "
                        "(default: depth//4 .. 2*depth//3-1)")
    p.add_argument("--min_ratio", type=float, default=0.5)
    p.add_argument("--no_update", action="store_true",
                   help="write update:false (reuse scores between "
                        "consecutive pruned blocks)")
    p.add_argument("--out", type=str, default=None,
                   help="write the schedule JSON here (else print only)")
    p.add_argument("--eval_data", type=str, default=None, metavar="DIR",
                   help="EMPIRICAL mode: search for the most aggressive "
                        "schedule whose measured top-1 drop on this "
                        "ImageFolder stays within --max_drop (requires "
                        "--checkpoint; --target is ignored)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="params checkpoint for --eval_data")
    p.add_argument("--max_drop", type=float, default=0.5, metavar="PTS",
                   help="accuracy budget for --eval_data, in top-1 points")
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap each candidate evaluation (noise must stay "
                        "well under --max_drop)")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--step", type=float, default=0.025,
                   help="keep-ratio grid quantum for the empirical search")
    p.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args(argv)

    config = get_config(args.model)
    blocks = None
    if args.blocks:
        a, _, b = args.blocks.partition("-")
        blocks = range(int(a), int(b or a) + 1)

    if args.eval_data:
        if not args.checkpoint:
            raise SystemExit("--eval_data requires --checkpoint")
        import functools

        import jax
        import jax.numpy as jnp

        from ..data.pipeline import DataLoader, ImageFolder
        from ..eval import evaluate_model
        from ..models.vit import adapt_config_to_params, vit_forward
        from ..params.io import load_params

        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        params = load_params(args.checkpoint, dtype=dtype)
        config = adapt_config_to_params(config, params)
        loader = DataLoader(
            ImageFolder(args.eval_data, img_size=config.img_size),
            batch_size=args.batch_size,
        )

        def eval_acc(sched):
            fwd = jax.jit(functools.partial(
                vit_forward, params, config=config,
                schedule=normalize_schedule(sched, config.depth),
                impl=args.kernels,
            ))
            acc, _ = evaluate_model(
                fwd, loader, max_batches=args.max_batches,
                warmup=0, progress=False,
            )
            label = ("base" if sched is None else
                     f"r={next(iter(sched.values()))['keep_ratio']:.3f}")
            print(f"  eval {label}: top-1 {acc:.2f}%")
            return acc

        schedule, info = search_schedule_empirical(
            eval_acc, config, args.max_drop, blocks=blocks,
            min_ratio=args.min_ratio, step=args.step,
            update=not args.no_update,
        )
        if schedule is None:
            raise SystemExit(
                f"no uniform schedule on blocks "
                f"{blocks or 'default span'} meets max_drop="
                f"{args.max_drop} (base {info['base_acc']}%; gentlest "
                f"candidate evals: {info['evals']})"
            )
        print(f"model {args.model}: blocks {sorted(schedule)} at "
              f"keep_ratio {info['keep_ratio']}")
        print(f"measured top-1 {info['acc']}% (base {info['base_acc']}%, "
              f"drop {info['drop']} <= {args.max_drop}); analytic speedup "
              f"{info['analytic_speedup']}x")
        payload = json.dumps(
            {str(k): v for k, v in schedule.items()}, indent=1
        )
        if args.out:
            with open(args.out, "w") as f:
                f.write(payload + "\n")
            print(f"wrote {args.out}")
        else:
            print(payload)
        return

    if args.sweep:
        span = (sorted(blocks) if blocks
                else list(range(config.depth // 4, (2 * config.depth) // 3)))
        print(f"model {args.model}, blocks {span}: "
              "uniform keep_ratio -> analytic speedup (fused-path ceiling)")
        for r100 in range(100, int(args.min_ratio * 100) - 1, -5):
            r = r100 / 100.0
            sched = {b: {"keep_ratio": r} for b in span}
            norm = normalize_schedule(sched, config.depth)
            s = predict_speedup(config, sched)
            print(f"  {r:4.2f}  {s:6.3f}x  "
                  f"trace {token_count_trace(config.num_tokens, norm, config.num_prefix_tokens)}")
        return
    if args.target is None:
        raise SystemExit("provide --target SPEEDUP (or --sweep)")

    schedule, info = propose_schedule(
        config, args.target, blocks=blocks, min_ratio=args.min_ratio,
        update=not args.no_update,
    )
    print(f"model {args.model}: blocks {sorted(schedule)} at "
          f"keep_ratio {info['keep_ratio']}")
    note = "" if info["reachable"] else " — UNREACHABLE at min_ratio"
    print(f"analytic speedup {info['achieved']}x (target {args.target}x{note})")
    print(f"token_counts: {info['token_counts']}")
    print("NOTE: analytic = fused-path ceiling; validate with "
          "--compare_base and fine-tune for accuracy (docs/TRAINING.md)")
    payload = json.dumps({str(k): v for k, v in schedule.items()}, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
        print(f"wrote {args.out}")
    else:
        print(payload)


if __name__ == "__main__":
    main()
