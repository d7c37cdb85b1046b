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
    args = p.parse_args(argv)

    config = get_config(args.model)
    blocks = None
    if args.blocks:
        a, _, b = args.blocks.partition("-")
        blocks = range(int(a), int(b or a) + 1)

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
