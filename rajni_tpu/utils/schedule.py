"""Pruning-schedule parsing, normalization, and static token-count traces.

Schedule format (reference `schedule.json:1-7`, `README.md:75-82`)::

    {"3": {"keep_ratio": 0.95, "update": false}, ...}

  * key: transformer block index
  * ``keep_ratio``: fraction of *patch* tokens kept (CLS always survives)
  * ``update``: recompute importance dynamically; defaults True when absent
    (reference model.py:19).

Known reference quirk, fixed here (documented in SURVEY.md §2): the reference
CLI loads the JSON with *string* keys but tests membership against *int* block
indices (run.py:118-119 vs model.py:14), so its CLI path silently runs
unpruned. :func:`normalize_schedule` coerces keys to int at load time; the
ground-truth semantics are the reference's programmatic int-key path
(README.md:25-33).

Internally a schedule is normalized to a hashable per-block tuple — length
``depth``, entry ``None`` (stock block) or :class:`PruneSpec` — so it can be a
static ``jax.jit`` argument: every distinct schedule is a distinct compiled
XLA program with fully static per-block shapes.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Mapping, Sequence

from ..ops.pruning import keep_count


@dataclasses.dataclass(frozen=True)
class PruneSpec:
    """Per-block pruning config (reference model.py:16-20)."""

    keep_ratio: float
    update: bool = True


# Per-block entries: None = stock block, PruneSpec = pruned block.
Schedule = tuple  # tuple[PruneSpec | None, ...]


def normalize_schedule(
    schedule: Mapping | Sequence | None,
    depth: int,
) -> Schedule:
    """Normalize any accepted schedule form to a static per-block tuple.

    Accepts:
      * ``None`` / ``{}`` — identity schedule (no pruning anywhere);
      * a mapping ``{block_index: {"keep_ratio": r, "update": b}}`` with int
        *or* string keys (string keys coerced — the reference CLI bug fix);
      * a mapping whose values are already :class:`PruneSpec`;
      * an already-normalized per-block sequence of length ``depth``.
    """
    if schedule is None:
        return (None,) * depth

    if isinstance(schedule, Mapping):
        out: list[PruneSpec | None] = [None] * depth
        for key, cfg in schedule.items():
            i = int(key)
            if not 0 <= i < depth:
                raise ValueError(
                    f"schedule block index {i} out of range for depth {depth}"
                )
            if isinstance(cfg, PruneSpec):
                spec = cfg
            else:
                # `update` defaults True when absent (reference model.py:19).
                spec = PruneSpec(
                    keep_ratio=float(cfg["keep_ratio"]),
                    update=bool(cfg.get("update", True)),
                )
            if not 0.0 < spec.keep_ratio <= 1.0:
                raise ValueError(
                    f"keep_ratio must be in (0, 1], got {spec.keep_ratio} "
                    f"for block {i}"
                )
            out[i] = spec
        return tuple(out)

    seq = tuple(schedule)
    if len(seq) != depth:
        raise ValueError(f"schedule length {len(seq)} != depth {depth}")
    for i, entry in enumerate(seq):
        if entry is None:
            continue
        if not isinstance(entry, PruneSpec):
            raise TypeError(f"bad schedule entry: {entry!r}")
        # same range check as the mapping path — an out-of-range ratio
        # otherwise surfaces as a confusing trace-time shape error (>1)
        # or a silent clamp to one token (<=0)
        if not 0.0 < entry.keep_ratio <= 1.0:
            raise ValueError(
                f"keep_ratio must be in (0, 1], got {entry.keep_ratio} "
                f"for block {i}"
            )
    return seq


def load_schedule(path: str, depth: int) -> Schedule:
    """Load a schedule JSON file (reference run.py:118-119, keys int-fixed)."""
    with open(path) as f:
        raw = json.load(f)
    return normalize_schedule(raw, depth)


def schedule_to_dict(schedule: Schedule) -> dict[int, dict]:
    """Inverse of :func:`normalize_schedule`, for printing/serialization."""
    return {
        i: {"keep_ratio": s.keep_ratio, "update": s.update}
        for i, s in enumerate(schedule)
        if s is not None
    }


def token_count_trace(
    num_tokens: int, schedule: Schedule, num_prefix: int = 1
) -> list[int]:
    """Token count at *entry* of each block (reference model.py:43).

    Because ``keep`` depends only on the static schedule and the incoming
    token count (reference attention.py:31-32), the whole trace is a
    compile-time constant; this reproduces the reference's per-forward
    ``get_last_stats()["token_counts"]`` without running the model
    (reference model.py:25-28, model.py:68).

    ``num_prefix`` is the always-kept CLS[+registers] prefix (1 = the
    reference's CLS-only semantics).
    """
    counts = []
    n = num_tokens
    for spec in schedule:
        counts.append(n)
        if spec is not None:
            # kept patches + prefix
            n = keep_count(spec.keep_ratio, n, num_prefix) + num_prefix
    return counts


def main(argv=None) -> None:
    """CLI: inspect a schedule file — normalized entries + token-count trace.

    ``python -m rajni_tpu.utils.schedule sched.json --model vit_base_patch16_224``
    """
    import argparse
    import json as _json

    from ..models.vit import get_config

    p = argparse.ArgumentParser("RAJNI schedule inspector")
    p.add_argument("schedule", help="schedule JSON path")
    p.add_argument("--model", default="vit_base_patch16_224")
    args = p.parse_args(argv)

    config = get_config(args.model)
    schedule = load_schedule(args.schedule, config.depth)
    counts = token_count_trace(
        config.num_tokens, schedule, config.num_prefix_tokens
    )
    print(_json.dumps({
        "model": args.model,
        "schedule": schedule_to_dict(schedule),
        "token_counts": counts,
        "mean_tokens": sum(counts) / len(counts),
        "token_work_ratio": sum(counts) / (len(counts) * config.num_tokens),
    }, indent=2))


if __name__ == "__main__":
    main()


# The reference repo's shipped schedule (reference schedule.json:1-7) — the
# flagship benchmark configuration, shared by bench.py, the driver entry
# points, and the benchmark suite so they cannot drift apart.
REFERENCE_SCHEDULE = {
    3: {"keep_ratio": 0.95, "update": False},
    4: {"keep_ratio": 0.95, "update": True},
    5: {"keep_ratio": 0.85, "update": True},
    6: {"keep_ratio": 0.85, "update": True},
    7: {"keep_ratio": 0.95, "update": True},
}
