"""Analytic FLOP accounting for ViT forwards under a pruning schedule.

The reference publishes no numbers (SURVEY.md §6); this module defines the
framework's measurement vocabulary: matmul FLOPs (2×MAC) per image as a
function of the architecture and the per-block token trace, and MFU against
a hardware roofline. Scoring/selection/gather overheads are deliberately
EXCLUDED — consistent with how ViT GFLOPs are conventionally quoted — so
pruned-config MFU slightly under-counts the machine's real work.

Used by ``scripts/bench_suite.py`` (the ``mfu`` columns of
``BENCH_SUITE.json``) and available to users sizing schedules:

    >>> cfg = get_config("vit_base_patch16_224")
    >>> trace = model_stats(cfg, sched)["token_counts"]
    >>> flops_per_image(cfg, trace) / flops_per_image(cfg)   # token-work ratio
"""

from __future__ import annotations

from ..models.vit import ViTConfig

#: v5e-1 bf16 MXU peak (BASELINE.md); the int8 MXU runs at 2x this.
V5E_BF16_PEAK_TFLOPS = 197.0


def flops_per_image(
    config: ViTConfig,
    token_counts: list[int] | None = None,
    final_count: int | None = None,
) -> float:
    """Forward matmul FLOPs (2×MAC) per image.

    Stock block at N tokens: ``24·N·C²`` (qkv+proj+fc1+fc2) + ``4·N²·C``
    (SDPA). Pruned block N→K: the QKV projection runs at the full incoming
    N (reference attention.py:22), attention/proj/MLP at K:
    ``6·N·C² + 18·K·C² + 4·K²·C``. Plus patch-embed and the CLS head.

    ``token_counts`` is the reference's ENTRY trace (token count at the
    entry of each block — model.py:43), so block ``i`` runs
    ``entry[i] → entry[i+1]``. The historical implementation paired the
    trace one block late, billing a phantom full-N stock block and never
    billing the last — +4.3% on the flagship schedule, which inflated
    every recorded pruned-MFU figure until 2026-08-18. ``final_count`` is
    the LAST block's exit count, only needed when the final block itself
    prunes (an entry trace cannot express that); defaults to
    ``token_counts[-1]`` (stock last block — true of every recorded
    config).
    """
    C = config.embed_dim
    if token_counts is None:
        token_counts = [config.num_tokens] * config.depth
    if len(token_counts) != config.depth:
        raise ValueError(
            f"token_counts has {len(token_counts)} entries for depth "
            f"{config.depth}"
        )
    n0 = config.num_tokens
    flops = 2.0 * (n0 - 1) * config.patch_size**2 * config.in_chans * C
    exits = list(token_counts[1:]) + [
        token_counts[-1] if final_count is None else final_count
    ]
    for n_in, n_out in zip(token_counts, exits):
        if n_out == n_in:  # stock block
            flops += 24.0 * n_in * C * C + 4.0 * n_in**2 * C
        else:  # pruned: QKV at n_in, the rest at n_out
            flops += (
                6.0 * n_in * C * C
                + 18.0 * n_out * C * C
                + 4.0 * n_out**2 * C
            )
    flops += 2.0 * C * config.num_classes
    return flops


def mfu(
    config: ViTConfig,
    token_counts: list[int] | None,
    img_per_s: float,
    peak_tflops: float = V5E_BF16_PEAK_TFLOPS,
) -> float:
    """Model FLOPs utilization: achieved matmul FLOP/s over ``peak_tflops``."""
    return (
        flops_per_image(config, token_counts) * img_per_s
        / (peak_tflops * 1e12)
    )


def train_mfu(
    config: ViTConfig,
    token_counts: list[int] | None,
    img_per_s: float,
    peak_tflops: float = V5E_BF16_PEAK_TFLOPS,
) -> float:
    """Training-step MFU: the conventional 3× forward accounting (forward
    + ~2× backward — each matmul's backward is two GEMMs of the forward's
    shape). Remat recompute is deliberately NOT billed (MFU counts the
    model's *required* FLOPs, so a rematerialized run reports lower MFU
    for the same hardware utilization — that is the point of the metric).
    The optimizer update is elementwise and excluded like every other
    non-matmul op."""
    return (
        3.0 * flops_per_image(config, token_counts) * img_per_s
        / (peak_tflops * 1e12)
    )
