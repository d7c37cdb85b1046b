"""Pallas TPU kernels — the framework's native-kernel layer.

These stand in the role the reference's cuDNN/cuBLAS backends play for its
torch ops (SURVEY.md §2 preamble): hand-scheduled implementations of the hot
ops, each a drop-in replacement for (and unit-tested against) the lax
reference implementation in :mod:`rajni_tpu.ops`. Selected via the ``impl``
argument of :func:`rajni_tpu.models.vit.vit_forward` (``--kernels`` on the
CLI; ``auto`` resolves to Pallas on TPU).

Kernel inventory:
  * ``attention.fused_sdpa`` — VMEM-resident SDPA on packed QKV.
  * ``block.fused_attn_block`` — whole stock-block attention half
    (LN → QKV → MHSA → proj → layer-scale → residual).
  * ``block.fused_ln_qkv`` — pruned-block front half with the RAJNI
    importance scores emitted as an in-kernel byproduct.
  * ``block.fused_ln_qkv_select`` — single-dispatch alternative that also
    runs token selection in-kernel (see its measured-note docstring).
  * ``block.fused_gather_sdpa_proj_residual`` — one-hot token gather +
    reduced-set attention + projection + compacted residual; adaptive
    fast / query-chunked bodies by VMEM budget.
  * ``mlp.fused_ln_mlp_residual`` — LN → fc1 → exact GELU → fc2 → residual
    with the hidden activation never reaching HBM; hidden-chunked for
    large models.
"""

from .attention import fused_sdpa
from .block import (
    fused_attn_block,
    fused_attn_block_int8,
    fused_gather_sdpa_proj_residual,
    fused_ln_qkv,
    fused_ln_qkv_int8,
    fused_ln_qkv_select,
    fused_pruned_attn_block,
    fused_pruned_attn_block_int8,
)
from .mlp import fused_ln_mlp_residual, fused_ln_mlp_residual_int8

__all__ = [
    "fused_sdpa",
    "fused_attn_block",
    "fused_attn_block_int8",
    "fused_gather_sdpa_proj_residual",
    "fused_ln_qkv",
    "fused_ln_qkv_int8",
    "fused_ln_qkv_select",
    "fused_pruned_attn_block",
    "fused_pruned_attn_block_int8",
    "fused_ln_mlp_residual",
    "fused_ln_mlp_residual_int8",
]
