"""Pallas TPU kernels — the framework's native-kernel layer.

These stand in the role the reference's cuDNN/cuBLAS backends play for its
torch ops (SURVEY.md §2 preamble): hand-scheduled implementations of the hot
ops, each a drop-in replacement for (and unit-tested against) the lax
reference implementation in :mod:`rajni_tpu.ops`. Selected via the ``impl``
argument of :func:`rajni_tpu.models.vit.vit_forward`.
"""

from .attention import fused_sdpa

__all__ = ["fused_sdpa"]
