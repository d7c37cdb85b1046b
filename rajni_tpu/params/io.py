"""Parameter checkpoint persistence (msgpack via flax.serialization).

The reference has **no** checkpointing (SURVEY.md §5: weights are re-fetched
from timm's hub every run, `/root/reference/rajni/run.py:89-92`). Here the
converted pytree is saved once and memory-mapped back on every eval:

    params = convert_timm_state_dict(load_torch_checkpoint("vit_b.pth"), cfg)
    save_params("vit_b.msgpack", params)
    params = load_params("vit_b.msgpack", dtype=jnp.bfloat16)

Format: flax msgpack of the raw pytree, with the ``blocks`` list restored
from msgpack's string-keyed dict encoding on load (flax round-trips lists as
``{"0": ..., "1": ...}``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models.vit import Params


def save_params(path: str, params: Params) -> None:
    """Serialize a parameter pytree to ``path`` (msgpack)."""
    host = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host))


def _restore_blocks(obj: Any) -> Any:
    """Recursively convert msgpack's ``{"0": v0, "1": v1, ...}`` dicts that
    encode lists back into lists (only where every key is a decimal string)."""
    if isinstance(obj, dict):
        restored = {k: _restore_blocks(v) for k, v in obj.items()}
        if restored and all(isinstance(k, str) and k.isdigit() for k in restored):
            return [restored[str(i)] for i in range(len(restored))]
        return restored
    return obj


def _cast_tree(obj: Any, dtype: jnp.dtype) -> Any:
    """Cast every leaf to ``dtype`` — EXCEPT inside int8 quantization
    records (``{"int8", "scale"}``, see rajni_tpu.quant), whose dtypes are
    semantic: casting them to bf16 while ``is_quantized`` still routes the
    block into the int8 kernels would silently corrupt the forward."""
    from ..quant import is_quantized

    if is_quantized(obj):
        return {k: jnp.asarray(v) for k, v in obj.items()}
    if isinstance(obj, dict):
        return {k: _cast_tree(v, dtype) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_cast_tree(v, dtype) for v in obj]
    return jnp.asarray(obj, dtype=dtype)


def load_params(path: str, dtype: jnp.dtype | None = None) -> Params:
    """Load a parameter pytree saved by :func:`save_params` (msgpack file)
    or :func:`save_params_orbax` (directory).

    Args:
      path: checkpoint path.
      dtype: optional cast applied to every leaf (bf16 for TPU inference).
        Int8 quantization records are exempt — their int8/fp32-scale dtypes
        are part of the format.
    """
    import os

    if os.path.isdir(path):
        params = load_params_orbax(path)
    else:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        params = _restore_blocks(raw)
    if dtype is not None:
        params = _cast_tree(params, dtype)
    return params


def load_checkpoint_auto(
    path: str, model: str, dtype: jnp.dtype | None = None
) -> Params:
    """One-stop checkpoint loader: native msgpack/orbax checkpoints load
    directly; torch ``.pth``/``.pt``/``.bin`` files are converted on the fly
    (timm state_dict → pytree, pos-embed resampled on resolution mismatch).

    This is the "point at a .pth and eval" path the reference gets from timm
    (`/root/reference/rajni/run.py:89-92`): ``python -m rajni_tpu.run
    --checkpoint vit_b.pth --model vit_base_patch16_224 ...`` just works.
    """
    if path.endswith((".pth", ".pt", ".bin")):
        from ..models.vit import get_config
        from .convert import convert_timm_state_dict, load_torch_checkpoint

        params = convert_timm_state_dict(
            load_torch_checkpoint(path), get_config(model)
        )
        if dtype is not None:
            params = _cast_tree(params, dtype)
        return params
    return load_params(path, dtype=dtype)


def save_params_orbax(path: str, params: Params) -> None:
    """Alternative backend: Orbax checkpoint directory (sharded-friendly;
    use for multi-host or very large models where msgpack's single-file
    host-memory staging is a bottleneck)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os

        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str) -> Params:
    """Load an Orbax checkpoint saved by :func:`save_params_orbax`."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os

        return ckptr.restore(os.path.abspath(path))
