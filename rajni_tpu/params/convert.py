"""timm-checkpoint → rajni-tpu parameter converter.

The reference obtains its weights from timm's hub at every run
(`/root/reference/rajni/run.py:89-92, 126-129`); this framework instead
converts a timm ``VisionTransformer`` ``state_dict`` once into the native
parameter pytree consumed by :func:`rajni_tpu.models.vit.vit_forward`
(then persisted via :mod:`rajni_tpu.params.io`).

Layout transformations (timm torch → rajni-tpu JAX):

  * ``patch_embed.proj.weight [C, 3, P, P]`` (conv OIHW) →
    ``patch_embed.kernel [P*P*3, C]`` flattened in ``(ph, pw, c)`` order —
    matching :func:`rajni_tpu.models.vit.patch_embed`'s patch extraction,
    which expresses the reference's Conv2d (model.py:34) as one matmul.
  * Every ``nn.Linear`` weight ``[out, in]`` → ``kernel [in, out]``
    (JAX ``x @ W`` convention): ``attn.qkv`` (packed q|k|v rows, timm order,
    consumed packed by the importance scorer — reference importance.py:10),
    ``attn.proj``, ``mlp.fc1``, ``mlp.fc2``, ``head``.
  * ``norm*.weight/bias`` → ``scale``/``bias``; ``ls1.gamma``/``ls2.gamma``
    (timm LayerScale) → per-block ``ls1``/``ls2`` vectors
    (reference model.py:47-48 fallbacks).
  * ``cls_token [1,1,C]`` / ``pos_embed [1,N,C]`` pass through.

Extended timm variants (beyond the classic ViT the reference was written
against — it would run them subtly wrong, SURVEY.md §2/C2) are modeled, not
dropped: ``attn.q_norm``/``attn.k_norm`` (qk-normed ViTs), ``fc_norm`` +
pooled heads (MAE-finetuned style), ``reg_token`` registers (DINOv2 style).
The target :class:`~rajni_tpu.models.vit.ViTConfig` must declare them —
:func:`adapt_config` flips the config flags from the checkpoint's keys so
callers never mis-convert silently.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..models.vit import Params, ViTConfig

def _to_numpy(t: Any) -> np.ndarray:
    """torch.Tensor / np.ndarray → np.ndarray (no torch import required)."""
    if hasattr(t, "detach"):  # torch.Tensor without importing torch
        t = t.detach().cpu()
        if str(getattr(t, "dtype", "")) == "torch.bfloat16":
            # torch bf16 tensors do not implement .numpy(); the f32
            # round-trip is exact (every bf16 value is an f32 value)
            t = t.float()
        t = t.numpy()
    return np.asarray(t)


def _dense(sd: Mapping[str, Any], prefix: str) -> dict:
    """``{prefix}.weight [out,in]`` + ``.bias`` → ``{kernel [in,out], bias}``."""
    w = _to_numpy(sd[f"{prefix}.weight"])
    out = {"kernel": np.ascontiguousarray(w.T)}
    bias_key = f"{prefix}.bias"
    out["bias"] = (
        _to_numpy(sd[bias_key])
        if bias_key in sd
        else np.zeros((w.shape[0],), w.dtype)
    )
    return out


def _norm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _to_numpy(sd[f"{prefix}.weight"]),
        "bias": _to_numpy(sd[f"{prefix}.bias"]),
    }


def _cubic_weights(n_in: int, n_out: int) -> np.ndarray:
    """Dense 1-D interpolation matrix ``W [n_out, n_in]`` matching
    ``torch.nn.functional.interpolate(mode="bicubic", align_corners=False,
    antialias=True)`` — the resampler timm's ``resample_abs_pos_embed``
    applies to pretrained pos-embeds on a resolution change (timm defaults
    ``antialias=True``, and torch's antialiased path changes the result in
    BOTH directions, not just downscale — verified empirically).

    torch's antialiased bicubic is PIL-compatible: Keys kernel with
    ``a = -0.5`` (NOT the plain 4-tap path's ``-0.75``), support scaled by
    ``max(n_in/n_out, 1)``, PIL-style spans, per-output weight
    normalization. Verified against ``F.interpolate`` to ~1e-6 for
    upscale, downscale, and identity. Built explicitly rather than via
    jax.image, which implements neither torch path exactly.
    """
    a = -0.5

    def kernel(t: np.ndarray) -> np.ndarray:
        at = np.abs(t)
        return np.where(
            at <= 1.0,
            (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
            np.where(
                at < 2.0,
                a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a,
                0.0,
            ),
        )

    W = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    fs = max(scale, 1.0)  # antialias widens the kernel only on downscale
    support = 2.0 * fs
    for i in range(n_out):
        center = (i + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(n_in, int(center + support + 0.5))
        w = kernel((np.arange(xmin, xmax) + 0.5 - center) / fs)
        total = w.sum()
        if total != 0.0:
            w = w / total
        W[i, xmin:xmax] = w
    return W


def resample_pos_embed(
    pos_embed: np.ndarray, new_tokens: int, num_prefix: int = 1
) -> np.ndarray:
    """Bicubic-resample a ``[1, N, C]`` absolute pos-embed to a new square
    grid, keeping the ``num_prefix`` leading (CLS) embeds unchanged.

    Matches timm's ``resample_abs_pos_embed`` (which the reference inherits
    via ``timm.create_model(..., img_size=...)`` — run.py:89): separate the
    prefix, reshape the patch grid square, ``F.interpolate(bicubic,
    align_corners=False)`` in fp32, re-flatten, re-attach the prefix.
    """
    pe = np.asarray(pos_embed, np.float32)
    prefix, grid = pe[:, :num_prefix], pe[:, num_prefix:]
    n_old = grid.shape[1]
    n_new = new_tokens - num_prefix
    g_old = int(round(n_old**0.5))
    g_new = int(round(n_new**0.5))
    if g_old * g_old != n_old or g_new * g_new != n_new:
        raise ValueError(
            f"pos_embed grids must be square: {n_old} -> {n_new} patches"
        )
    C = grid.shape[-1]
    grid = grid.reshape(g_old, g_old, C)
    W = _cubic_weights(g_old, g_new).astype(np.float32)
    # separable bicubic: rows then columns, each a dense matmul over the grid
    grid = np.einsum("oh,hwc->owc", W, grid)
    grid = np.einsum("ow,hwc->hoc", W, grid)
    return np.concatenate([prefix, grid.reshape(1, n_new, C)], axis=1)


def convert_timm_state_dict(
    state_dict: Mapping[str, Any],
    config: ViTConfig,
    dtype: Any = np.float32,
) -> Params:
    """Convert a timm ``VisionTransformer`` state_dict to a rajni-tpu pytree.

    Args:
      state_dict: flat ``name -> tensor/ndarray`` mapping with timm naming
        (``cls_token``, ``pos_embed``, ``patch_embed.proj.*``,
        ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}.*``,
        ``norm.*``, ``head.*``). Accepts torch tensors or numpy arrays.
      config: target architecture; shapes are validated against it.
      dtype: parameter dtype of the produced pytree (bf16 for inference).

    Returns:
      Parameter pytree with the exact structure of
      :func:`rajni_tpu.models.vit.init_params`.
    """
    sd = dict(state_dict)
    C, P = config.embed_dim, config.patch_size

    # -- extended-variant weights need the matching config flags: a qk-norm
    # LayerNorm normalizes even with identity affine weights, so presence of
    # the keys (not their values) is what decides the forward semantics --
    has_qk = any(".q_norm." in k or ".k_norm." in k for k in sd)
    if has_qk and not config.qk_norm:
        raise ValueError(
            "checkpoint carries attn.q_norm/k_norm weights but the config "
            "has qk_norm=False — convert with adapt_config(config, sd) so "
            "the per-head norms are modeled (timm applies the "
            "normalization regardless of affine values)"
        )
    if config.qk_norm and not has_qk:
        raise ValueError(
            "config has qk_norm=True but the checkpoint has no "
            "attn.q_norm/k_norm weights"
        )
    has_fc_norm = any(k.startswith("fc_norm.") for k in sd)
    if has_fc_norm != config.fc_norm_resolved:
        raise ValueError(
            "fc_norm presence mismatch: checkpoint "
            f"{'has' if has_fc_norm else 'lacks'} fc_norm.* but the config "
            f"resolves use_fc_norm={config.fc_norm_resolved} — pooled-head "
            "checkpoints need global_pool='avg' (use adapt_config)"
        )
    has_reg = "reg_token" in sd
    if has_reg != bool(config.reg_tokens):
        raise ValueError(
            f"register-token mismatch: checkpoint "
            f"{'has' if has_reg else 'lacks'} reg_token but config "
            f"reg_tokens={config.reg_tokens} (use adapt_config)"
        )
    has_dist = "dist_token" in sd or "head_dist.weight" in sd
    if has_dist != config.distilled:
        raise ValueError(
            f"distillation mismatch: checkpoint "
            f"{'has' if has_dist else 'lacks'} dist_token/head_dist but "
            f"config distilled={config.distilled} (use adapt_config)"
        )

    conv_w = _to_numpy(sd["patch_embed.proj.weight"])  # [C, 3, P, P]
    if conv_w.shape != (C, config.in_chans, P, P):
        raise ValueError(
            f"patch_embed.proj.weight shape {conv_w.shape} does not match "
            f"config {(C, config.in_chans, P, P)}"
        )
    # OIHW → (ph, pw, c, out) → [P*P*3, C]: the (ph, pw, c) flattening order
    # of patch_embed()'s extraction.
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(P * P * config.in_chans, C)

    pos_embed = _to_numpy(sd["pos_embed"])
    if pos_embed.shape[-1] != C or pos_embed.ndim != 3:
        raise ValueError(
            f"pos_embed shape {pos_embed.shape} incompatible with C={C}"
        )
    if pos_embed.shape[1] != config.pos_embed_len:
        # Resolution transfer: e.g. a 224-pretrained checkpoint (N=197)
        # loaded into a 384 config (N=577). timm does this inside
        # create_model (reference run.py:89 with any --model); here the
        # converter resamples explicitly with the same bicubic recipe.
        # Under no_embed_class the table is patch-only (prefix 0 rows).
        pos_embed = resample_pos_embed(
            pos_embed,
            config.pos_embed_len,
            num_prefix=0 if config.no_embed_class else config.num_prefix_tokens,
        )

    params: Params = {
        "patch_embed": {
            "kernel": kernel,
            "bias": _to_numpy(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _to_numpy(sd["cls_token"]),
        "pos_embed": pos_embed,
        "blocks": [],
        "head": _dense(sd, "head"),
    }
    # Pooled-head checkpoints store the post-pool norm as fc_norm (the
    # pre-pool `norm` is Identity and absent from the state_dict).
    if config.fc_norm_resolved:
        params["fc_norm"] = _norm(sd, "fc_norm")
    else:
        params["norm"] = _norm(sd, "norm")
    if config.distilled:
        params["dist_token"] = _to_numpy(sd["dist_token"])
        params["head_dist"] = _dense(sd, "head_dist")
    if config.reg_tokens:
        reg = _to_numpy(sd["reg_token"])
        if reg.shape != (1, config.reg_tokens, C):
            raise ValueError(
                f"reg_token shape {reg.shape} != "
                f"{(1, config.reg_tokens, C)}"
            )
        params["reg_token"] = reg

    for i in range(config.depth):
        p = f"blocks.{i}"
        if f"{p}.norm1.weight" not in sd:
            raise KeyError(
                f"missing {p}.norm1.weight: checkpoint depth < {config.depth}"
            )
        block = {
            "norm1": _norm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
            },
            "norm2": _norm(sd, f"{p}.norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            },
        }
        if config.qk_norm:
            block["attn"]["q_norm"] = _norm(sd, f"{p}.attn.q_norm")
            block["attn"]["k_norm"] = _norm(sd, f"{p}.attn.k_norm")
        # timm LayerScale stores a single `gamma` vector.
        if f"{p}.ls1.gamma" in sd:
            block["ls1"] = _to_numpy(sd[f"{p}.ls1.gamma"])
            block["ls2"] = _to_numpy(sd[f"{p}.ls2.gamma"])
        params["blocks"].append(block)

    if f"blocks.{config.depth}.norm1.weight" in sd:
        raise ValueError(
            f"checkpoint has more than {config.depth} blocks — config mismatch"
        )

    # -- every key must be consumed: a semantic weight this converter does
    # not model (norm_pre.* in CLIP-pretrained ViTs, reg_token,
    # head_dist.* in distilled DeiT, ...) silently dropped would mean
    # silently wrong logits, the worst possible failure for a
    # weight-transplant tool --
    consumed = {
        "patch_embed.proj.weight", "patch_embed.proj.bias",
        "cls_token", "pos_embed",
        "head.weight", "head.bias",
    }
    if config.fc_norm_resolved:
        consumed |= {"fc_norm.weight", "fc_norm.bias"}
    else:
        consumed |= {"norm.weight", "norm.bias"}
    if config.reg_tokens:
        consumed.add("reg_token")
    if config.distilled:
        consumed |= {"dist_token", "head_dist.weight", "head_dist.bias"}
    for i in range(config.depth):
        p = f"blocks.{i}"
        leaves = ["norm1", "norm2", "attn.qkv", "attn.proj",
                  "mlp.fc1", "mlp.fc2"]
        if config.qk_norm:
            leaves += ["attn.q_norm", "attn.k_norm"]
        consumed |= {
            f"{p}.{leaf}.{wb}"
            for leaf in leaves
            for wb in ("weight", "bias")
        }
        consumed |= {f"{p}.ls1.gamma", f"{p}.ls2.gamma"}
    leftover = sorted(k for k in sd if k not in consumed)
    if leftover:
        raise ValueError(
            "checkpoint contains weights this converter does not model "
            f"(would be silently dropped): {leftover[:8]}"
            f"{' ...' if len(leftover) > 8 else ''}"
        )

    return _cast(params, dtype)


def adapt_config(config: ViTConfig, state_dict: Mapping[str, Any]) -> ViTConfig:
    """Flip the extended-variant config flags from a checkpoint's keys.

    A timm name alone does not encode ``qk_norm`` / pooled heads (timm sets
    them per pretrained tag); the state_dict does, unambiguously:

      * ``attn.q_norm.*`` present → ``qk_norm=True`` (timm's LayerNorm
        normalizes even with identity affine weights, so key *presence*
        decides the semantics);
      * ``fc_norm.*`` present → ``global_pool="avg"``, ``use_fc_norm=True``
        (the MAE-finetune layout: Identity pre-pool norm, post-pool
        fc_norm);
      * ``reg_token`` present → ``reg_tokens=R`` from its shape, with
        ``no_embed_class`` inferred from the pos-embed row count.

    Returns a (possibly identical) config; pass the result to
    :func:`convert_timm_state_dict`.

    Not inferable from a state_dict: ``global_pool="avg"`` *without*
    ``fc_norm`` (such a checkpoint is key-identical to a token-pooled
    one) — declare that config explicitly.
    """
    import dataclasses

    kw: dict[str, Any] = {}
    if any(".q_norm." in k for k in state_dict):
        kw["qk_norm"] = True
    if any(k.startswith("fc_norm.") for k in state_dict):
        kw["global_pool"] = "avg"
        kw["use_fc_norm"] = True
    if "reg_token" in state_dict:
        kw["reg_tokens"] = int(_to_numpy(state_dict["reg_token"]).shape[1])
        # every timm register config uses a patch-only pos-embed
        kw["no_embed_class"] = True
    if "dist_token" in state_dict or "head_dist.weight" in state_dict:
        kw["distilled"] = True
    cfg = dataclasses.replace(config, **kw) if kw else config

    if "pos_embed" in state_dict and not cfg.reg_tokens:
        # The pos-embed row count tells the two layouts apart on the
        # checkpoint's own grid (which may differ from the config's
        # resolution): a patch-only table has a perfect-square row count,
        # a CLS-inclusive one has square + 1 — never both (x²+1 = y² has
        # no positive solutions).
        rows = int(_to_numpy(state_dict["pos_embed"]).shape[1])

        def _square(v: int) -> bool:
            r = int(round(v**0.5))
            return r * r == v

        if _square(rows) and not _square(rows - 1):
            cfg = dataclasses.replace(cfg, no_embed_class=True)
        elif _square(rows - 1):
            cfg = dataclasses.replace(cfg, no_embed_class=False)
    return cfg


def _cast(params: Params, dtype: Any) -> Params:
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype=dtype), params
    )


def load_torch_checkpoint(path: str) -> dict:
    """Load a ``.pth`` checkpoint into a flat numpy state_dict.

    Handles both a raw ``state_dict`` file and the common
    ``{"model": sd}`` / ``{"state_dict": sd}`` wrappers, strips a
    ``module.`` DDP prefix, and converts every tensor to numpy (so the
    result is torch-free downstream).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in ("model", "state_dict", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    sd = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = _to_numpy(v)
    return sd


def main(argv=None) -> None:
    """CLI: ``python -m rajni_tpu.params.convert in.pth out.msgpack --model …``."""
    import argparse

    from .io import save_params
    from ..models.vit import get_config

    p = argparse.ArgumentParser("timm checkpoint → rajni-tpu converter")
    p.add_argument("input", help="torch .pth checkpoint (timm state_dict)")
    p.add_argument("output", help="output .msgpack path")
    p.add_argument("--model", default="vit_base_patch16_224")
    args = p.parse_args(argv)

    config = get_config(args.model)
    params = convert_timm_state_dict(load_torch_checkpoint(args.input), config)
    save_params(args.output, params)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"converted {args.model}: {n/1e6:.1f}M params -> {args.output}")


if __name__ == "__main__":
    main()
