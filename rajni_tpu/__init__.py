"""rajni-tpu: TPU-native RAJNI token-pruning ViT inference framework.

Public API surface mirrors the reference package
(`/root/reference/rajni/__init__.py:1-2`, `wrapper/__init__.py:1-3`):
``RAJNIViTWrapper`` / ``RAJNIAttention`` become the functional
``vit_forward`` / ``pruned_attention``; ``evaluate_model`` and
``compute_importance`` keep their names.
"""

from .attest import check_fixture, load_fixture, save_fixture
from .eval import evaluate_model
from .models.train_path import train_kernels_supported, vit_forward_train
from .models.wrapper import RAJNIViT
from .models.vit import (
    VARIANTS,
    ViTConfig,
    adapt_config_to_params,
    get_config,
    init_params,
    model_stats,
    vit_activations,
    vit_forward,
    vit_token_trace,
)
from .ops.attention import attention, pruned_attention
from .ops.importance import compute_importance
from .ops.pruning import gather_tokens, keep_count, select_tokens
from .quant import (
    ActScales,
    calibrate_act_scales,
    dequantize_weight,
    quantize_params,
)
from .utils.flops import flops_per_image, mfu, train_mfu
from .utils.schedule import (
    PruneSpec,
    load_schedule,
    normalize_schedule,
    schedule_to_dict,
    token_count_trace,
)
from .utils.schedule_search import predict_speedup, propose_schedule

__version__ = "0.1.0"

__all__ = [
    "ActScales",
    "RAJNIViT",
    "VARIANTS",
    "ViTConfig",
    "PruneSpec",
    "attention",
    "calibrate_act_scales",
    "dequantize_weight",
    "quantize_params",
    "check_fixture",
    "compute_importance",
    "evaluate_model",
    "flops_per_image",
    "load_fixture",
    "mfu",
    "save_fixture",
    "vit_activations",
    "vit_token_trace",
    "gather_tokens",
    "adapt_config_to_params",
    "get_config",
    "init_params",
    "keep_count",
    "load_schedule",
    "model_stats",
    "normalize_schedule",
    "predict_speedup",
    "propose_schedule",
    "pruned_attention",
    "schedule_to_dict",
    "select_tokens",
    "token_count_trace",
    "train_kernels_supported",
    "train_mfu",
    "vit_forward",
    "vit_forward_train",
]
