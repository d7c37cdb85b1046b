"""Pretrained-weight conversion and checkpoint IO.

The TPU-native replacement for the reference's L0 substrate (SURVEY.md §1):
instead of importing a pretrained timm module at runtime
(`/root/reference/rajni/run.py:89-92`), a timm ``state_dict`` is converted
once to the native pytree and persisted.
"""

from .convert import convert_timm_state_dict, load_torch_checkpoint
from .io import load_params, save_params

__all__ = [
    "convert_timm_state_dict",
    "load_torch_checkpoint",
    "load_params",
    "save_params",
]
