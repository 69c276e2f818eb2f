"""PyTorch checkpoint bridge: published safetensors -> flax param trees."""

from cinema_tpu.bridge.torch_loader import (
    flax_path_to_torch_key,
    load_pretrain_weights,
    load_torch_state_dict,
    params_to_torch_state_dict,
)

__all__ = [
    "flax_path_to_torch_key",
    "load_torch_state_dict",
    "load_pretrain_weights",
    "params_to_torch_state_dict",
]
