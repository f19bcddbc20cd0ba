"""Interop with the reference's PyTorch checkpoint format (model.safetensors)."""

from kai0_tpu.interop.torch_safetensors import (  # noqa: F401
    is_torch_checkpoint,
    jax_to_torch_state,
    load_torch_checkpoint,
    save_torch_checkpoint,
    torch_state_to_jax,
)
